"""Generate BENCH/PLANS.md: formatted physical plans of headline operators
with shuffle/codegen/pushdown summaries."""
import io, os, re, sys
from contextlib import redirect_stdout
sys.path.insert(0, "/root/repo")
from wayproblems_spark.session import get_spark
from pyspark.sql import functions as F

spark = get_spark(master="local[8]", shuffle_partitions=8)
SF = "/root/testdata/sf0.01"

def t(n): return spark.read.parquet(f"{SF}/{n}.parquet")

def fmt(df):
    df.collect()  # run THIS plan so AQE finalizes (codegen ids only appear in the final plan)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()

def summarize(plan):
    tree = plan.split("\n\n")[0].split("== Initial Plan ==")[0]
    ex = sum(1 for l in tree.splitlines() if re.search(r"\bExchange\b", l))
    py = sum(1 for l in tree.splitlines()
             if re.search(r"MapInPandas|ArrowEvalPython|BatchEvalPython|FlatMapGroupsInPandas", l))
    wsc = len(set(re.findall(r"codegen id : (\d+)", plan)))
    pushed = re.findall(r"PushedFilters: \[[^\]]*\]", plan)
    return ex, py, wsc, pushed[:2]

sections = []

# 1. e2e rules pipeline (fixture corpus too heavy here; use the rule layer query)
import __spark_entry__ as E
frames = {
    "q08 rule-predicate layer (R2 semantics, pure codegen CASE)": E.q08_rule_layer_sql(spark, SF),
    "q26 document_stats (text analysis, all JVM exprs)": E.q26_doc_quality_sql(spark, SF),
    "q29 stratified_sample (codegen filter, no shuffle/RNG)": E.q29_stratified_sample_sql(spark, SF),
    "q28 byte_stats (JVM sniffer + ONE Arrow pass)": E.q28_binary_sniff_sql(spark, SF),
    "q32 vocab_topk (map-side-combined count + TakeOrdered)": E.q32_vocab_topk_sql(spark, SF),
    "q33 quantize_int8 (JVM array exprs)": E.q33_quantize_int8_sql(spark, SF),
}
# minhash band buckets (the dedup hot path)
from wayproblems_spark.operators.dedup import _minhash_band_buckets, word_shingles
d = t("documents")
base = d.select(F.col("doc_id").alias("_id"),
                F.array_distinct(F.transform(word_shingles(F.col("text"), 5), lambda s: F.xxhash64(s))).alias("shl")
       ).filter(F.size("shl") > 0)
frames["minhash band buckets (explode -> 64-col map-side-partial min)"] = _minhash_band_buckets(base, 64, 16)

out = ["# Plan audit — headline operators (`.explain(\"formatted\")`, local[8], sf0.01)\n",
       "Regenerate with `python tools/gen_plans.py`;",
       "the structural properties below are ALSO pinned by tests/test_plans.py and",
       "the per-operator plan assertions named in SURVEY.md §2.\n"]
for name, df in frames.items():
    plan = fmt(df)
    ex, py, wsc, pushed = summarize(plan)
    out.append(f"\n## {name}\n")
    out.append(f"**Exchanges (shuffles): {ex} · Python eval nodes: {py} · WholeStageCodegen spans: {wsc}**")
    if pushed:
        out.append("Scan pushdown: `" + "`, `".join(pushed) + "`")
    # trim plan: keep the FINAL tree (drop the pre-AQE Initial Plan copy
    # and the detailed operator list)
    tree = plan.split("\n\n")[0].split("== Initial Plan ==")[0].rstrip().rstrip("+-").rstrip()
    lines = tree.splitlines()
    if len(lines) > 60:
        lines = lines[:60] + [f"... ({len(tree.splitlines())-60} more tree lines)"]
    out.append("\n```\n" + "\n".join(lines) + "\n```")
with open("/root/repo/BENCH/PLANS.md", "w") as f:
    f.write("\n".join(out) + "\n")
print("written")
spark.stop()
