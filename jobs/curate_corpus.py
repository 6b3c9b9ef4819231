#!/usr/bin/env python
"""Corpus-curation pipeline: the webtext ops composed end-to-end.

    spark-submit --py-files wayproblems_spark.zip jobs/curate_corpus.py \
        --docs /data/documents_parquet --out /data/curated \
        [--min-quality 0.5] [--sample-rate 1.0] [--lang-rates en=0.5,de=1.0] \
        [--jaccard 0.8] [--vocab-k 1000]

One pass over a documents table (doc_id, text, lang, ...) producing the
standard training-data curation artifacts:

  out/curated/     kept documents + their stats columns, parquet
  out/decisions/   (doc_id, keeper_id, kept) for every doc that SURVIVED
                   filtering (audit trail for the dedup decision)
  out/vocab/       top-k vocabulary of the curated corpus
  out/stats.json   stage-by-stage row counts (the funnel)

Stages (each a documented operator with its own oracle/test coverage;
0/1b/2b/2c are opt-in flags, off by default so existing funnels are
unchanged):
  0. PII scrub      — `redact_pii` (privacy.py), --redact [q44 oracle]
  0b. substring strip — `strip_repeated_spans` (substring_dedup.py),
                      --strip-substrings K: remove exact repeated
                      token spans of length >= K (boilerplate/mirrors)
                      before quality is scored       [q57 oracle]
  1. quality gate   — `document_stats` (textstats.py), keep
                      quality >= --min-quality          [q26 oracle]
  1b. repetition    — `repetition_filter` (quality.py), --repetition
                      drops loop/spam-shaped docs        [q45 oracle]
  2. sampling       — `stratified_sample` (sampling.py), per-lang rates,
                      md5-keyed so re-runs/appends agree [q29 oracle]
  2b. source cap    — `cap_per_key` (sampling.py), --source-cap K per
                      `source`, frozen-md5 survivor draw [q48 oracle]
  2c. decontam      — `ngram_decontaminate` (decontam.py), --benchmark
                      path, drops eval-overlapping docs  [q46 oracle]
  1c. LM perplexity — `perplexity_filter` (lm.py), --lm-ref + --max-ppl:
                      CCNet head/middle cut vs a trusted
                      reference slice                [q51/q52 oracles]
  3. near-dup dedup — `minhash_lsh_pairs` (dedup.py)     [q21 oracle]
  4. keep decision  — `canonical_docs` (components.py): per-group
                      max-quality keeper                  [q30 oracle]
  5. vocabulary     — `vocab_topk` (textstats.py)         [q32 oracle]
  6. mixture        — `mix_sources` (mixing.py), --mix src=w,...:
                      token-proportioned source mix w/ epoch
                      upsampling; adds `epoch`            [q53 oracle]
  7. train order    — `shuffle_corpus` (ordering.py), --shuffle:
                      frozen global shuffle rank over (doc, epoch);
                      adds `sample_id`, `shuffle_rank`    [q54 oracle]

Scale shape: stages 0–2 are codegen filters/rewrites on the scan (1b
adds one gram-count shuffle, 2b one key shuffle, 2c one broadcast-gram
join + rollup); stage 3 is the banded LSH (id-only band shuffle, capped
buckets); stage 4 is hash-min components over pairs (≪ docs) + one
group-sized join; stage 5 is a map-side-combined count + per-task top-k
heap. Nothing collects to the driver except the funnel counts.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_rates(s: str) -> dict[str, float]:
    if not s:
        return {}
    out = {}
    for part in s.split(","):
        k, v = part.split("=", 1)
        out[k.strip()] = float(v)
    return out


def curate(
    spark,
    docs,
    min_quality: float = 0.5,
    sample_rate: float = 1.0,
    lang_rates: dict[str, float] | None = None,
    jaccard: float = 0.8,
    vocab_k: int = 1000,
    salt: str = "curate",
    redact: bool = False,
    strip_substrings: int = 0,
    repetition: bool = False,
    source_cap: int = 0,
    benchmark=None,
    decontam_n: int = 13,
    lm_ref=None,
    max_ppl: float = 0.0,
    mix_weights: dict[str, float] | None = None,
    mix_epochs: float = 1.0,
    mix_tokens: int | None = None,
    shuffle: bool = False,
):
    """Run the funnel; returns the 5-tuple
    ``(curated_df, decisions_df, vocab_df, stats, (staged, tracked))``.

    curated_df carries the doc columns + stats columns for kept docs;
    decisions_df is the full (doc_id, keeper_id, kept) audit for every
    doc that survived stages 1–2. The 5th element owns this call's
    persisted frames: ``staged`` (the stage-1/2 survivors) and
    ``tracked`` (minhash's internal shingle frame, plus the deduped
    corpus when the mix/shuffle stages are on) — the CALLER MUST
    unpersist all of them after materializing the outputs (see
    main()/r16), or they stay pinned in the session's cache for its
    lifetime."""
    from pyspark.sql import functions as F

    from wayproblems_spark.operators.components import canonical_docs
    from wayproblems_spark.operators.dedup import minhash_lsh_pairs
    from wayproblems_spark.operators.sampling import cap_per_key, stratified_sample
    from wayproblems_spark.operators.textstats import document_stats, vocab_topk

    stats = {"input": docs.count()}
    tp: list = []

    if redact:
        from wayproblems_spark.operators.privacy import redact_pii

        docs = docs.withColumn("text", redact_pii(F.col("text")))

    if strip_substrings:
        if strip_substrings < 1:
            raise ValueError(
                f"strip_substrings must be >= 1, got {strip_substrings}"
            )
        from wayproblems_spark.operators.substring_dedup import (
            repeated_spans,
            strip_repeated_spans,
        )

        # spans feed the telemetry count AND the strip rewrite — persist
        # the (small, spans << docs) frame; released by the caller with
        # the rest of the tracked frames
        spans = repeated_spans(docs, k=strip_substrings).persist()
        tp.append(spans)
        stats["substring_spans"] = spans.count()
        docs = strip_repeated_spans(
            docs, k=strip_substrings, spans=spans
        )

    staged = document_stats(docs).filter(F.col("quality") >= min_quality)
    stats["after_quality"] = staged.count()

    if repetition:
        from wayproblems_spark.operators.quality import repetition_filter

        keep = repetition_filter(staged).filter(F.col("keep")).select("doc_id")
        staged = staged.join(keep, "doc_id")
        stats["after_repetition"] = staged.count()

    if lm_ref is not None and max_ppl > 0:
        from wayproblems_spark.operators.lm import (
            perplexity_filter,
            train_unigram_lm,
        )

        lm, lm_stats = train_unigram_lm(lm_ref)
        staged = perplexity_filter(staged, lm, lm_stats, max_ppl)
        stats["after_ppl"] = staged.count()

    staged = stratified_sample(
        staged, "doc_id", "lang", lang_rates or {}, default_rate=sample_rate,
        salt=salt,
    )
    # optional per-stage funnel counts are extra scans of a
    # filter-pipeline frame — cheap telemetry, skipped when the stage is
    # off so the default funnel's job count is unchanged
    if source_cap or benchmark is not None:
        stats["after_sampling"] = staged.count()

    if source_cap:
        staged = cap_per_key(staged, ["source"], source_cap, salt=salt)
        if benchmark is not None:
            stats["after_cap"] = staged.count()

    if benchmark is not None:
        from wayproblems_spark.operators.decontam import ngram_decontaminate

        verdict = ngram_decontaminate(staged, benchmark, n=decontam_n)
        clean = verdict.filter(~F.col("contaminated")).select("doc_id")
        staged = staged.join(clean, "doc_id")

    # the funnel's survivors feed dedup twice (pairs + decision join) and
    # the final write — persist once; caller unpersists via curated_df
    staged = staged.persist()
    if source_cap or benchmark is not None:
        stats["after_filters"] = staged.count()
    else:
        stats["after_sampling"] = staged.count()

    pairs = minhash_lsh_pairs(
        staged, jaccard_threshold=jaccard, track_persists=tp
    )
    decisions = canonical_docs(staged, pairs, quality_col="quality")
    curated = staged.join(
        decisions.filter(F.col("kept")).select("doc_id"), "doc_id"
    )
    vocab = vocab_topk(curated, vocab_k)  # over the DEDUPED corpus,
    # before epoch replication inflates term counts

    if mix_weights or shuffle:
        # the closing stages make extra passes over the funnel tail
        # (mix collects per-source totals; shuffle counts buckets then
        # ranks) — persist the deduped corpus so each pass reads the
        # cache, not the whole quality→dedup pipeline again. Released
        # by the caller with the rest of the tracked frames.
        curated = curated.persist()
        tp.append(curated)

    if mix_weights:
        from wayproblems_spark.operators.mixing import mix_sources

        curated, mix_stats = mix_sources(
            curated,
            mix_weights,
            total_tokens=mix_tokens,
            max_epochs=mix_epochs,
            salt=salt,
        )
        stats["mix_target_tokens"] = mix_stats["_target_tokens"]
        stats["mix"] = {
            s: {"rate": v["rate"], "tokens": v["tokens"]}
            for s, v in mix_stats.items()
            if s != "_target_tokens"
        }

    if shuffle:
        from wayproblems_spark.operators.ordering import shuffle_corpus

        sample_id = (
            F.concat_ws("#", F.col("doc_id"), F.col("epoch"))
            if mix_weights
            else F.col("doc_id").cast("string")
        )
        curated = shuffle_corpus(
            curated.withColumn("sample_id", sample_id),
            id_col="sample_id",
            salt=salt,
        )

    return curated, decisions, vocab, stats, (staged, tp)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--min-quality", type=float, default=0.5)
    ap.add_argument("--sample-rate", type=float, default=1.0)
    ap.add_argument("--lang-rates", default="")
    ap.add_argument("--jaccard", type=float, default=0.8)
    ap.add_argument("--vocab-k", type=int, default=1000)
    ap.add_argument("--redact", action="store_true",
                    help="PII-scrub text before the quality gate")
    ap.add_argument("--strip-substrings", type=int, default=0,
                    help="strip exact repeated token spans of length "
                         ">= K corpus-wide before quality (0 = off)")
    ap.add_argument("--repetition", action="store_true",
                    help="drop loop/spam-shaped docs (repetition_filter)")
    ap.add_argument("--source-cap", type=int, default=0,
                    help="keep at most K docs per source (0 = off)")
    ap.add_argument("--benchmark", default="",
                    help="parquet of eval texts; overlapping docs dropped")
    ap.add_argument("--decontam-n", type=int, default=13)
    ap.add_argument("--lm-ref", default="",
                    help="parquet of trusted reference docs; with "
                         "--max-ppl, drops high-perplexity docs")
    ap.add_argument("--max-ppl", type=float, default=0.0)
    ap.add_argument("--mix", default="",
                    help="source mixture weights src=w,... (token-"
                         "proportioned, epoch-upsampled)")
    ap.add_argument("--mix-epochs", type=float, default=1.0)
    ap.add_argument("--mix-tokens", type=int, default=0)
    ap.add_argument("--shuffle", action="store_true",
                    help="assign frozen global training-order ranks")
    ap.add_argument("--cpus", type=int, default=0)
    args = ap.parse_args(argv)

    from wayproblems_spark.session import get_spark

    spark = get_spark(
        app_name="curate-corpus",
        master=f"local[{args.cpus}]" if args.cpus else None,
    )
    docs = spark.read.parquet(args.docs)
    curated, decisions, vocab, stats, (staged, tp) = curate(
        spark,
        docs,
        min_quality=args.min_quality,
        sample_rate=args.sample_rate,
        lang_rates=parse_rates(args.lang_rates),
        jaccard=args.jaccard,
        vocab_k=args.vocab_k,
        redact=args.redact,
        strip_substrings=args.strip_substrings,
        repetition=args.repetition,
        source_cap=args.source_cap,
        benchmark=spark.read.parquet(args.benchmark) if args.benchmark else None,
        decontam_n=args.decontam_n,
        lm_ref=spark.read.parquet(args.lm_ref) if args.lm_ref else None,
        max_ppl=args.max_ppl,
        mix_weights=parse_rates(args.mix) or None,
        mix_epochs=args.mix_epochs,
        mix_tokens=args.mix_tokens or None,
        shuffle=args.shuffle,
    )
    curated.write.mode("overwrite").parquet(os.path.join(args.out, "curated"))
    decisions.write.mode("overwrite").parquet(os.path.join(args.out, "decisions"))
    vocab.write.mode("overwrite").parquet(os.path.join(args.out, "vocab"))
    stats["curated"] = spark.read.parquet(os.path.join(args.out, "curated")).count()
    with open(os.path.join(args.out, "stats.json"), "w") as f:
        json.dump(stats, f, indent=1)
    for fr in tp:
        fr.unpersist()
    staged.unpersist()
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    sys.exit(main())
