"""Lexical relevance ranking for web-text corpora: TF-IDF and BM25.

The retrieval layer of a training-data pipeline (quality-biased sampling,
topic filtering, dedup-cluster representative selection) needs corpus-wide
lexical scoring long before any embedding model enters the picture. Both
operators reuse the engine's normalized tokenizer (operators/textstats.py
term_counts — lowercase, strip non-[a-z0-9\\s], whitespace split), which is
already DuckDB-oracle-locked by q32.

Scale shape:
* postings build = explode → map-side-partial (doc, term) count: the
  shuffle carries distinct (doc, term) pairs, not token occurrences.
* the query side of ``bm25_score`` is a LITERAL term list folded into the
  plan — the postings explosion is filtered to query terms BEFORE the
  aggregation, so a 5-term query over 100 TB shuffles only rows whose term
  matches (predicate evaluated inside the codegen scan stage).
* document-frequency + corpus stats for the query terms are a handful of
  scalars — computed distributed, collected, and folded into the scoring
  expression as constants (driver-side model state, same stance as the
  IVF centroids / PIP covers).
* per-term scores are summed in decimal(38,12) — exact, associative,
  partition-order-independent — then cast back to double, so scores are
  bit-stable across partitionings AND engines (the q01 accumulate trick).

Determinism contract: every float expression here is written in one fixed
composition order (documented inline) so a SQL engine can replicate it
IEEE-exactly; ties in ``bm25_topk`` break by doc id ascending.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TOKEN_STRIP = r"[^a-z0-9\s]"


def _toks(text_col):
    return F.filter(
        F.split(F.regexp_replace(F.lower(text_col), _TOKEN_STRIP, ""), r"\s+"),
        lambda t: t != "",
    )


def doc_lengths(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(id, dl) — normalized token count per document. Pure codegen scan."""
    return docs.select(
        F.col(id_col), F.size(_toks(F.col(text_col))).alias("dl")
    )


def postings(docs: DataFrame, id_col: str = "doc_id",
             text_col: str = "text",
             terms: list[str] | None = None) -> DataFrame:
    """(id, term, tf) postings list. ``terms`` (a literal list) prunes the
    explosion before the aggregation — the query-time fast path."""
    t = F.explode(_toks(F.col(text_col))).alias("term")
    ex = docs.select(F.col(id_col), t)
    if terms is not None:
        ex = ex.filter(F.col("term").isin(*terms))
    return ex.groupBy(id_col, "term").agg(F.count("*").alias("tf"))


def doc_frequencies(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text",
                    terms: list[str] | None = None) -> DataFrame:
    """(term, df) — number of documents containing each term."""
    return (
        postings(docs, id_col, text_col, terms)
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )


def tfidf_vectors(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", min_df: int = 1) -> DataFrame:
    """(id, term, tfidf) sparse vectors, sklearn-style smooth idf:
    tfidf = (1 + ln(tf)) * (ln((1 + N) / (1 + df)) + 1). N is one
    distributed count folded in as a constant."""
    n_docs = docs.select(id_col).count()
    p = postings(docs, id_col, text_col)
    dfreq = doc_frequencies(docs, id_col, text_col)
    if min_df > 1:
        dfreq = dfreq.filter(F.col("df") >= min_df)
    # fixed composition: (1+ln(tf)) * (ln((1+N)/(1+df)) + 1)
    w = (1.0 + F.log(F.col("tf").cast("double"))) * (
        F.log((1.0 + float(n_docs)) / (1.0 + F.col("df").cast("double"))) + 1.0
    )
    return p.join(dfreq, "term").select(
        id_col, "term", w.alias("tfidf")
    )


def _bm25_scored_terms(docs, query_terms, k1, b, id_col, text_col):
    if not query_terms:
        raise ValueError("query_terms must be a non-empty literal list")
    dl = doc_lengths(docs, id_col, text_col)
    stats = dl.agg(
        F.count("*").alias("n"), F.sum("dl").alias("sum_dl")
    ).collect()[0]
    n_docs = int(stats["n"])
    # exact-int sum / exact-int count → one well-defined double, which a
    # SQL oracle reproduces with CAST(SUM(dl) AS DOUBLE)/COUNT(*)
    avgdl = float(stats["sum_dl"]) / float(n_docs)

    p = postings(docs, id_col, text_col, terms=query_terms)
    dfreq = doc_frequencies(docs, id_col, text_col, terms=query_terms)
    # df table is |query| rows — broadcast; dl joins on the doc key
    scored = (
        p.join(F.broadcast(dfreq), "term")
        .join(dl, id_col)
    )
    tfd = F.col("tf").cast("double")
    dfd = F.col("df").cast("double")
    dld = F.col("dl").cast("double")
    # Lucene/Robertson idf, fixed composition:
    #   ln(1 + (N - df + 0.5) / (df + 0.5))
    idf = F.log(1.0 + (float(n_docs) - dfd + 0.5) / (dfd + 0.5))
    # tf saturation, fixed composition:
    #   (tf * (k1+1)) / (tf + k1 * (1 - b + b * dl / avgdl))
    norm = 1.0 - float(b) + F.lit(float(b)) * dld / F.lit(avgdl)
    sat = (tfd * float(k1 + 1.0)) / (tfd + F.lit(float(k1)) * norm)
    return scored.select(
        F.col(id_col), F.col("term"), (idf * sat).alias("term_score")
    )


def bm25_score(docs: DataFrame, query_terms: list[str],
               k1: float = 1.2, b: float = 0.75,
               id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, score) BM25 over documents containing ≥1 query term.
    Per-term double scores are summed through decimal(38,12) so the total
    is independent of partitioning and term order (exact, associative) —
    then cast back to double."""
    terms = _bm25_scored_terms(docs, query_terms, k1, b, id_col, text_col)
    return terms.groupBy(id_col).agg(
        F.sum(F.col("term_score").cast("decimal(38,12)"))
        .cast("double")
        .alias("score")
    )


def bm25_topk(docs: DataFrame, query_terms: list[str], k: int,
              k1: float = 1.2, b: float = 0.75,
              id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Top-k by score desc, doc id asc (deterministic ties). orderBy+limit
    plans as TakeOrderedAndProject — per-task k-row heaps, no global sort."""
    return (
        bm25_score(docs, query_terms, k1, b, id_col, text_col)
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )
