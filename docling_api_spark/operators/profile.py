"""Corpus profiling report — the "corpus card" a training-data pipeline
produces before committing 100 TB to a tokenizer run: document counts,
token/char totals, exact token-count percentiles, quality average,
language distribution, and a duplicate-rate estimate.

Plan shape / scale:
  - ONE projection pass derives per-document stats (token count, chars,
    quality score, language, content sha) and immediately DROPS the text
    column; the resulting frame is ~50 bytes/doc, so materializing it
    (localCheckpoint) is bounded even at 10^10 documents. The three
    aggregations below re-read that frame, never the corpus.
  - percentiles are EXACT and deterministic without collecting values:
    groupBy(n_tokens).count() yields at most max-doc-length distinct
    rows (a token-count histogram), and the percentile is read off the
    cumulative histogram with a fixed rule (smallest value whose
    cumulative count reaches ceil(p/100 * n)). approx_percentile's
    sketch merge is partition-order sensitive — rejected for the
    repo-wide determinism invariant.
  - distinct-content counting uses approx_count_distinct (HLL++):
    single-pass, mergeable, order-independent — THE scale choice; the
    relative error (rsd) is part of the report so the consumer knows
    the estimate's quality. An exact countDistinct would force a second
    full shuffle of 32-byte hashes for a number the consumer only needs
    to ~1%.
  - the quality average is an exact scaled-integer sum (the e4-fixed-
    point quality_score recovered to a long per doc) divided HALF_UP in
    Python integer arithmetic — no float sum anywhere (float sums are
    partition-order dependent; CLAUDE.md invariant).

Reference parity: the reference exposes per-request usage analytics only
(SURVEY §2.5); corpus-level profiling is part of the training-data-
pipeline layer the build brief adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_PERCENTILES = (50, 90, 99)


def corpus_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document stats frame, text dropped: (n_tokens, n_chars,
    quality_score, lang_pred, _sha)."""
    from docling_api_spark.operators.textstats import (
        with_lang_id,
        with_quality_score,
        with_token_stats,
    )

    # NULL text profiles as the empty document (deterministic, total) —
    # a raw crawl table always has some; the report must not crash on it
    base = df.select(
        F.coalesce(F.col(text_col), F.lit("")).alias(text_col)
    )
    p = with_lang_id(
        with_quality_score(with_token_stats(base, text_col), text_col),
        text_col,
    )
    return p.select(
        "n_tokens",
        F.col("n_chars_m").alias("n_chars"),
        "quality_score",
        "lang_pred",
        F.sha2(text_col, 256).alias("_sha"),
    )


def _half_up_div(num: int, den: int, decimals: int) -> float:
    """HALF_UP(num/den, decimals) in exact Python integers."""
    scale = 10 ** decimals
    return ((2 * scale * num + den) // (2 * den)) / scale


def _hist_percentile(hist: list[tuple[int, int]], n: int, p: int) -> int:
    """Smallest value whose cumulative count reaches ceil(p/100 * n);
    hist is [(value, count)] sorted by value."""
    need = -((-p * n) // 100)  # ceil without floats
    cum = 0
    for v, c in hist:
        cum += c
        if cum >= need:
            return v
    return hist[-1][0] if hist else 0


def corpus_report(
    df: DataFrame,
    text_col: str = "text",
    percentiles=DEFAULT_PERCENTILES,
    rsd: float = 0.05,
) -> dict:
    """The corpus card, as a flat JSON-able dict. Empty corpus yields a
    zeroed report (never raises)."""
    stats = corpus_profile(df, text_col).localCheckpoint(eager=True)

    g = stats.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens_total"),
        F.sum("n_chars").alias("n_chars_total"),
        F.min("n_tokens").alias("tokens_min"),
        F.max("n_tokens").alias("tokens_max"),
        # quality_score is an e4 fixed-point value carried as a double;
        # *1e4 lands within 1e-9 of the integer, so round() here is the
        # sanctioned single-fixed-point-value case, never a .5 tie
        F.sum(F.round(F.col("quality_score") * 10000).cast("long"))
        .alias("q_e4_sum"),
        F.approx_count_distinct("_sha", rsd).alias("n_unique_est"),
    ).collect()[0]
    n = int(g["n_docs"])
    if n == 0:
        stats.unpersist()
        return {
            "n_docs": 0, "n_tokens_total": 0, "n_chars_total": 0,
            "tokens_min": 0, "tokens_max": 0, "avg_tokens": 0.0,
            "avg_quality": 0.0, "n_unique_est": 0, "dup_rate_est": 0.0,
            "distinct_rsd": rsd, "lang_dist": {},
            **{f"tokens_p{p}": 0 for p in percentiles},
        }

    hist = sorted(
        (int(r["n_tokens"]), int(r["count"]))
        for r in stats.groupBy("n_tokens").count().collect()
    )
    lang = {
        r["lang_pred"]: int(r["count"])
        for r in stats.groupBy("lang_pred").count().collect()
    }
    stats.unpersist()

    uniq = min(int(g["n_unique_est"]), n)
    report = {
        "n_docs": n,
        "n_tokens_total": int(g["n_tokens_total"]),
        "n_chars_total": int(g["n_chars_total"]),
        "tokens_min": int(g["tokens_min"]),
        "tokens_max": int(g["tokens_max"]),
        "avg_tokens": _half_up_div(int(g["n_tokens_total"]), n, 2),
        "avg_quality": _half_up_div(int(g["q_e4_sum"]), n * 10000, 4),
        "n_unique_est": uniq,
        "dup_rate_est": _half_up_div(n - uniq, n, 4),
        "distinct_rsd": rsd,
        "lang_dist": dict(sorted(lang.items())),
    }
    for p in percentiles:
        report[f"tokens_p{p}"] = _hist_percentile(hist, n, p)
    return report


def top_tokens(df: DataFrame, n: int = 50,
               text_col: str = "text") -> DataFrame:
    """The n most frequent (lowercased, whitespace) tokens:
    (token, n_occurrences), count-desc with token-asc tie-break (total
    deterministic order). One explode + one partial-agg groupBy — the
    Zipf head collapses map-side, so the shuffle carries per-partition
    distinct tokens, not occurrences; the top-n is a per-partition heap
    (TakeOrdered), never a full sort. Empty/whitespace-only documents
    tokenize to one '' token (split semantics) — filtered, it is not a
    word and would pollute the user-facing report."""
    from docling_api_spark.operators.dedup import _tokens

    return (
        df.filter(F.col(text_col).isNotNull())
        .select(F.explode(_tokens(F.col(text_col))).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("token"))
        .limit(n)
    )
