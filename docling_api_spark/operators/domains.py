"""Domain-level corpus curation (RefinedWeb / C4-style source policy).

Web-scale pipelines curate at the DOMAIN level before the document
level: a source that is mostly duplicated boilerplate, mostly junk, or
explicitly blocklisted is dropped wholesale (RefinedWeb's URL filtering,
C4's blocklists). Three operators compose:

  domain_stats   — one exact per-domain rollup (docs, tokens, exact
                   within-domain duplicate rate, mean quality)
  domain_policy  — per-domain keep/drop verdict with the FIRST failing
                   rule as the reason (blocklist -> min_docs ->
                   dup_rate -> quality), annotate-don't-drop
  apply_domain_policy — verdicts joined back onto documents

Determinism: every rate/mean is exact-integer HALF_UP (`_ratio_e4`) over
exact long sums — no float accumulation (quality scores, already e4
fixed-point doubles from textstats, are rescaled to longs before
summing). Bit-identical at any parallelism.

Shape at 100 TB: the stats rollup is ONE partial-agg-friendly groupBy on
the domain key (sha2 gives a 32-byte dedup key inside the agg, the text
never shuffles); the policy table is #domains rows — millions, not
billions — and BROADCASTS back onto the corpus (a domain table too big
to broadcast degrades to a shuffle join on the same plan). The blocklist
is small by construction and broadcasts into the policy join.

Reference parity: no reference analog (per-document gateway); part of
the training-data-pipeline layer the brief adds (SURVEY §2.12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _tokens
from .textstats import _ratio_e4


def domain_stats(df: DataFrame, domain_col: str = "source",
                 text_col: str = "text",
                 quality_col: str | None = None,
                 hash_col: str | None = None) -> DataFrame:
    """Per-domain: n_docs, n_distinct_texts, dup_rate (exact, 6dp),
    total_tokens, avg_doc_tokens (2dp), and mean_quality (4dp, only when
    ``quality_col`` — an e4 fixed-point double as produced by
    textstats.with_quality_score — is given). NULL texts count as docs
    with 0 tokens and are excluded from the distinct/dup accounting
    (no content to duplicate). NULL domains form their own group (the
    policy can and does gate them). ``hash_col`` (optional) names a
    PRECOMPUTED content-hash column (NULL exactly when the text is
    NULL) so callers that already carry one — the corpus pipeline's
    _sha — don't pay a second full-text SHA-256."""
    ntoks = F.when(
        F.col(text_col).isNotNull(), F.size(_tokens(F.col(text_col)))
    ).otherwise(F.lit(0))
    content = (F.col(hash_col) if hash_col is not None
               else F.sha2(F.col(text_col), 256))
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(content).alias("n_distinct_texts"),
        F.sum(F.when(F.col(text_col).isNotNull(), 1).otherwise(0))
        .alias("_n_nonnull"),
        F.sum(ntoks.cast("long")).alias("total_tokens"),
    ]
    if quality_col is not None:
        aggs.append(
            F.sum(F.round(F.col(quality_col) * 10000).cast("long"))
            .alias("_sum_q_e4"))
    out = df.groupBy(F.col(domain_col).alias("domain")).agg(*aggs)
    cols = [
        "domain", "n_docs", "n_distinct_texts",
        _ratio_e4(
            F.col("_n_nonnull") - F.col("n_distinct_texts"),
            F.greatest(F.col("_n_nonnull"), F.lit(1)), 6,
        ).alias("dup_rate"),
        "total_tokens",
        _ratio_e4(F.col("total_tokens"), F.col("n_docs"), 2)
        .alias("avg_doc_tokens"),
    ]
    if quality_col is not None:
        cols.append(
            _ratio_e4(
                F.col("_sum_q_e4"),
                F.col("n_docs") * F.lit(10000).cast("long"), 4,
            ).alias("mean_quality"))
    return out.select(*cols)


def domain_policy(stats: DataFrame, blocklist: DataFrame | None = None,
                  min_docs: int = 1, max_dup_rate: float | None = None,
                  min_mean_quality: float | None = None) -> DataFrame:
    """(domain, keep, reason): reason is the FIRST failing rule in the
    fixed order blocklisted -> too_few_docs -> dup_rate -> quality, NULL
    when kept. ``blocklist`` is a one-column DataFrame of domains (small
    by construction — broadcast). Thresholds compare against the exact
    e4/e6 fixed-point stats, so ties are well-defined."""
    s = stats
    if blocklist is not None:
        bl = blocklist.toDF("domain").select(
            "domain", F.lit(True).alias("_blocked"))
        s = s.join(F.broadcast(bl), "domain", "left")
    else:
        s = s.withColumn("_blocked", F.lit(None).cast("boolean"))
    reason = F.when(F.col("_blocked"), F.lit("blocklisted"))
    reason = reason.when(
        F.col("n_docs") < min_docs, F.lit("too_few_docs"))
    if max_dup_rate is not None:
        reason = reason.when(
            F.col("dup_rate") > max_dup_rate, F.lit("dup_rate"))
    if min_mean_quality is not None:
        reason = reason.when(
            F.col("mean_quality") < min_mean_quality, F.lit("quality"))
    return s.select(
        "domain",
        reason.alias("drop_reason"),
    ).select("domain", F.col("drop_reason").isNull().alias("keep"),
             "drop_reason")


def apply_domain_policy(df: DataFrame, policy: DataFrame,
                        domain_col: str = "source") -> DataFrame:
    """Annotate every document with its domain verdict (keep,
    drop_reason — REPLACING any input columns of those names, the
    annotate-operator convention); documents from domains absent in the
    policy table are KEPT (policy covers what stats saw — an unseen
    domain has no evidence against it). NULL-domain documents match the
    policy's NULL group (eqNullSafe join) — a drop verdict against the
    NULL domain is enforced, not bypassed. Caller filters on ``keep``;
    annotation keeps the funnel auditable (corpus-pipeline
    convention)."""
    pol = policy.select(
        F.col("domain").alias("_dom_domain"),
        F.col("keep").alias("_dom_keep"),
        F.col("drop_reason").alias("_dom_reason"),
    )
    return (
        df.join(
            F.broadcast(pol),
            F.col(domain_col).eqNullSafe(F.col("_dom_domain")),
            "left",
        )
        .drop("_dom_domain")
        .withColumn("keep", F.coalesce(F.col("_dom_keep"), F.lit(True)))
        .withColumn("drop_reason", F.col("_dom_reason"))
        .drop("_dom_keep", "_dom_reason")
    )
