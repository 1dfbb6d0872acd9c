"""Eval-set decontamination: flag training documents that share word
n-grams with a held-out evaluation set.

The standard training-data hygiene step (benchmark leakage removal): any
training document containing an n-gram that also occurs in the eval set
is flagged, with overlap counts so the pipeline can drop / downweight.

Shape at 100 TB: the EVAL side is small by construction (a benchmark is
thousands of documents, the corpus is billions) — its distinct grams are
broadcast. Training grams explode map-side straight into the broadcast
hash join; only the matched (doc, gram, eval_doc) hits — a vanishingly
small fraction — reach the groupBy shuffle. No corpus-wide shuffle of
gram strings, one pass over the corpus, all JVM-side (higher-order
shingling from operators/dedup.py, no Python).

The driver query keeps gram STRINGS so DuckDB can replay it exactly; a
production run at real scale would fold each gram to a 64-bit xxhash64
on both sides before the join (same plan shape, 8-byte keys, collision
odds ~N_eval_grams/2^64 per gram — acceptable for flagging) exactly as
the minhash pipeline already does for shingles.

Reference parity: no reference analog (per-document gateway); part of
the training-data-pipeline layer the brief adds (SURVEY §2 addendum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _tokens, shingles_of_tokens


def ngram_decontaminate(
    train: DataFrame,
    evalset: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Per contaminated training document: distinct-gram total, number of
    distinct grams shared with the eval set, number of distinct eval
    documents hit, and the contaminated-gram rate. Documents with no
    shared gram are not returned (at corpus scale the clean set is the
    overwhelming majority — emitting it would be a full-corpus write).

    Documents shorter than ``n`` tokens fall back to their whole
    space-joined text as a single gram (same fallback as the dedup
    shingle family), so short eval items still decontaminate exact
    copies.
    """
    # null-text documents carry no content to leak — excluded on BOTH
    # sides (the SQL oracle does the same; Spark's concat_ws would fold a
    # null token array to the gram '' while SQL's array_to_string yields
    # NULL — filtering is the one semantics both engines express exactly)
    train_nn = train.filter(F.col(text_col).isNotNull())
    # materialize tokens, THEN the gram array, THEN size + explode — each
    # as its own column: the shingling transform re-evaluates an inline
    # subtree per element (no CSE inside lambdas, see shingles_of_tokens)
    # and n_grams rides along each exploded row, recovered with max()
    # after the join (every row of one document carries the same size),
    # instead of a second scan-and-shingle subtree for totals. Contract:
    # one row per doc_id — under duplicate ids max() is still
    # deterministic but keeps ONE row's gram total while the distinct
    # counts pool across rows (and the SQL oracle sums totals), so rates
    # could exceed 1; unique ids are the corpus invariant upstream dedup
    # enforces
    def grams_of(df):
        return df.select(
            F.col(id_col), _tokens(F.col(text_col)).alias("_toks")
        ).select(
            F.col(id_col),
            F.array_distinct(
                shingles_of_tokens(F.col("_toks"), n)
            ).alias("_grams"),
        )

    # explode_OUTER + an explicit null filter, NOT plain explode: the
    # non-outer Generate makes InferFiltersFromGenerate add
    # size(_grams)>0 AND isnotnull(_grams), and predicate pushdown then
    # INLINES the whole tokenize+shingle pipeline into a Filter below the
    # projections — re-evaluating it (with split duplicated 4x inside)
    # once per document on top of the real pass. Measured 5.2 s -> 0.6 s
    # for the sf0.1 train gram pass. _grams is non-empty by construction
    # (the short-doc fallback emits one gram), so the outer null row
    # never fires; the filter documents that and keeps the plan aligned.
    train_grams = grams_of(train_nn).select(
        F.col(id_col),
        F.size("_grams").alias("n_grams"),
        F.explode_outer("_grams").alias("gram"),
    ).filter(F.col("gram").isNotNull())
    eval_grams = grams_of(evalset.filter(F.col(text_col).isNotNull())).select(
        F.col(id_col).alias("_eval_doc"),
        F.explode_outer("_grams").alias("gram"),
    ).filter(F.col("gram").isNotNull())
    hits = (
        train_grams.join(F.broadcast(eval_grams), "gram")
        .groupBy(id_col)
        .agg(
            F.max("n_grams").alias("n_grams"),
            F.countDistinct("gram").alias("n_contaminated_grams"),
            F.countDistinct("_eval_doc").alias("n_eval_docs_hit"),
        )
    )
    from docling_api_spark.operators.textstats import _ratio_e4

    return hits.select(
        id_col,
        "n_grams",
        "n_contaminated_grams",
        "n_eval_docs_hit",
        # HALF_UP at 6 by exact integer division — the rational
        # contaminated/total ties at the rounding digit for the right
        # gram totals, where float round splits engines (see _ratio_e4)
        _ratio_e4(
            F.col("n_contaminated_grams"),
            F.greatest(F.col("n_grams"), F.lit(1)),
            6,
        ).alias("contamination_rate"),
    )
