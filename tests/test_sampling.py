"""Deterministic-sampling invariants: reproducibility, monotonicity in
the rate, and rate accuracy (SURVEY §4.3: no runtime randomness)."""

from __future__ import annotations

from pyspark.sql import functions as F

DOCS = "/root/testdata/sf0.001/documents.parquet"


def test_hash_sample_deterministic_and_monotone(spark):
    from docling_api_spark.operators.sampling import hash_sample

    d = spark.read.parquet(DOCS)
    k30a = {r["doc_id"] for r in hash_sample(d, "doc_id", 3000).select("doc_id").collect()}
    k30b = {r["doc_id"] for r in hash_sample(d, "doc_id", 3000).select("doc_id").collect()}
    assert k30a == k30b  # run-to-run identical
    k60 = {r["doc_id"] for r in hash_sample(d, "doc_id", 6000).select("doc_id").collect()}
    assert k30a <= k60  # raising the rate only adds rows
    n = d.count()
    assert 0.15 * n < len(k30a) < 0.45 * n  # ~30% within loose bounds
    # a different salt draws a different (still deterministic) subset
    ks = {r["doc_id"] for r in hash_sample(d, "doc_id", 3000, salt="v2").select("doc_id").collect()}
    assert ks != k30a


def test_stratified_sample_respects_rates(spark):
    from docling_api_spark.operators.sampling import stratified_sample

    d = spark.read.parquet(DOCS)
    rates = spark.createDataFrame(
        [("src0", 0), ("src1", 10000)], "source string, rate_bp int"
    )
    kept = stratified_sample(d, rates, "source", "doc_id")
    by_src = {r["source"]: r["n"] for r in
              kept.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert "src0" not in by_src  # rate 0 drops the stratum entirely
    full = d.filter(F.col("source") == "src1").count()
    assert by_src["src1"] == full  # rate 10000 keeps every row
    # strata without a rate row are dropped by the inner join (explicit mix)
    assert set(by_src) == {"src1"}
