"""Domain-curation operators vs a first-principles replica (exact
integer HALF_UP ratios recomputed in Python, distinct counts
cross-checked against DuckDB on the same parquet), policy rule-order
semantics, join-back annotation, and parallelism invariance."""

from __future__ import annotations

import duckdb

from tests.oracles import java_ws_split

DOCS = "/root/testdata/sf0.001/documents.parquet"


def ratio(num: int, den: int, d: int) -> float:
    """Replica of textstats._ratio_e4 (exact integer HALF_UP)."""
    scale = 10 ** d
    a = 2 * scale * num + den
    b = 2 * den
    return ((a - a % b) // b) / scale


def test_domain_stats_match_replica_and_duckdb(spark):
    from docling_api_spark.operators.domains import domain_stats
    from docling_api_spark.operators.textstats import with_quality_score

    docs = spark.read.parquet(DOCS)
    got = {
        r["domain"]: r
        for r in domain_stats(
            with_quality_score(docs), quality_col="quality_score"
        ).collect()
    }
    # DuckDB: the distinct/count side of the rollup
    duck = duckdb.sql(f"""
        select source, count(*) n, count(distinct sha256(text)) nd
        from '{DOCS}' group by source
    """).fetchall()
    assert {d: (n, nd) for d, n, nd in duck} == {
        d: (r["n_docs"], r["n_distinct_texts"]) for d, r in got.items()
    }
    # Python: token totals and the exact fixed-point ratios
    rows = spark.read.parquet(DOCS).select("source", "text").collect()
    qrows = {
        (r["source"], r["text"]): r["quality_score"]
        for r in with_quality_score(docs)
        .select("source", "text", "quality_score").collect()
    }
    per = {}
    for r in rows:
        d = per.setdefault(r["source"], {"n": 0, "toks": 0, "q": 0,
                                         "texts": set(), "nn": 0})
        d["n"] += 1
        if r["text"] is not None:
            d["nn"] += 1
            d["texts"].add(r["text"])
            d["toks"] += len(java_ws_split(r["text"].lower()))
        d["q"] += round(qrows[(r["source"], r["text"])] * 10000)
    for dom, d in per.items():
        g = got[dom]
        assert g["total_tokens"] == d["toks"], dom
        assert g["dup_rate"] == ratio(
            d["nn"] - len(d["texts"]), max(d["nn"], 1), 6)
        assert g["avg_doc_tokens"] == ratio(d["toks"], d["n"], 2)
        assert g["mean_quality"] == ratio(d["q"], d["n"] * 10000, 4)


def test_policy_rule_order_and_apply(spark):
    from docling_api_spark.operators.domains import (
        apply_domain_policy, domain_policy, domain_stats)

    docs = spark.createDataFrame(
        [
            # blocked (also low-quality: blocklist must win)
            (1, "spam spam spam", "bad.com"),
            # duplicated domain: 3 docs, 1 distinct text
            (2, "same text here", "dupes.net"),
            (3, "same text here", "dupes.net"),
            (4, "same text here", "dupes.net"),
            # healthy domain
            (5, "a fine unique document", "good.org"),
            (6, "another fine unique document", "good.org"),
            # singleton domain -> too_few_docs under min_docs=2
            (7, "lonely", "solo.io"),
        ],
        "doc_id long, text string, source string",
    )
    stats = domain_stats(docs)
    bl = spark.createDataFrame([("bad.com",)], "domain string")
    pol = domain_policy(stats, blocklist=bl, min_docs=2,
                        max_dup_rate=0.5)
    verdict = {r["domain"]: (r["keep"], r["drop_reason"])
               for r in pol.collect()}
    assert verdict == {
        "bad.com": (False, "blocklisted"),
        "dupes.net": (False, "dup_rate"),
        "good.org": (True, None),
        "solo.io": (False, "too_few_docs"),
    }
    out = {r["doc_id"]: (r["keep"], r["drop_reason"])
           for r in apply_domain_policy(docs, pol).collect()}
    assert out[5] == (True, None) and out[6] == (True, None)
    assert out[1] == (False, "blocklisted")
    assert out[2] == out[3] == out[4] == (False, "dup_rate")
    assert out[7] == (False, "too_few_docs")
    # unseen domain is kept
    extra = spark.createDataFrame(
        [(8, "new", "fresh.dev")], "doc_id long, text string, source string")
    row = apply_domain_policy(extra, pol).collect()[0]
    assert row["keep"] is True and row["drop_reason"] is None


def test_null_text_and_invariance(spark):
    from docling_api_spark.operators.domains import domain_stats

    docs = spark.createDataFrame(
        [(1, None, "d"), (2, "x y", "d"), (3, "x y", "d")],
        "doc_id long, text string, source string",
    )
    r = domain_stats(docs).collect()[0]
    # null text: counted as a doc, 0 tokens, outside dup accounting
    assert r["n_docs"] == 3 and r["n_distinct_texts"] == 1
    assert r["total_tokens"] == 4
    assert r["dup_rate"] == ratio(2 - 1, 2, 6)

    big = spark.read.parquet(DOCS)

    def run(df):
        return sorted(
            (r["domain"], r["n_docs"], r["dup_rate"], r["total_tokens"])
            for r in domain_stats(df).collect()
        )

    assert run(big.repartition(1)) == run(big.repartition(13))


def test_null_domain_verdict_is_enforced(spark):
    """A drop verdict against the NULL-domain group must gate
    NULL-source docs (eqNullSafe join), not silently bypass them; and
    apply composes onto frames that already carry a `keep` column
    (replaced, not AnalysisException)."""
    from docling_api_spark.operators.domains import (
        apply_domain_policy, domain_policy, domain_stats)
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [
            (1, "same dup text", None), (2, "same dup text", None),
            (3, "same dup text", None), (4, "same dup text", None),
            (5, "a unique healthy document", "good.org"),
            (6, "another unique healthy document", "good.org"),
        ],
        "doc_id long, text string, source string",
    )
    pol = domain_policy(domain_stats(docs), max_dup_rate=0.5)
    v = {r["domain"]: (r["keep"], r["drop_reason"]) for r in pol.collect()}
    assert v[None] == (False, "dup_rate")
    out = apply_domain_policy(
        docs.withColumn("keep", F.lit(True)), pol  # pre-existing `keep`
    )
    got = {r["doc_id"]: (r["keep"], r["drop_reason"])
           for r in out.collect()}
    assert all(got[i] == (False, "dup_rate") for i in (1, 2, 3, 4))
    assert got[5] == (True, None) and got[6] == (True, None)
