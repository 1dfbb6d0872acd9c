"""Pure-Python-oracle tests for the sequence-packing operator: the Spark
result is compared against a brute-force per-shard recompute (the shared
``pack_greedy`` rule applied to the same deterministic shard/order
definition), plus the packing invariants that must hold on ANY input."""

from __future__ import annotations

import random


def _spark_shards(spark, rows, n_shards):
    """The operator's exact shard definition, recomputed independently
    through the engine (pmod(xxhash64(id), n) has no pure-Python twin —
    xxhash64 seeds differ — so the oracle derives shard ids from a
    one-column Spark job and does everything else in Python)."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(r[0],) for r in rows], "doc_id string")
    got = df.select(
        "doc_id",
        F.pmod(F.xxhash64(F.col("doc_id").cast("string")), F.lit(n_shards))
        .cast("int").alias("shard"),
    ).collect()
    return {r["doc_id"]: r["shard"] for r in got}


def _oracle(rows, shard_of, ctx_len):
    from docling_api_spark.operators.packing import pack_greedy

    by_shard: dict[int, list] = {}
    for doc_id, n in rows:
        by_shard.setdefault(shard_of[doc_id], []).append((doc_id, n))
    want = {}
    for shard, docs in by_shard.items():
        docs.sort(key=lambda d: d[0])
        for doc_id, bin_idx, off, n, oversize in pack_greedy(docs, ctx_len):
            want[doc_id] = (shard, bin_idx, off, n, oversize)
    return want


def _case(spark, rows, ctx_len, n_shards):
    from docling_api_spark.operators.packing import pack_sequences

    df = spark.createDataFrame(
        [(d, " ".join(["w"] * n) if n else "") for d, n in rows],
        "doc_id string, text string",
    )
    got = {
        r["doc_id"]: (r["shard"], r["bin_idx"], r["offset_in_bin"],
                      r["n_tokens"], r["bin_oversize"])
        for r in pack_sequences(df, ctx_len=ctx_len,
                                n_shards=n_shards).collect()
    }
    want = _oracle(rows, _spark_shards(spark, rows, n_shards), ctx_len)
    assert got == want


def test_pack_sequences_randomized(spark):
    rng = random.Random(77)
    rows = [(f"doc_{i:05d}", rng.choice([0, 1, 3, 10, 40, 120, 300]))
            for i in range(400)]
    _case(spark, rows, ctx_len=128, n_shards=8)


def test_pack_invariants(spark):
    """Invariants on a skewed corpus: no bin over budget unless it is a
    single flagged-oversize doc; offsets tile each bin contiguously; no
    doc dropped or duplicated; result independent of input partitioning."""
    from pyspark.sql import functions as F

    from docling_api_spark.operators.packing import (bin_fill_stats,
                                                     pack_sequences)

    rng = random.Random(5)
    rows = [(f"d{i:04d}", " ".join(["tok"] * rng.randrange(0, 200)))
            for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    packed = pack_sequences(df, ctx_len=96, n_shards=4)
    rs = packed.collect()
    assert len(rs) == len(rows) and len({r["doc_id"] for r in rs}) == len(rows)
    bins: dict[tuple, list] = {}
    for r in rs:
        bins.setdefault((r["shard"], r["bin_idx"]), []).append(r)
    for key, members in bins.items():
        members.sort(key=lambda r: r["offset_in_bin"])
        total = sum(r["n_tokens"] for r in members)
        if any(r["bin_oversize"] for r in members):
            assert len(members) == 1 and total > 96
        else:
            assert total <= 96
        off = 0
        for r in members:
            assert r["offset_in_bin"] == off
            off += r["n_tokens"]
    stats = {(r["shard"], r["bin_idx"]): r
             for r in bin_fill_stats(packed, ctx_len=96).collect()}
    assert set(stats) == set(bins)
    assert all(0.0 <= r["utilization"] <= 1.0 for r in stats.values())
    # partitioning invariance: same assignment from a repartitioned input
    again = {
        r["doc_id"]: (r["shard"], r["bin_idx"], r["offset_in_bin"])
        for r in pack_sequences(df.repartition(13), ctx_len=96,
                                n_shards=4).collect()
    }
    assert again == {r["doc_id"]: (r["shard"], r["bin_idx"],
                                   r["offset_in_bin"]) for r in rs}


def test_pack_precomputed_counts_and_edge_cases(spark):
    from docling_api_spark.operators.packing import pack_sequences

    import pytest as _pytest

    df = spark.createDataFrame(
        [("a", 50), ("b", 100), ("c", 101), ("d", 0)],
        "doc_id string, n_tok long",
    )
    got = {
        r["doc_id"]: r
        for r in pack_sequences(df, ctx_len=100, token_count_col="n_tok",
                                n_shards=1).collect()
    }
    # exactly-full doc gets its own unflagged bin; the over-budget one
    # is flagged; zero-token doc packs normally
    assert got["b"]["bin_oversize"] is False
    assert got["c"]["bin_oversize"] is True
    assert {r["n_tokens"] for r in got.values()} == {50, 100, 101, 0}
    with _pytest.raises(ValueError, match="positive"):
        pack_sequences(df, ctx_len=0, token_count_col="n_tok")
