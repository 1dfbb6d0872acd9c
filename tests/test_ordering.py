"""Global-shuffle operator vs a first-principles replica (shard and
order recomputed with the pure-Python xxhash64), permutation totality,
epoch independence, and parallelism invariance."""

from __future__ import annotations

from tests.oracles import SPARK_SEED, _signed, _xxh64_long, xxh64_bytes

DOCS = "/root/testdata/sf0.001/documents.parquet"
SHARDS = 8


def _hash_str_long(s: str, v: int) -> int:
    """Type-faithful xxhash64(<string lit>, <LongType col>): the id
    column is LongType, so it always takes the 8-byte path (the
    magnitude dispatch in spark_xxhash64 would be wrong for small
    ids)."""
    h = xxh64_bytes(s.encode("utf-8"), SPARK_SEED)
    return _signed(_xxh64_long(v, h))


def py_order(ids, salt="shuffle", n_shards=SHARDS):
    """Expected (shard, position) per id."""
    keyed = [
        (_hash_str_long(salt + "#shard", i) % n_shards,
         _hash_str_long(salt + "#order", i), i)
        for i in ids
    ]
    out = {}
    for s in range(n_shards):
        rows = sorted((ok, i) for sh, ok, i in keyed if sh == s)
        for pos, (_, i) in enumerate(rows):
            out[i] = (s, pos)
    return out


def test_matches_replica_and_is_total(spark):
    from docling_api_spark.operators.ordering import global_shuffle

    d = spark.read.parquet(DOCS).select("doc_id", "text")
    got = {
        int(r["doc_id"]): (int(r["shard"]), int(r["position"]))
        for r in global_shuffle(d, ["doc_id"], n_shards=SHARDS).collect()
    }
    ids = [int(r["doc_id"]) for r in d.select("doc_id").collect()]
    assert got == py_order(ids)
    # totality: every (shard, position) slot unique, positions dense
    slots = sorted(got.values())
    assert len(set(slots)) == len(ids)
    for s in range(SHARDS):
        poss = sorted(p for sh, p in slots if sh == s)
        assert poss == list(range(len(poss)))


def test_salt_changes_permutation_deterministically(spark):
    from docling_api_spark.operators.ordering import global_shuffle

    d = spark.read.parquet(DOCS).select("doc_id")
    a = {int(r["doc_id"]): (r["shard"], r["position"])
         for r in global_shuffle(d, ["doc_id"], salt="epoch0").collect()}
    b = {int(r["doc_id"]): (r["shard"], r["position"])
         for r in global_shuffle(d, ["doc_id"], salt="epoch1").collect()}
    a2 = {int(r["doc_id"]): (r["shard"], r["position"])
          for r in global_shuffle(d, ["doc_id"], salt="epoch0").collect()}
    assert a == a2
    assert a != b
    # each epoch is itself a dense, collision-free assignment (shard
    # SIZES legitimately differ between salts — hash occupancy moves)
    for m in (a, b):
        assert len(set(m.values())) == len(m)


def test_group_grain_shares_slots(spark):
    """Rows sharing the key (e.g. chunks of one packed bin) share one
    slot and slots stay dense per shard."""
    from docling_api_spark.operators.ordering import global_shuffle

    rows = [(i // 3, i) for i in range(30)]  # 10 groups of 3 rows
    df = spark.createDataFrame(rows, "bin long, row long")
    got = global_shuffle(
        df, ["bin"], n_shards=4, shard_col="os", pos_col="op"
    ).collect()
    per_bin = {}
    for r in got:
        per_bin.setdefault(int(r["bin"]), set()).add(
            (int(r["os"]), int(r["op"])))
    # one slot per group, shared by all its rows
    assert all(len(s) == 1 for s in per_bin.values())
    slots = [next(iter(s)) for s in per_bin.values()]
    assert len(set(slots)) == len(per_bin)
    for s in range(4):
        poss = sorted(p for sh, p in slots if sh == s)
        assert poss == list(range(len(poss)))


def test_parallelism_invariance(spark):
    from docling_api_spark.operators.ordering import global_shuffle

    d = spark.read.parquet(DOCS).select("doc_id")

    def run(df):
        return sorted(
            (int(r["doc_id"]), int(r["shard"]), int(r["position"]))
            for r in global_shuffle(df, ["doc_id"]).collect()
        )

    assert run(d.repartition(1)) == run(d.repartition(13))
