"""Deterministic global shuffle for training-example order.

Training runs need the corpus in a reproducible pseudo-random order —
ordered-by-source corpora bias every batch, and a nondeterministic
shuffle makes runs unrepeatable. The scalable contract is SHARDED order:
every example gets a (shard, position) slot; readers stream shards
0..n-1, each shard internally ordered. That is exactly what a
hash-ordered dataset write gives, and unlike a single global sort it
needs no range-partition sampling pass (Spark's orderBy samples the
corpus to compute range bounds — a second scan, and the bounds depend on
the sample). Epoch reshuffles fold the epoch into the salt: a different
salt is a completely different (but equally deterministic) permutation.

Determinism: shard and order key are xxhash64 of (salt, key columns);
position is a dense_rank ordered by (order key, key columns) — the key
tie-break makes the permutation total even under hash collisions, rows
sharing a key share one slot (the group grain), and the result is
bit-identical at any parallelism.

Shape at 100 TB: ONE hash exchange on the shard id + a per-shard sort —
the minimum any global permutation costs. Shard count is the
parallelism knob: shards are written as independent files and sorted
independently (no global sort, no driver bottleneck, no skew — xxhash64
spreads uniformly regardless of key distribution).

Reference parity: no reference analog (per-document gateway); part of
the training-data-pipeline layer the brief adds (SURVEY §2.12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_shuffle(df: DataFrame, key_cols: list[str],
                   salt: str = "shuffle", n_shards: int = 64,
                   shard_col: str = "shard",
                   pos_col: str = "position") -> DataFrame:
    """Append (shard_col, pos_col): a deterministic pseudo-random total
    order over ``key_cols``. Rows sharing the same key share the same
    slot (dense_rank) — so permuting at a coarser grain than the row
    (e.g. packed BINS, where several chunk rows form one training
    example) keeps each group contiguous; for unique keys this is
    exactly a row permutation. Reading shards 0..n_shards-1 in position
    order replays the same permutation on every run and at any
    parallelism; change ``salt`` (e.g. fold in the epoch number) for an
    independent permutation."""
    keys = [F.col(c) for c in key_cols]
    shard = F.pmod(
        F.xxhash64(F.lit(salt + "#shard"), *keys), F.lit(n_shards)
    ).cast("int")
    okey = F.xxhash64(F.lit(salt + "#order"), *keys)
    w = Window.partitionBy(shard_col).orderBy(
        F.col("_okey"), *[F.col(c) for c in key_cols]
    )
    return (
        df.withColumn(shard_col, shard)
        .withColumn("_okey", okey)
        .withColumn(pos_col, F.dense_rank().over(w) - 1)
        .drop("_okey")
    )
