"""Model-free hashed text embeddings (signed random projection).

Bridges RAW TEXT into the embedding-consuming operator family (k-means,
SemDeDup, ANN top-k, embedding near-dup): every document gets a dense
vector with NO model and NO network — the signed-random-projection
construction SimHash quantizes, kept UNQUANTIZED: token t contributes
the ±1 sign vector of its xxhash64 bits, the document vector is the
exact integer sum over token occurrences (a hashed bag-of-words
projected by a deterministic random matrix). Cosine between these
vectors approximates the angular similarity of the underlying
token-count vectors (Charikar 2002) — good enough for clustering and
semantic-dedup blocking, and reproducible forever.

Determinism: per-dimension sums are exact LONGS (associative adds, the
repo invariant); the normalized double vector is derived per-row from
those longs in fixed order. Bit-identical at any parallelism.

Shape at 100 TB: one explode + ONE partial-agg-friendly groupBy(id) with
``dim`` codegen'd conditional sums — the proven simhash64 plan shape
(dedup.py: the numpy/Arrow variant measured SLOWER; don't retry). Each
group of 64 dimensions costs one extra per-token hash (bit b of salted
hash b//64), so dim=64 is one hash per token, dim=128 two.

Reference parity: no reference analog (per-document gateway); part of
the training-data-pipeline layer the brief adds (SURVEY §2.12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _tokens


def hashed_embeddings(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", dim: int = 64,
                      normalize: bool = True) -> DataFrame:
    """(id, embedding_int array<long>, embedding array<double>):
    ``embedding_int`` is the exact signed-projection sum (the
    determinism contract — compare THIS across runs); ``embedding`` is
    its L2-normalized double view (the input the k-means/SemDeDup/ANN
    operators take). ``dim`` must be a multiple of 64 or <= 64.
    Documents with NULL text or zero vectors (theoretically possible
    when signs cancel exactly) get a NULL ``embedding`` and ride
    through; callers filter as their operator requires."""
    if dim > 64 and dim % 64 != 0:
        raise ValueError("dim must be <= 64 or a multiple of 64")
    n_hashes = max(1, (dim + 63) // 64)
    tok = df.select(
        F.col(id_col), F.explode_outer(_tokens(F.col(text_col))).alias("tok")
    ).withColumn("th0", F.xxhash64("tok"))
    # salted per-token hashes: group k>0 folds (token hash, k) — the
    # minhash salt idiom, one multi-arg xxhash64 per extra 64-dim block
    for k in range(1, n_hashes):
        tok = tok.withColumn(f"th{k}", F.xxhash64(F.col("th0"), F.lit(k)))
    bit_aggs = [
        F.sum(
            F.when(F.col("tok").isNull(), F.lit(0)).otherwise(
                F.when(
                    F.shiftright(F.col(f"th{b // 64}"), b % 64)
                    .bitwiseAND(F.lit(1)) == 1,
                    1,
                ).otherwise(-1)
            )
        ).cast("long").alias(f"d{b}")
        for b in range(dim)
    ]
    agg = tok.groupBy(id_col).agg(*bit_aggs)
    vec = F.array(*[F.col(f"d{b}") for b in range(dim)])
    out = agg.select(F.col(id_col), vec.alias("embedding_int"))
    if not normalize:
        return out
    # per-row derived view: norm over the exact longs, fixed fold order
    sq = F.aggregate(
        "embedding_int",
        F.lit(0).cast("long"),
        lambda acc, x: acc + x * x,
    )
    norm = F.sqrt(sq.cast("double"))
    return out.select(
        id_col, "embedding_int",
        F.when(
            sq > 0,
            F.transform(
                "embedding_int", lambda x: x.cast("double") / norm
            ),
        ).alias("embedding"),
    )
