"""SemDeDup — semantic deduplication over an embedding column (Abbas et
al. 2023, "SemDeDup: Data-efficient learning at web-scale through
semantic deduplication"): cluster the embeddings with k-means, compare
pairs ONLY within each cluster, and keep one exemplar per group of
semantically near-identical documents.

This is the third candidate-generation strategy in the embedding-dedup
family — exact O(N²) (similarity.exact_cosine_pairs, the declared
baseline), random-hyperplane LSH (similarity.embedding_near_duplicates),
and now learned k-means cells. The published trade: a pair straddling a
cell boundary is never examined (recall < 1 by construction, like IVF);
in exchange the pair budget is sum_c |c|²/2 instead of N²/2, and the
cells are learned from the data rather than fixed random planes.

Plan shape / scale:
  - cells come from the deterministic distributed k-means
    (operators/kmeans.py — bit-identical at any parallelism);
  - candidate pairs carry ONLY (id_a, id_b): the cell self-join streams
    16-byte id rows, never vectors (the measured 4x lesson from the LSH
    family);
  - vectors join back once per SIDE of the surviving candidates and
    score + threshold fuse in ONE mapInPandas stage (a scalar-UDF
    select+filter would evaluate the UDF twice);
  - keeper selection reuses the distributed connected-components
    operator (graph.py): group label = min id, keep = (label == id).
  - choose n_cells ~ sqrt(N/target_cell_size): oversized cells make the
    within-cell quadratic the bottleneck — cell sizes are visible in
    kmeans info["cell_sizes"].
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def semantic_near_duplicates(
    df: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_cells: int = 16,
    kmeans_iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_a, id_b, cosine) for every same-cell pair with cosine >=
    threshold; id_a < id_b; cosine rounded like every ANN verify stage
    (_cosine_batch, half-even at 6)."""
    from docling_api_spark.operators.kmeans import (
        assign_clusters, kmeans_centroids,
    )
    from docling_api_spark.operators.similarity import verify_candidate_pairs

    cents, _ = kmeans_centroids(
        df, dim, n_cells, kmeans_iters, id_col, vec_col
    )
    assign = assign_clusters(df, cents, id_col, vec_col)
    left = assign.select("cluster", F.col(id_col).alias("id_a"))
    right = assign.select("cluster", F.col(id_col).alias("id_b"))
    cand = (
        left.join(right, "cluster")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    return verify_candidate_pairs(cand, df, threshold, id_col, vec_col)


def semdedup_keep(
    df: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_cells: int = 16,
    kmeans_iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_col, sem_group, keep) for EVERY input row: semantically
    near-identical groups keep only their min-id exemplar; rows in no
    group keep themselves (sem_group == own id)."""
    from docling_api_spark.operators.graph import cluster_assignments

    pairs = semantic_near_duplicates(
        df, dim, threshold, n_cells, kmeans_iters, id_col, vec_col
    )
    groups = cluster_assignments(
        pairs.select("id_a", "id_b"), id_alias=id_col
    ).select(id_col, F.col("cluster_id").alias("sem_group"))
    return (
        df.select(id_col)
        .join(groups, id_col, "left")
        .select(
            id_col,
            F.coalesce("sem_group", F.col(id_col)).alias("sem_group"),
            F.coalesce(
                F.col("sem_group") == F.col(id_col), F.lit(True)
            ).alias("keep"),
        )
    )
