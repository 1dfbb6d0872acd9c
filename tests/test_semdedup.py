"""SemDeDup invariants vs a first-principles replica: k-means cells from
the bit-exact reference (test_kmeans), within-cell pairs recomputed with
plain numpy, keeper selection re-derived with a union-find — compared as
sets against the operator on real embeddings plus injected duplicates.
Plus partition invariance and the exactly-one-keeper-per-group rule."""

from __future__ import annotations

import numpy as np

from tests.test_kmeans import _ref_kmeans, _ref_sims, _unit

EMB = "/root/testdata/sf0.001/embeddings.parquet"
DIM, K, ITERS, THRESH = 64, 16, 5, 0.8


def _corpus(spark):
    """sf0.001 embeddings + exact copies of vectors 0..4 at ids 1000+."""
    base = spark.read.parquet(EMB).select("vec_id", "embedding")
    dups = [
        (1000 + r["vec_id"], list(r["embedding"]))
        for r in base.filter("vec_id < 5").collect()
    ]
    inj = spark.createDataFrame(
        dups, "vec_id long, embedding array<double>"
    )
    return base.unionByName(inj)


def _ref_pairs(ids, mat):
    cents = _ref_kmeans(mat, K, ITERS)
    u = _unit(mat)
    cell = np.argmax(_ref_sims(u, cents), axis=1)
    norms = np.linalg.norm(mat, axis=1)
    pairs = {}
    for c in np.unique(cell):
        idx = np.where(cell == c)[0]
        for a in range(len(idx)):
            for b in range(a + 1, len(idx)):
                i, j = idx[a], idx[b]
                cos = round(
                    float(np.dot(mat[i], mat[j]))
                    / max(norms[i] * norms[j], 1e-12),
                    6,
                )
                if cos >= THRESH:
                    pairs[(ids[i], ids[j])] = cos
    return pairs


def _ref_groups(ids, pairs):
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in ids}


def test_pairs_match_replica_and_partition_invariant(spark):
    from docling_api_spark.operators.semdedup import semantic_near_duplicates

    d = _corpus(spark)
    rows = sorted(
        ((r["vec_id"], r["embedding"]) for r in d.collect()),
    )
    ids = [i for i, _ in rows]
    mat = np.array([v for _, v in rows], dtype=np.float64)
    expect = _ref_pairs(ids, mat)
    # guard: no replica cosine sits within float noise of the threshold,
    # so set equality below is well-defined
    assert all(abs(c - THRESH) > 1e-5 for c in expect.values())

    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in semantic_near_duplicates(
            d, DIM, THRESH, K, ITERS
        ).collect()
    }
    assert set(got) == set(expect)
    for p, c in expect.items():
        assert abs(got[p] - c) <= 1e-6, p
    # the injected exact copies are found (cosine 1.0, same cell always)
    for i in range(5):
        assert got.get((i, 1000 + i)) == 1.0

    got13 = {
        (r["id_a"], r["id_b"])
        for r in semantic_near_duplicates(
            d.repartition(13), DIM, THRESH, K, ITERS
        ).collect()
    }
    assert got13 == set(expect)


def test_keep_flags_one_exemplar_per_group(spark):
    from docling_api_spark.operators.semdedup import semdedup_keep

    d = _corpus(spark)
    rows = sorted(((r["vec_id"], r["embedding"]) for r in d.collect()))
    ids = [i for i, _ in rows]
    mat = np.array([v for _, v in rows], dtype=np.float64)
    groups = _ref_groups(ids, _ref_pairs(ids, mat))

    got = {r["vec_id"]: r for r in semdedup_keep(
        d, DIM, THRESH, K, ITERS
    ).collect()}
    assert set(got) == set(ids)  # total: every row gets a verdict
    for i in ids:
        assert got[i]["sem_group"] == groups[i], i
        assert got[i]["keep"] == (groups[i] == i), i
    # exactly one keeper per group; keeper is the min id
    by_group: dict[int, list[int]] = {}
    for i in ids:
        by_group.setdefault(groups[i], []).append(i)
    for g, members in by_group.items():
        keepers = [i for i in members if got[i]["keep"]]
        assert keepers == [min(members)] == [g]
    # the injected duplicates lost, their originals kept
    for i in range(5):
        assert got[1000 + i]["keep"] is False
        assert got[1000 + i]["sem_group"] == groups[1000 + i] <= i
