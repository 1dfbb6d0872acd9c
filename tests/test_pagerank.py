"""Fixed-point PageRank vs a bit-exact pure-Python replica (same
integer arithmetic), structural sanity (hubs outrank leaves), dangling
handling, and parallelism invariance."""

from __future__ import annotations

from collections import Counter

SCALE, DN, DD = 1 << 40, 17, 20


def py_pagerank(edges, n_iter, scale=SCALE, d_num=DN, d_den=DD):
    es = sorted(set(edges))
    nodes = sorted({s for s, _ in es} | {d for _, d in es})
    n = len(nodes)
    out = Counter(s for s, _ in es)
    rank = {v: scale // n for v in nodes}
    base = (scale * (d_den - d_num)) // (d_den * n)
    for _ in range(n_iter):
        dangling = sum(rank[v] for v in nodes if out[v] == 0)
        dang = (dangling * d_num) // (d_den * n)
        new = {v: base + dang for v in nodes}
        for s, d in es:
            new[d] += (rank[s] * d_num) // (d_den * out[s])
        rank = new
    return rank


def _graph():
    """A deterministic 40-node graph with a hub, a dangling sink, and a
    pseudo-random mesh (no runtime randomness: arithmetic pattern)."""
    edges = []
    for i in range(1, 30):
        edges.append((i, 0))                    # everyone links the hub
        edges.append((i, (i * 7) % 30))          # mesh
        edges.append((i, (i * i + 3) % 30))
    edges.append((0, 31))                        # hub -> dangling sink
    # duplicate edges on purpose: operator must distinct them
    edges += edges[:10]
    return edges


def test_matches_replica_bit_exactly(spark):
    from docling_api_spark.operators.pagerank import pagerank

    edges = _graph()
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {int(r["node"]): int(r["rank_scaled"])
           for r in pagerank(df, n_iter=8).collect()}
    assert got == py_pagerank(edges, 8)


def test_structure_and_mass(spark):
    from docling_api_spark.operators.pagerank import pagerank

    edges = _graph()
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = pagerank(df, n_iter=8).collect()
    ranks = {int(r["node"]): r["rank"] for r in rows}
    # the hub every node links outranks everything else
    assert ranks[0] == max(ranks.values())
    # the sink fed solely by the hub outranks the median mesh node
    mesh = sorted(v for k, v in ranks.items() if k not in (0, 31))
    assert ranks[31] > mesh[len(mesh) // 2]
    # mass conservation up to the documented floor leak
    total = sum(int(r["rank_scaled"]) for r in rows)
    assert 0 < SCALE - total < len(_graph()) * 10 * len(ranks)


def test_empty_and_invariance(spark):
    from docling_api_spark.operators.pagerank import pagerank

    empty = spark.createDataFrame([], "src long, dst long")
    assert pagerank(empty, n_iter=2).count() == 0

    edges = _graph()
    df = spark.createDataFrame(edges, "src long, dst long")

    def run(d):
        return sorted(
            (int(r["node"]), int(r["rank_scaled"]))
            for r in pagerank(d, n_iter=4).collect()
        )

    assert run(df.repartition(1)) == run(df.repartition(9))


def test_large_scale_stays_exact(spark):
    """scale beyond 2^49 must still match the integer replica — the
    contribution divide is the INTEGRAL `div`, not a double divide that
    rounds past 2^53."""
    from docling_api_spark.operators.pagerank import pagerank

    edges = _graph()
    df = spark.createDataFrame(edges, "src long, dst long")
    big = 1 << 55
    got = {int(r["node"]): int(r["rank_scaled"])
           for r in pagerank(df, n_iter=3, scale=big).collect()}
    assert got == py_pagerank(edges, 3, scale=big)
