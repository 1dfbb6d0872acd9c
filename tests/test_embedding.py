"""Hashed text embeddings vs an exact Python replica (signed projection
sums as integers), norm/zero/null semantics, bag-of-words invariance,
cosine sanity, and parallelism invariance."""

from __future__ import annotations

import math

from tests.oracles import (java_ws_split, spark_xxhash64,
                           spark_xxhash64_long_int)

DOCS = "/root/testdata/sf0.001/documents.parquet"


def py_embed(text, dim=64):
    if text is None:
        return [0] * dim
    v = [0] * dim
    for t in java_ws_split(text.lower()):
        h0 = spark_xxhash64(t)
        hs = [h0] + [
            spark_xxhash64_long_int(h0, k) for k in range(1, (dim + 63) // 64)
        ]
        for b in range(dim):
            v[b] += 1 if (hs[b // 64] >> (b % 64)) & 1 else -1
    return v


def test_matches_replica(spark):
    from docling_api_spark.operators.embedding import hashed_embeddings

    docs = spark.read.parquet(DOCS).select("doc_id", "text").limit(60)
    rows = {int(r["doc_id"]): r["text"] for r in docs.collect()}
    for dim in (64, 128):
        got = {
            int(r["doc_id"]): list(r["embedding_int"])
            for r in hashed_embeddings(docs, dim=dim).collect()
        }
        assert got == {i: py_embed(t, dim) for i, t in rows.items()}


def test_norm_null_and_zero(spark):
    from docling_api_spark.operators.embedding import hashed_embeddings

    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, None)],
        "doc_id long, text string",
    )
    got = {int(r["doc_id"]): r for r in hashed_embeddings(df).collect()}
    ints = got[1]["embedding_int"]
    norm = math.sqrt(sum(x * x for x in ints))
    assert got[1]["embedding"] == [x / norm for x in ints]
    assert abs(sum(x * x for x in got[1]["embedding"]) - 1.0) < 1e-12
    # null text -> zero int vector, NULL normalized embedding
    assert got[2]["embedding_int"] == [0] * 64
    assert got[2]["embedding"] is None


def test_bag_of_words_and_cosine_sanity(spark):
    from docling_api_spark.operators.embedding import hashed_embeddings

    base = "the quick brown fox jumps over the lazy dog " * 5
    permuted = " ".join(reversed(base.split()))
    near = base + " with one extra tail sentence appended here"
    other = "completely different vocabulary discussing spark shuffles " \
            "partitions exchanges aggregates and broadcast joins " * 5
    df = spark.createDataFrame(
        [(1, base), (2, permuted), (3, near), (4, other)],
        "doc_id long, text string",
    )
    e = {int(r["doc_id"]): r["embedding"]
         for r in hashed_embeddings(df).collect()}
    cos = lambda a, b: sum(x * y for x, y in zip(a, b))
    # same bag of words -> identical vector
    assert e[1] == e[2]
    assert cos(e[1], e[3]) > 0.9
    assert cos(e[1], e[4]) < cos(e[1], e[3]) - 0.2


def test_parallelism_invariance(spark):
    from docling_api_spark.operators.embedding import hashed_embeddings

    docs = spark.read.parquet(DOCS).select("doc_id", "text")

    def run(d):
        return sorted(
            (int(r["doc_id"]), tuple(r["embedding_int"]))
            for r in hashed_embeddings(d).collect()
        )

    assert run(docs.repartition(1)) == run(docs.repartition(11))


def test_text_semdedup_end_to_end(spark):
    """The bridge this operator exists for: RAW TEXT -> hashed
    embeddings -> SemDeDup groups near-identical documents with no
    model anywhere."""
    from docling_api_spark.operators.embedding import hashed_embeddings
    from docling_api_spark.operators.semdedup import semdedup_keep

    docs = spark.read.parquet(DOCS).select("doc_id", "text").limit(100)
    # plant a pair of trivially-rephrased copies of doc 3
    base = docs.filter("doc_id = 3").collect()[0]["text"]
    planted = spark.createDataFrame(
        [(5001, base + " tail"), (5002, "tail " + base)],
        "doc_id long, text string",
    )
    emb = hashed_embeddings(docs.unionByName(planted)).filter(
        "embedding is not null"
    )
    kept = {
        int(r["doc_id"]): (int(r["sem_group"]), bool(r["keep"]))
        for r in semdedup_keep(
            emb, dim=64, threshold=0.98, n_cells=4, id_col="doc_id"
        ).collect()
    }
    # the planted docs group with doc 3; only the min id survives
    assert kept[3] == (3, True)
    assert kept[5001][0] == 3 and not kept[5001][1]
    assert kept[5002][0] == 3 and not kept[5002][1]
