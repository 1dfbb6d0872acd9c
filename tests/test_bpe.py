"""BPE trainer/encoder vs an independent pure-Python reference: the
reference counts words with re.findall, learns merges with the naive
all-occurrences textbook loop, and encodes by replaying merges in rank
order — a DIFFERENT algorithm than the operator's rank-greedy encoder,
so agreement checks the semantics, not the implementation. Plus cap
accounting, determinism under repartition, and losslessness."""

from __future__ import annotations

import re

from docling_api_spark.operators.textstats import BPE_PATTERN

DOCS = "/root/testdata/sf0.001/documents.parquet"
_PAT = re.compile(BPE_PATTERN)


def _ref_counts(texts):
    counts = {}
    for t in texts:
        for w in _PAT.findall(t):
            counts[w] = counts.get(w, 0) + 1
    return counts


def _ref_learn(counts, n_merges, max_word_types=10**9):
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    top = top[:max_word_types]
    words = {tuple(w): n for w, n in top}
    merges = []
    for _ in range(n_merges):
        pairs = {}
        for syms, n in words.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        (a, b), _n = best
        merges.append((a, b))
        new_words = {}
        for syms, n in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_words[tuple(out)] = new_words.get(tuple(out), 0) + n
        words = new_words
    return merges


def _ref_encode(text, merges):
    """Replay merges in rank order over each pre-token (all occurrences
    per pass) — equivalent to, but structured differently from, the
    operator's lowest-rank-first greedy."""
    out = []
    for w in _PAT.findall(text):
        syms = list(w)
        for a, b in merges:
            i = 0
            while i < len(syms) - 1:
                if syms[i] == a and syms[i + 1] == b:
                    syms[i:i + 2] = [a + b]
                else:
                    i += 1
        out.extend(syms)
    return out


def test_crafted_corpus_merges_and_encoding(spark):
    from docling_api_spark.operators.bpe import (
        apply_bpe, learn_bpe, word_type_counts,
    )

    texts = [
        "low lower lowest low low",
        "new newer newest new",
        "wide wider widest wide wide wide",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    counts = word_type_counts(df)
    got = {r["word"]: r["n"] for r in counts.collect()}
    assert got == _ref_counts(texts)

    model = learn_bpe(counts, n_merges=12)
    assert model["merges"] == _ref_learn(_ref_counts(texts), 12)
    assert model["n_word_types"] == model["n_word_types_used"]
    assert model["token_mass_covered"] == 1.0
    # every merged symbol is in the vocab exactly once
    assert len(model["vocab"]) == len(set(model["vocab"]))
    assert all(a + b in model["vocab"] for a, b in model["merges"])

    enc = {
        r["doc_id"]: r for r in apply_bpe(df, model["merges"]).collect()
    }
    for i, t in enumerate(texts):
        expect = _ref_encode(t, model["merges"])
        assert list(enc[i]["bpe_tokens"]) == expect, i
        assert enc[i]["n_bpe_tokens"] == len(expect)
        # lossless: tokens concatenate back to the pre-token stream
        assert "".join(enc[i]["bpe_tokens"]) == "".join(_PAT.findall(t))


def test_cap_reports_dropped_mass_and_empty_corpus(spark):
    from docling_api_spark.operators.bpe import learn_bpe, word_type_counts

    texts = ["aa aa aa bb bb cc"]
    df = spark.createDataFrame([(0, texts[0])], "doc_id long, text string")
    model = learn_bpe(word_type_counts(df), n_merges=5, max_word_types=2)
    # kept types: "aa" (3) + " aa"? — ranked by count desc then word; the
    # exact set is engine-visible via the accounting fields
    assert model["n_word_types_used"] == 2
    assert model["n_word_types"] > 2
    assert 0.0 < model["token_mass_covered"] < 1.0

    empty = learn_bpe(
        word_type_counts(
            spark.createDataFrame([], "doc_id long, text string")
        ),
        n_merges=5,
    )
    assert empty["merges"] == [] and empty["vocab"] == []
    assert empty["token_mass_covered"] == 0.0


def test_real_docs_match_reference_and_partition_invariance(spark):
    from docling_api_spark.operators.bpe import (
        apply_bpe, learn_bpe, word_type_counts,
    )

    d = spark.read.parquet(DOCS).select("doc_id", "text").limit(100)
    texts = [r["text"] for r in d.collect()]
    ref_merges = _ref_learn(_ref_counts(texts), 50)

    model1 = learn_bpe(word_type_counts(d), n_merges=50)
    model8 = learn_bpe(word_type_counts(d.repartition(8)), n_merges=50)
    assert model1["merges"] == ref_merges
    assert model8["merges"] == ref_merges  # parallelism-invariant

    enc = {
        r["doc_id"]: list(r["bpe_tokens"])
        for r in apply_bpe(d.repartition(8), model1["merges"]).collect()
    }
    docs = {r["doc_id"]: r["text"] for r in d.collect()}
    for did, t in list(docs.items())[:20]:
        assert enc[did] == _ref_encode(t, ref_merges), did
    # token count bounded: >= one token per pre-token (merges never
    # cross pre-token boundaries), <= one per character (never expands)
    for did, t in docs.items():
        pre = _PAT.findall(t)
        assert len(pre) <= len(enc[did]) <= sum(len(w) for w in pre)
