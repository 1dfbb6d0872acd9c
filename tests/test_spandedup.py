"""Duplicated-span removal invariants, checked against a first-principles
Python oracle: window hashing replicated with the Spark-validated pure
xxh64 (tests/oracles.py), keeper/cut decisions recomputed from scratch,
and the surviving token SEQUENCE compared exactly. Plus crafted edge
cases (keeper untouched, overlap merging, sub-k docs, whitespace/empty-
token parity, full-doc duplication)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from tests.oracles import spark_xxhash64, spark_xxhash64_longs

DOCS = "/root/testdata/sf0.001/documents.parquet"
_JAVA_WS = re.compile(r"[ \t\n\x0B\f\r]+")


def _toks(text: str) -> list[str]:
    return _JAVA_WS.split(text.strip(" "))


def _content_toks(text_or_toks) -> list[str]:
    """Token sequence minus split's empty-string artifacts ("" from a
    fully-cut doc or a leading/trailing whitespace run) — the comparison
    grain for oracle equality."""
    toks = (_toks(text_or_toks) if isinstance(text_or_toks, str)
            else text_or_toks)
    return [t for t in toks if t]


def _py_expected(rows: list[tuple[int, str]], k: int):
    """First-principles replica: window hash = xxhash64 fold of the k
    token hashes; keeper = min doc id per duplicated hash; a non-keeper
    doc loses every token covered by a duplicated window."""
    wins = {}  # wh -> {doc_id}
    per_doc = {}  # doc_id -> [(pos, wh)]
    tok_cache = {}
    for did, text in rows:
        toks = _toks(text)
        th = [tok_cache.setdefault(t, spark_xxhash64(t)) for t in toks]
        lst = []
        for i in range(len(toks) - k + 1):
            wh = spark_xxhash64_longs(th[i:i + k])
            lst.append((i, wh))
            wins.setdefault(wh, set()).add(did)
        per_doc[did] = lst
    dup_keeper = {
        wh: min(ids) for wh, ids in wins.items() if len(ids) > 1
    }
    out = {}
    for did, text in rows:
        cut = sorted({
            pos for pos, wh in per_doc[did]
            if wh in dup_keeper and dup_keeper[wh] != did
        })
        ranges = []
        for p in cut:
            if ranges and p <= ranges[-1][1]:
                ranges[-1][1] = max(ranges[-1][1], p + k)
            else:
                ranges.append([p, p + k])
        removed = {i for s, e in ranges for i in range(s, e)}
        kept = [t for i, t in enumerate(_toks(text)) if i not in removed]
        out[did] = (kept, len(ranges), len(removed))
    return out


def _run(spark, rows, k):
    from docling_api_spark.operators.spandedup import remove_duplicated_spans

    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = remove_duplicated_spans(df, k=k).collect()
    return {r["doc_id"]: r for r in got}


def test_crafted_corpus_keeper_and_cuts(spark):
    shared = " ".join(f"boiler{i}" for i in range(12))
    rows = [
        (1, f"alpha beta {shared} gamma delta epsilon zeta eta theta"),
        (2, f"one two three four five {shared} six seven eight nine ten"),
        (3, "totally unrelated text " + " ".join(f"w{i}" for i in range(20))),
        (4, f"{shared} leading duplicate here padded out with more words"),
    ]
    got = _run(spark, rows, k=10)
    # doc 1 is the min-id keeper: byte-identical, zero cuts
    assert got[1]["text"] == rows[0][1]
    assert got[1]["n_spans_removed"] == 0
    # docs 2 and 4 lose the shared passage; doc 3 untouched
    for did, original in ((2, rows[1][1]), (4, rows[3][1])):
        assert got[did]["n_spans_removed"] == 1
        assert "boiler0" not in got[did]["text"]
        # only deletions: output chars are a subsequence of the input
        it = iter(original)
        assert all(c in it for c in got[did]["text"])
    assert got[3]["text"] == rows[2][1]
    assert got[3]["n_spans_removed"] == 0
    # surrounding text survives the cut with original separators
    assert got[2]["text"] == "one two three four five six seven eight nine ten"
    assert got[4]["text"] == "leading duplicate here padded out with more words"


def test_matches_python_oracle_on_real_docs(spark):
    d = spark.read.parquet(DOCS).limit(40).collect()
    rows = [(r["doc_id"], r["text"]) for r in d]
    # inject cross-doc duplication: splice doc0's first 30 tokens into
    # three other docs at different positions
    splice = " ".join(_toks(rows[0][1])[:30])
    rows[5] = (rows[5][0], splice + " " + rows[5][1])
    rows[9] = (rows[9][0], rows[9][1] + " " + splice)
    mid = _toks(rows[13][1])
    rows[13] = (rows[13][0],
                " ".join(mid[: len(mid) // 2]) + " " + splice + " "
                + " ".join(mid[len(mid) // 2:]))
    k = 15
    expect = _py_expected(rows, k)
    got = _run(spark, rows, k)
    assert set(got) == set(expect)
    for did, (kept, n_spans, n_toks) in expect.items():
        assert _content_toks(got[did]["text"]) == _content_toks(kept), \
            f"doc {did} token seq"
        assert got[did]["n_spans_removed"] == n_spans, f"doc {did} spans"
        assert got[did]["n_tokens_removed"] == n_toks, f"doc {did} tokens"
    # the splice really was detected somewhere
    assert sum(n for _, n, _ in expect.values()) >= 3


def test_edge_cases(spark):
    k = 5
    dup = "a b c d e f g"
    rows = [
        (1, dup),                      # whole doc duplicated — keeper
        (2, dup),                      # byte-identical copy: fully cut
        (3, "short doc"),              # < k tokens: no windows
        (4, "\tx y z " + dup),         # leading tab: empty-token parity
        (5, "p q r s t u v w"),        # unique content, >= k tokens
    ]
    got = _run(spark, rows, k)
    assert got[1]["text"] == dup and got[1]["n_spans_removed"] == 0
    assert _toks(got[2]["text"]) in ([""], []) or got[2]["text"].strip() == ""
    assert got[2]["n_tokens_removed"] == 7
    assert got[3]["text"] == "short doc"
    assert "x y z" in got[4]["text"] and "a b c" not in got[4]["text"]
    assert got[5]["text"] == rows[4][1]
    # oracle agreement on the same corpus (covers the empty-token path)
    expect = _py_expected(rows, k)
    for did in expect:
        assert (_content_toks(got[did]["text"])
                == _content_toks(expect[did][0]))


_WS_ALPHABET = " \t\n\x0b\f\rabz."


def test_token_spans_parity_fuzz():
    """The cutter's char-span model must agree with Spark's
    split(trim(text), '\\s+') token model on ARBITRARY whitespace-laden
    text — including the leading/trailing empty-token artifacts and
    all-whitespace bodies. Pure-Python property (no Spark round-trip):
    span count == token count and each span slices to its token."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from docling_api_spark.operators.spandedup import _token_spans

    @settings(max_examples=600, deadline=None)
    @given(st.text(alphabet=_WS_ALPHABET, max_size=80))
    def prop(text):
        body = text.strip(" ")
        spans = _token_spans(body)
        toks = _JAVA_WS.split(body)
        assert len(spans) == len(toks)
        for (s, e), t in zip(spans, toks):
            assert body[s:e] == t

    prop()


def test_cut_doc_matches_list_reference_fuzz():
    """_cut_doc against a trivial list-based reference: same surviving
    token sequence, same counts, and deletion-only output, for random
    whitespace-heavy docs and random sorted cut positions."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from docling_api_spark.operators.spandedup import _cut_doc, _token_spans

    @settings(max_examples=400, deadline=None)
    @given(st.text(alphabet=_WS_ALPHABET, max_size=120),
           st.integers(1, 4), st.data())
    def prop(text, k, data):
        n = len(_token_spans(text.strip(" ")))
        if n < k:
            positions = []
        else:
            positions = sorted(
                data.draw(st.sets(st.integers(0, n - k), max_size=8))
            )
        got_text, n_ranges, n_toks = _cut_doc(text, positions, k)
        toks = _JAVA_WS.split(text.strip(" "))
        removed = set()
        ranges = []
        for p in positions:
            if ranges and p <= ranges[-1][1]:
                ranges[-1][1] = max(ranges[-1][1], p + k)
            else:
                ranges.append([p, p + k])
        for s, e in ranges:
            removed.update(range(s, e))
        kept = [t for i, t in enumerate(toks) if i not in removed and t]
        assert _content_toks(got_text) == kept
        assert n_ranges == len(ranges)
        assert n_toks == len(removed)
        # deletion-only: output chars are a subsequence of the input
        it = iter(text)
        assert all(c in it for c in got_text)

    prop()


def test_whitespace_gnarly_corpus_differential(spark):
    """End-to-end Spark vs the Python oracle on a deterministic corpus
    saturated with tabs / newlines / vertical tabs / form feeds around
    an injected shared passage."""
    base = "\t alpha\nbeta \x0b gamma\f delta "
    shared = " ".join(f"s{i}" for i in range(9))
    rows = [
        (1, base + shared + "\n\n tail one"),
        (2, "lead\t" + shared + "\x0b trailer two three"),
        (3, shared.replace(" ", "\t")),      # same tokens, tab-separated
        (4, " \t\n"),                        # whitespace-only doc
        (5, "solo doc with nothing shared anywhere at all"),
    ]
    k = 6
    expect = _py_expected(rows, k)
    got = _run(spark, rows, k)
    assert set(got) == set(expect)
    for did, (kept, n_spans, n_toks) in expect.items():
        assert _content_toks(got[did]["text"]) == _content_toks(kept), did
        assert got[did]["n_spans_removed"] == n_spans, did
        assert got[did]["n_tokens_removed"] == n_toks, did
    # the tab-separated doc 3 shares every window with docs 1/2
    assert got[3]["n_tokens_removed"] == 9


def test_frequent_spans_discovery(spark):
    """Boilerplate discovery vs a first-principles count: the injected
    footer (3 docs, 4 occurrences) must outrank the 2-doc passage; the
    exemplar snippet is the min-(id, pos) occurrence's exact chars;
    windows in one doc only never appear; clean corpus -> empty."""
    from docling_api_spark.operators.spandedup import frequent_spans

    footer = " ".join(f"f{i}" for i in range(5))
    other = " ".join(f"o{i}" for i in range(5))
    rows = [
        (1, f"{footer} start text here {footer}"),   # footer twice
        (2, f"body words then {footer} end"),
        (3, f"{other} and the {footer} again"),
        (4, f"prefix {other} suffix padding words"),
        (5, "unique content without any shared window present"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = frequent_spans(df, k=5, top_n=10).collect()

    # python oracle: count every 5-token window across docs
    from collections import defaultdict
    occ = defaultdict(int)
    docs_of = defaultdict(set)
    first = {}
    for did, text in rows:
        toks = _JAVA_WS.split(text.strip(" "))
        for p in range(len(toks) - 4):
            w = tuple(toks[p:p + 5])
            occ[w] += 1
            docs_of[w].add(did)
            first.setdefault(w, (did, p))
    dup = {w: (len(docs_of[w]), occ[w]) for w in occ if len(docs_of[w]) > 1}
    assert len(got) == len(dup)
    # ranking: footer window (3 docs, 4 occurrences) first
    assert got[0]["n_docs"] == 3 and got[0]["n_occurrences"] == 4
    assert got[0]["snippet"] == footer
    assert got[0]["example_id"] == 1
    by_snip = {tuple(_JAVA_WS.split(r["snippet"])): r for r in got}
    for w, (nd, no) in dup.items():
        r = by_snip[w]
        assert (r["n_docs"], r["n_occurrences"]) == (nd, no), w
        assert (r["example_id"],) == (first[w][0],), w

    clean = spark.createDataFrame(
        [(1, "nothing duplicated in this tiny corpus")],
        "doc_id long, text string",
    )
    assert frequent_spans(clean, k=3, top_n=5).count() == 0


def test_string_ids_pass_through(spark):
    """id_col is generic: the id column passes through the Arrow batch
    untouched, so string ids must work on both the cut and untouched
    branches (min-id keeper = lexicographic min for strings)."""
    from docling_api_spark.operators.spandedup import remove_duplicated_spans

    shared = " ".join(f"b{i}" for i in range(8))
    rows = [
        ("doc-a", f"{shared} unique tail here"),
        ("doc-b", f"other head words {shared}"),
        ("doc-c", "entirely unrelated content of some length"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {r["doc_id"]: r for r in
           remove_duplicated_spans(df, k=5).collect()}
    assert got["doc-a"]["text"] == rows[0][1]  # keeper: lexicographic min
    assert got["doc-b"]["n_spans_removed"] == 1
    assert "b0" not in got["doc-b"]["text"]
    assert got["doc-c"]["text"] == rows[2][1]
    assert got["doc-c"]["n_spans_removed"] == 0


def test_overlapping_windows_merge_into_one_span(spark):
    # 12 shared tokens with k=5 -> 8 overlapping dup windows -> ONE cut
    shared = " ".join(f"s{i}" for i in range(12))
    rows = [
        (1, f"{shared} tail one two three four"),
        (2, f"head words here {shared} more tail words again"),
    ]
    got = _run(spark, rows, k=5)
    assert got[1]["n_spans_removed"] == 0
    assert got[2]["n_spans_removed"] == 1
    assert got[2]["n_tokens_removed"] == 12
    assert got[2]["text"] == "head words here more tail words again"
