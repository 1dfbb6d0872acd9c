"""C4 heuristic cleaning vs a first-principles Python replica (Java
split/trim semantics mirrored exactly), rule-by-rule unit cases, null
totality, and parallelism invariance."""

from __future__ import annotations

import re

DOCS = "/root/testdata/sf0.001/documents.parquet"
# \Z (absolute end) pairs with the operator's Java \z — Java '$' vs
# Python '$' disagree before a final \r (see heuristics.TERMINAL_RE)
_TERM = re.compile(r'[.!?]["\')\]]?[ \t\r]*\Z')
_BOILER = re.compile(r"(?i)javascript|cookies? (?:policy|settings|enabled)")


def py_clean(text, min_words=5, min_sentences=3):
    """Replica of c4_clean_lines. Spark's trim strips SPACES only; split
    uses limit -1 (leading separator yields a leading empty token)."""
    if text is None:
        return {"clean_text": None, "n_lines": 0, "n_lines_kept": 0,
                "n_short_lines": 0, "n_no_terminal_lines": 0,
                "n_boilerplate_lines": 0, "n_sentences": 0,
                "c4_keep": False}
    lines = text.split("\n")
    trimmed = [ln.strip(" ") for ln in lines]
    short = [ln for ln in trimmed
             if len(re.split(r"[ \t]+", ln)) < min_words]
    noterm = [ln for ln in trimmed if not _TERM.search(ln)]
    boiler = [ln for ln in trimmed if _BOILER.search(ln)]
    kept = [
        ln for ln in trimmed
        if len(re.split(r"[ \t]+", ln)) >= min_words
        and _TERM.search(ln) and not _BOILER.search(ln)
    ]
    clean = "\n".join(kept)
    n_sent = len(re.findall(r"[.!?]", clean))
    keep = (n_sent >= min_sentences
            and "lorem ipsum" not in text.lower()
            and "{" not in text)
    return {"clean_text": clean, "n_lines": len(lines),
            "n_lines_kept": len(kept), "n_short_lines": len(short),
            "n_no_terminal_lines": len(noterm),
            "n_boilerplate_lines": len(boiler),
            "n_sentences": n_sent, "c4_keep": keep}


CASES = [
    (1, "This is a perfectly fine sentence with many words.\n"
        "Another good long sentence follows right here today!\n"
        "And a third closing sentence wraps the page up?"),
    (2, "short line.\n"
        "This line has plenty of words but no terminal punctuation\n"
        "Please enable javascript to view this page properly today.\n"
        "We use cookies policy words in this long boilerplate line."),
    (3, "A lorem ipsum page with three fine sentences right here.\n"
        "Second sentence is also long enough to pass the gate.\n"
        "Third sentence is long enough to pass the word gate too."),
    (4, "if (x) { return; } this page has code with many words.\n"
        "Second sentence is also long enough to pass the gate.\n"
        "Third sentence is long enough to pass the word gate too."),
    (5, 'He said "stop right there, that is quite enough!"\n'
        "\tTab-led line with enough words ends with a period today.\n"
        "Closing line (with a parenthetical aside) also passes fine."),
    (6, None),
    (7, ""),
    (8, "Only two sentences live on this sufficiently wordy page.\n"
        "Here is the second one of them, nicely terminated as well."),
]


def test_matches_replica_on_cases_and_corpus(spark):
    from docling_api_spark.operators.heuristics import c4_clean_lines

    df = spark.createDataFrame(CASES, "doc_id long, text string")
    got = {int(r["doc_id"]): r.asDict()
           for r in c4_clean_lines(df).collect()}
    for i, t in CASES:
        want = py_clean(t)
        have = {k: got[i][k] for k in want}
        assert have == want, (i, have, want)

    # full real-corpus sweep (single-line docs: everything short-lines
    # away unless terminal punct appears — still must match exactly)
    docs = spark.read.parquet(DOCS).select("doc_id", "text")
    got = {int(r["doc_id"]): r.asDict()
           for r in c4_clean_lines(docs).collect()}
    for r in docs.collect():
        want = py_clean(r["text"])
        have = {k: got[int(r["doc_id"])][k] for k in want}
        assert have == want, r["doc_id"]


def test_rule_semantics(spark):
    from docling_api_spark.operators.heuristics import c4_clean_lines

    df = spark.createDataFrame(CASES, "doc_id long, text string")
    got = {int(r["doc_id"]): r.asDict()
           for r in c4_clean_lines(df).collect()}
    assert got[1]["c4_keep"] and got[1]["n_lines_kept"] == 3
    # doc 2: short + unterminated + 2 boilerplate lines -> nothing kept
    assert got[2]["n_lines_kept"] == 0 and not got[2]["c4_keep"]
    assert got[2]["n_boilerplate_lines"] == 2
    # lorem ipsum and curly braces damn otherwise-clean pages
    assert not got[3]["c4_keep"] and got[3]["n_lines_kept"] >= 2
    assert not got[4]["c4_keep"]
    # closing quote/paren after terminal punctuation still terminates
    assert got[5]["n_lines_kept"] == 3 and got[5]["c4_keep"]
    # null/empty are total, never keep
    assert got[6]["clean_text"] is None and not got[6]["c4_keep"]
    assert not got[7]["c4_keep"]
    # two sentences < min_sentences
    assert not got[8]["c4_keep"] and got[8]["n_lines_kept"] == 2


def test_flags_variant_and_invariance(spark):
    from docling_api_spark.operators.heuristics import (
        c4_clean_lines, c4_document_flags)

    df = spark.createDataFrame(CASES, "doc_id long, text string")
    flags = c4_document_flags(df)
    assert "clean_text" not in flags.columns
    a = {int(r["doc_id"]): (r["c4_keep"], r["n_lines_kept"])
         for r in flags.collect()}
    b = {int(r["doc_id"]): (r["c4_keep"], r["n_lines_kept"])
         for r in c4_clean_lines(df).collect()}
    assert a == b

    docs = spark.read.parquet(DOCS).select("doc_id", "text")

    def run(d):
        return sorted(
            (int(r["doc_id"]), r["c4_keep"], r["n_sentences"])
            for r in c4_document_flags(d).collect()
        )

    assert run(docs.repartition(1)) == run(docs.repartition(11))


def test_dedup_paragraphs_within_doc(spark):
    from docling_api_spark.operators.heuristics import (
        dedup_paragraphs_within_doc)

    cases = [
        (1, "menu\nbody one\nmenu\nbody two\nmenu\nfooter\nfooter"),
        (2, "unique one\nunique two"),
        (3, "same\nsame\nsame"),
        (4, None),
        (5, ""),
        (6, "a\n a\na "),  # whitespace variants are DISTINCT (byte grain)
    ]
    df = spark.createDataFrame(cases, "doc_id long, text string")
    got = {int(r["doc_id"]):
           (r["para_deduped_text"], r["n_paras"], r["n_paras_dropped"])
           for r in dedup_paragraphs_within_doc(df).collect()}

    def py(t):
        if t is None:
            return (None, 0, 0)
        seen, kept = set(), []
        ls = t.split("\n")
        for ln in ls:
            if ln not in seen:
                seen.add(ln)
                kept.append(ln)
        return ("\n".join(kept), len(ls), len(ls) - len(kept))

    for i, t in cases:
        assert got[i] == py(t), i
    assert got[1][0] == "menu\nbody one\nbody two\nfooter"
    assert got[6][2] == 0


def test_para_dedup_reserved_names_raise(spark):
    import pytest

    from docling_api_spark.operators.heuristics import (
        dedup_paragraphs_within_doc)

    df = spark.createDataFrame(
        [(1, "a", 0)], "doc_id long, text string, n_paras_dropped int")
    with pytest.raises(ValueError, match="reserved"):
        dedup_paragraphs_within_doc(df)
