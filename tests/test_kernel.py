"""Unit tests for the extraction kernels (SURVEY.md §5.2.2), one block per
operator family C1-C3 / C6 / C8-C10 plus payload sniffing (S4)."""

from __future__ import annotations

import base64

from docling_api_spark.extraction.kernel import (
    MAX_PAYLOAD_CHARS,
    OCR_SENTINEL,
    ExtractOptions,
    extract_one,
    sniff_kind,
)

BOTH = ExtractOptions(output_format="both")


# --- S4: payload sniffing ---------------------------------------------------

def test_sniff_kinds():
    assert sniff_kind(None) == "empty"
    assert sniff_kind("   \n") == "empty"
    assert sniff_kind("x" * (MAX_PAYLOAD_CHARS + 1)) == "oversize"
    assert sniff_kind(OCR_SENTINEL + " blob") == "needs_ocr"
    assert sniff_kind("<html><p>hi</p></html>") == "html"
    assert sniff_kind("# Title\n\nbody") == "markdown"
    assert sniff_kind("just some plain words") == "plain"
    b64 = base64.b64encode(
        b"%PDFISH-1.0\n%PAGE 1\nhello world line of sufficient length here"
    ).decode()
    assert sniff_kind(b64) == "b64"
    # a long single word is NOT base64 (len % 4 != 0 or < 64 chars)
    assert sniff_kind("Pneumonoultramicroscopicsilicovolcanoconiosis") == "plain"


# --- C1/C2: tokenizer + boilerplate classifier -------------------------------

def test_html_boilerplate_stripped():
    html = (
        "<html><body><nav><a href='/'>Home</a> <a href='/x'>X</a></nav>"
        "<header><h1>Site Chrome</h1></header>"
        "<main><h1>Real Title</h1>"
        "<p>This paragraph is long enough to be kept as main content.</p></main>"
        "<footer>Copyright</footer></body></html>"
    )
    r = extract_one(html)
    assert r["status"] == "success"
    assert "Site Chrome" not in r["extracted_text"]
    assert "Home" not in r["extracted_text"]
    assert "Copyright" not in r["extracted_text"]
    assert r["extracted_text"].startswith("# Real Title")
    assert "long enough to be kept" in r["extracted_text"]


def test_link_density_classifier():
    farm = " ".join(f"<a href='/{i}'>link {i}</a>" for i in range(12))
    html = f"<body><div>{farm}</div><p>Real content sentence that is long enough to keep here.</p></body>"
    r = extract_one(html)
    assert "link 3" not in r["extracted_text"]
    assert "Real content sentence" in r["extracted_text"]


def test_entities_and_inline_tags():
    r = extract_one("<p>A &amp; B &lt;c&gt; <b>bold</b> &#233;t&eacute; and more words here</p>")
    assert r["extracted_text"] == "A & B <c> bold été and more words here"


# --- C3: table structure -> pipe tables --------------------------------------

def test_table_markdown():
    html = (
        "<table><thead><tr><th>A</th><th>B</th></tr></thead>"
        "<tbody><tr><td>1</td><td>2</td></tr><tr><td>3</td><td>4</td></tr></tbody></table>"
    )
    r = extract_one(html)
    lines = r["extracted_text"].split("\n")
    assert lines[0] == "| A | B |"
    assert lines[1] == "| --- | --- |"
    assert lines[2] == "| 1 | 2 |"
    assert lines[3] == "| 3 | 4 |"
    assert r["spans"][0][3] == "table"


def test_table_no_thead_first_row_header():
    html = "<table><tr><td>h1</td><td>h2</td></tr><tr><td>a</td><td>b</td></tr></table>"
    r = extract_one(html)
    lines = r["extracted_text"].split("\n")
    assert lines[1] == "| --- | --- |"


def test_table_pipe_escaping():
    html = "<table><tr><td>a|b</td><td>c</td></tr></table>"
    r = extract_one(html)
    assert "a\\|b" in r["extracted_text"]


# --- C3 toggle + C7 doc_json + P2 output-format gating ------------------------

TABLE_HTML = (
    "<h1>Doc Title Here</h1>"
    "<table><thead><tr><th>A</th><th>B</th></tr></thead>"
    "<tbody><tr><td>1</td><td>2</td></tr></tbody></table>"
    "<p>A body paragraph long enough to be kept as main content here.</p>"
)


def test_table_toggle_disables_tables_everywhere():
    """C3: enable_table_extraction=False (schemas.py:118 ->
    modal_docling.py:166) removes tables from markdown AND doc_json."""
    on = extract_one(TABLE_HTML, BOTH)
    off = extract_one(TABLE_HTML, ExtractOptions("both", enable_table_extraction=False))
    assert "| A | B |" in on["extracted_text"]
    assert '"kind":"table"' in on["doc_json"]
    assert "|" not in off["extracted_text"]
    assert '"kind":"table"' not in off["doc_json"]
    # non-table content identical; n_nodes is a parse stat, unchanged
    assert "# Doc Title Here" in off["extracted_text"]
    assert "body paragraph" in off["extracted_text"]
    assert on["n_nodes"] == off["n_nodes"]
    assert len(off["spans"]) == len(on["spans"]) - 1


def test_output_format_gating():
    """P2 (docling_client.py:452-456): the un-requested export is NULL."""
    md = extract_one(TABLE_HTML)  # default: markdown (schemas.py:112)
    js = extract_one(TABLE_HTML, ExtractOptions("json"))
    both = extract_one(TABLE_HTML, BOTH)
    assert md["doc_json"] is None and md["extracted_text"] is not None
    assert js["extracted_text"] is None and js["doc_json"] is not None
    assert both["extracted_text"] == md["extracted_text"]
    assert both["doc_json"] == js["doc_json"]
    # spans/pages/status are not gated (our north-rule columns)
    assert md["spans"] == js["spans"] == both["spans"]


def test_doc_json_structure_and_determinism():
    import json

    r = extract_one(TABLE_HTML, BOTH)
    doc = json.loads(r["doc_json"])
    assert doc["schema_name"] == "docling-spark"
    assert doc["kind"] == "html" and doc["pages"] == 1
    kinds = [it["kind"] for it in doc["body"]]
    assert kinds == ["heading", "table", "para"]
    tbl = doc["body"][1]
    assert tbl["num_rows"] == 2 and tbl["num_cols"] == 2
    assert tbl["rows"] == [["A", "B"], ["1", "2"]]
    assert tbl["header_rows"] == 1
    heading = doc["body"][0]
    assert heading["level"] == 1 and heading["text"] == "Doc Title Here"
    # prov offsets index into the raw input
    p = doc["body"][2]
    assert TABLE_HTML[p["prov"][0]:p["prov"][1]].startswith("A body paragraph")
    # byte-determinism: serialize twice, sorted keys
    assert r["doc_json"] == extract_one(TABLE_HTML, BOTH)["doc_json"]
    assert r["doc_json"] == json.dumps(doc, sort_keys=True, separators=(",", ":"),
                                       ensure_ascii=False)


def test_doc_json_for_non_html_kinds():
    import base64 as b64
    import json

    # pdfish: heading levels + paragraphs survive into the tree
    doc = (
        "%PDFISH-1.0\n%PAGE 1\n#TITLE My Title\nbody text one\n\n"
        "#H2 Section\nmore body text here\n%PAGE 2\nlast page para"
    )
    r = extract_one(b64.b64encode(doc.encode()).decode(), BOTH)
    tree = json.loads(r["doc_json"])
    assert tree["kind"] == "pdfish" and tree["pages"] == 2
    assert [it["kind"] for it in tree["body"]][:3] == ["heading", "para", "heading"]
    assert tree["body"][2]["level"] == 2
    # markdown + plain + empty
    rm = extract_one("# T\n\nbody words here", BOTH)
    assert json.loads(rm["doc_json"])["kind"] == "markdown"
    rp = extract_one("just plain words in a paragraph", BOTH)
    assert json.loads(rp["doc_json"])["body"][0]["kind"] == "para"
    re_ = extract_one("", BOTH)
    assert json.loads(re_["doc_json"])["body"] == []
    # error capsules carry no doc tree (modal_docling.py:259-264)
    ro = extract_one("y " * (MAX_PAYLOAD_CHARS // 2 + 10), BOTH)
    assert ro["status"] == "error" and ro["doc_json"] is None


def test_markdown_bytes_invariant_across_formats():
    """The frozen-fixture invariant: 'both' produces byte-identical
    markdown to the default 'markdown' mode over the generator corpus."""
    from docling_api_spark.gen import payload_for

    for conv in range(8):
        for turn in range(6):
            _, text = payload_for(42, conv, turn)
            a = extract_one(text)
            b = extract_one(text, BOTH)
            assert a["extracted_text"] == b["extracted_text"]
            assert a["spans"] == b["spans"]
            assert (a["status"], a["pages"], a["n_nodes"]) == (
                b["status"], b["pages"], b["n_nodes"])


# --- C6: markdown emission (lists, code, quote) ------------------------------

def test_lists_ordered_and_unordered():
    html = "<ul><li>first item words</li><li>second item words</li></ul><ol><li>alpha beta gamma</li><li>delta epsilon zeta</li></ol>"
    r = extract_one(html)
    assert "- first item words" in r["extracted_text"]
    assert "1. alpha beta gamma" in r["extracted_text"]
    assert "2. delta epsilon zeta" in r["extracted_text"]


def test_pre_preserves_whitespace():
    html = "<pre>line one\n  indented two</pre>"
    r = extract_one(html)
    assert "```\nline one\n  indented two\n```" == r["extracted_text"]


# --- C8: span offsets point into the raw input --------------------------------

def test_span_offsets_html():
    html = "<body><p>keep this sentence of main content text</p></body>"
    r = extract_one(html)
    (start, end, _nid, kind) = r["spans"][0]
    assert html[start:end] == "keep this sentence of main content text"
    assert kind == "para"


def test_span_offsets_plain():
    text = "first paragraph here\n\nsecond paragraph there"
    r = extract_one(text)
    assert [text[s:e] for s, e, _, _ in r["spans"]] == [
        "first paragraph here", "second paragraph there",
    ]


# --- C9: page counting --------------------------------------------------------

def test_pdfish_pages_and_furniture():
    doc = (
        "%PDFISH-1.0\n%PAGE 1\n<<HEADER Rpt>>\n#TITLE T\nbody text one\n"
        "<<FOOTER 1>>\n%PAGE 2\n<<HEADER Rpt>>\nbody text two\n<<FOOTER 2>>"
    )
    r = extract_one(base64.b64encode(doc.encode()).decode())
    assert r["pages"] == 2
    assert r["payload_kind"] == "pdfish"
    assert "HEADER" not in r["extracted_text"]
    assert "# T" in r["extracted_text"]
    assert "body text one" in r["extracted_text"]


def test_pages_floor_is_one():
    assert extract_one("plain words")["pages"] == 1
    assert extract_one("")["pages"] == 1


# --- C10: error capsuling ------------------------------------------------------

def test_oversize_is_error_row():
    r = extract_one("y " * (MAX_PAYLOAD_CHARS // 2 + 10))
    assert r["status"] == "error"
    assert "payload_too_large" in r["error"]


def test_corrupt_base64_is_error_row():
    raw = bytes([0xFF, 0xFE]) + b"\x00" * 46
    r = extract_one(base64.b64encode(raw).decode())
    assert r["status"] == "error"
    assert "invalid_base64" in r["error"]


def test_needs_ocr_pass_through():
    r = extract_one(OCR_SENTINEL + " blob")
    assert r["status"] == "skipped_ocr"
    assert r["error"] is None


def test_malformed_html_best_effort():
    r = extract_one("<div><p>ok words here more <span>unclosed <p>next paragraph words</div> tail")
    assert r["status"] == "success"
    assert "ok words here" in r["extracted_text"]


def test_text_after_chrome_close_is_content():
    """Bare text following </nav> (etc.) is main content — it must not
    keep accumulating into the closed chrome block and get dropped."""
    body = ("<html><body>intro<nav>Home About</nav>This is the real "
            "article content, long enough to pass every density rule "
            "for sure.</body></html>")
    r = extract_one(body)
    assert "real article content" in r["extracted_text"]
    assert "Home About" not in r["extracted_text"]


def test_unterminated_comment_masks_rest():
    """Spec: '<!--' with no '-->' comments out the rest of the input —
    neither commented-out text nor a commented-out <script> may affect
    the output."""
    r = extract_one("<html><p>keep this paragraph which is long enough "
                    "to stay for sure.</p><!--x<p>secret</p>")
    assert "secret" not in r["extracted_text"]
    assert "keep this paragraph" in r["extracted_text"]
    # a <script> after an unterminated comment open must not start a
    # rawtext region (everything from '<!--' on is comment text)
    r2 = extract_one("<!-- cut <script>if(i<n)f();</script>"
                     "<p>never content</p>")
    assert r2["status"] == "success"
    assert r2["extracted_text"] == ""


def test_omitted_tr_td_end_tags():
    """tr/td end tags are optional per spec: a new <tr>/<td> open implies
    the close — the unflushed row/cell must not be discarded."""
    pad = "<p>pad paragraph long enough to be kept by the rules.</p>"
    r = extract_one(f"<html><table><tr><td>a</td><tr><td>b</td></tr>"
                    f"</table>{pad}</html>")
    assert "| a |" in r["extracted_text"] and "| b |" in r["extracted_text"]
    r2 = extract_one(f"<html><table><tr><td>a<td>b</td></tr></table>"
                     f"{pad}</html>")
    assert "| a | b |" in r2["extracted_text"]


def test_tbody_implies_thead_close():
    """<tbody> implies </thead>: data rows after an unclosed thead must
    not count as header rows."""
    pad = "<p>pad paragraph long enough to be kept by the rules.</p>"
    r = extract_one(f"<html><table><thead><tr><th>h</th></tr><tbody>"
                    f"<tr><td>a</td></tr></tbody></table>{pad}</html>")
    assert "| h |\n| --- |\n| a |" in r["extracted_text"]


def test_block_tags_inside_cell_keep_collecting():
    """Block-level markup inside <td> must not steal the collector from
    the cell — the cell is one flat text in pipe markdown."""
    pad = "<p>pad paragraph long enough to be kept by the rules.</p>"
    r = extract_one(f"<html><table><tr><td><p>value text</p><p>more</p>"
                    f"</td></tr></table>{pad}</html>")
    assert "| value text more |" in r["extracted_text"]


def test_nested_table_restores_outer_cell():
    """A nested table suspends the enclosing cell and the cell resumes
    after </table> — outer-cell text must stay in the outer table."""
    pad = "<p>pad paragraph long enough to be kept.</p>"
    r = extract_one(f"<html><table><tr><td>pre <table><tr><td>inner</td>"
                    f"</tr></table> post</td></tr></table>{pad}</html>")
    assert "| pre post |" in r["extracted_text"]
    assert "| inner |" in r["extracted_text"]


def test_stray_lt_is_literal_text():
    """Spec: '<' not opening a tag is a character token — it must stay
    in the text, not glue the surrounding runs together."""
    r = extract_one("<html><p>price< 10 and cheap and this paragraph is "
                    "long enough to be retained by the rules.</p></html>")
    assert "price< 10 and cheap" in r["extracted_text"]


def test_gt_inside_quoted_attribute():
    """A '>' inside a quoted attribute value does not end the tag — the
    attribute remnant must not leak into extracted text."""
    r = extract_one('<html><div data-x="a>b"><p>Real paragraph text here '
                    "long enough to keep for sure.</p></div></html>")
    assert r["extracted_text"].startswith("Real paragraph")
    assert 'b">' not in r["extracted_text"]
    # same agreement inside the rawtext mask: the script open tag ends
    # at the REAL '>', not the quoted one
    r2 = extract_one('<script data-x="a>b">var i=1; if(i<2){}</script>'
                     "<p>Body paragraph long enough to be retained.</p>")
    assert r2["extracted_text"] == "Body paragraph long enough to be retained."


def test_bare_apostrophe_attr_degrades_to_first_gt():
    """A bare apostrophe in an unquoted attribute must not swallow
    content past the tag end (quote interiors never cross '<')."""
    r = extract_one("<html><p>Before <a title=it's x=1>link</a> after "
                    "and this paragraph is long enough to stay.</p></html>")
    assert "Before link after" in r["extracted_text"]


def test_never_raises():
    for bad in ["", None, "<", "<<<>>>", "&#xZZ;", "\x00\x01", "a" * 100]:
        r = extract_one(bad)
        assert r["status"] in ("success", "error", "skipped_ocr")


# --- determinism ---------------------------------------------------------------

def test_extract_is_pure():
    from docling_api_spark.gen import payload_for

    for conv in range(5):
        for turn in range(5):
            _, text = payload_for(42, conv, turn)
            assert extract_one(text) == extract_one(text)


def test_list_inside_cell_does_not_corrupt_outer_numbering():
    """A <ul>/<ol> inside a table cell is flattened into the cell text,
    but its close must pop ITS OWN list counter — not the counter of a
    list enclosing the whole table (regression: items after the table
    lost their ordered numbering)."""
    payload = ('<ol><li>one<table><tr><td><ul>x</ul>y</td></tr></table></li>'
               '<li>two</li><li>three</li></ol>')
    text = extract_one(payload)["extracted_text"]
    assert "2. two" in text and "3. three" in text
    # unclosed guarded list: the implied closes stay balanced too
    p2 = '<ol><li>a<table><tr><td><ul>x</td></tr></table></li><li>b</li></ol>'
    assert "2. b" in extract_one(p2)["extracted_text"]


# --- configurable payload cap (ExtractOptions.max_payload_chars) ------------

def test_max_payload_chars_option():
    """A >cap document errors at the default but extracts when the cap is
    raised (VERDICT r03 item 2: the reference accepts 100 MB files,
    api/config.py:56-59 — the 64 KiB default must be a per-job option,
    not a hard wall)."""
    import pytest

    big = "<html><body><p>" + ("Real words here. " * 5000) + "</p></body></html>"
    assert len(big) > MAX_PAYLOAD_CHARS

    # default cap: oversize error capsule, count surfaced via payload_kind
    r = extract_one(big)
    assert r["status"] == "error"
    assert r["payload_kind"] == "oversize"
    assert f"> {MAX_PAYLOAD_CHARS}" in r["error"]

    # raised cap: full extraction succeeds on the same payload
    r2 = extract_one(big, ExtractOptions(max_payload_chars=len(big)))
    assert r2["status"] == "success"
    assert r2["payload_kind"] == "html"
    assert "Real words here." in r2["extracted_text"]

    # sniff_kind takes the cap directly
    assert sniff_kind(big) == "oversize"
    assert sniff_kind(big, len(big)) == "html"

    # lowered cap: even a small plain payload can be gated
    r3 = extract_one("tiny plain text", ExtractOptions(max_payload_chars=4))
    assert r3["status"] == "error" and r3["payload_kind"] == "oversize"

    # options validation fails fast
    with pytest.raises(ValueError):
        ExtractOptions(max_payload_chars=0)
    with pytest.raises(ValueError):
        ExtractOptions(max_payload_chars="big")
    # bool is an int subclass — True would silently mean cap=1 (every
    # non-empty doc an oversize error row); must fail fast instead
    with pytest.raises(ValueError):
        ExtractOptions(max_payload_chars=True)
