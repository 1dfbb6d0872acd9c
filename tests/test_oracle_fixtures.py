"""Oracle vs committed golden fixtures — catches kernel contract
regressions (the fixtures are the frozen contract; SURVEY.md §5.2.1)."""

from __future__ import annotations

from docling_api_spark.extraction.kernel import ExtractOptions
from docling_api_spark.extraction.oracle import oracle_extract, spans_to_json
from docling_api_spark.gen import DEFAULT_SEED, gen_transcripts_pdf


def test_oracle_matches_committed_fixtures(golden):
    n_convs = golden["conv_id"].nunique()
    pdf = gen_transcripts_pdf(n_convs, seed=DEFAULT_SEED)
    fresh = oracle_extract(pdf, options=ExtractOptions("both"))
    fresh["spans_json"] = spans_to_json(fresh["spans"])
    fresh = fresh.drop(columns=["spans"]).reset_index(drop=True)
    g = golden.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert len(fresh) == len(g)
    for col in ["conv_id", "turn_idx", "status", "payload_kind",
                "extracted_text", "doc_json", "pages", "n_nodes",
                "spans_json", "error"]:
        left, right = fresh[col], g[col]
        if left.dtype == object:
            mismatch = (left.fillna("∅") != right.fillna("∅"))
        else:
            mismatch = left != right
        assert not mismatch.any(), (
            f"column {col}: {int(mismatch.sum())} mismatches; first at "
            f"{fresh.loc[mismatch.idxmax(), ['conv_id', 'turn_idx']].tolist()}"
        )


def test_fixture_corpus_covers_all_payload_classes(golden):
    kinds = set(golden["payload_kind"].unique())
    assert {"html", "markdown", "plain", "pdfish", "empty", "b64",
            "needs_ocr", "oversize"} <= kinds
    statuses = set(golden["status"].unique())
    assert statuses == {"success", "error", "skipped_ocr"}
