"""Generate and commit the golden extraction fixtures (FIXTURES.md §3).

Run once (and re-run only on an intentional kernel contract change):
    python scripts/make_fixtures.py

Output: fixtures/golden_extractions.parquet — the single-node oracle's
output over the deterministic transcript corpus (seed=42, 120 convs),
spans JSON-encoded with sorted keys for byte-stable storage.
"""

from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from docling_api_spark.extraction.kernel import ExtractOptions
from docling_api_spark.extraction.oracle import oracle_extract, spans_to_json
from docling_api_spark.gen import DEFAULT_SEED, gen_transcripts_pdf

FIXTURE_CONVS = 120
FIXTURE_DIR = pathlib.Path(__file__).resolve().parent.parent / "fixtures"

# fixtures freeze BOTH export surfaces (C6 markdown + C7 doc_json); the
# markdown bytes are identical to output_format='markdown' by construction
# (tested in tests/test_kernel.py)
FIXTURE_OPTIONS = ExtractOptions(output_format="both")


def main() -> None:
    pdf = gen_transcripts_pdf(FIXTURE_CONVS, seed=DEFAULT_SEED)
    golden = oracle_extract(pdf, options=FIXTURE_OPTIONS)
    golden["spans_json"] = spans_to_json(golden["spans"])
    golden = golden.drop(columns=["spans"])
    out = FIXTURE_DIR / "golden_extractions.parquet"
    golden.to_parquet(out, index=False)
    meta = {
        "seed": DEFAULT_SEED,
        "n_convs": FIXTURE_CONVS,
        "n_turns": int(len(golden)),
        "status_counts": golden["status"].value_counts().to_dict(),
        "payload_kind_counts": golden["payload_kind"].value_counts().to_dict(),
    }
    (FIXTURE_DIR / "golden_meta.json").write_text(json.dumps(meta, indent=2, sort_keys=True))
    print(json.dumps(meta, indent=2, sort_keys=True))


if __name__ == "__main__":
    main()
