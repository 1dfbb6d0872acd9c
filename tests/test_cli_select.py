"""CLI `select` subcommand edge cases (ADVICE r03): an empty selection
(empty corpus) must emit a valid report with selected=0 and OMIT the
min/max score fields instead of crashing on int(None).

Runs the CLI as a subprocess (``main`` stops its SparkSession on exit,
which would tear down the shared session fixture if run in-process);
inputs/outputs go through pyarrow so the test needs no Spark at all.
"""

from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys

import pyarrow as pa
import pyarrow.parquet as pq

REPO = pathlib.Path(__file__).resolve().parent.parent


def _write(path: pathlib.Path, ids: list[int], texts: list[str]) -> str:
    table = pa.table(
        {"doc_id": pa.array(ids, pa.int64()),
         "text": pa.array(texts, pa.string())}
    )
    path.mkdir()
    pq.write_table(table, path / "part-0.parquet")
    return str(path)


def test_cli_select_empty_corpus(tmp_path):
    corpus = _write(tmp_path / "corpus", [], [])
    target = _write(
        tmp_path / "target", [1, 2],
        ["spark planner prunes columns and pushes filters down",
         "broadcast joins skip the shuffle exchange entirely"],
    )
    raw = _write(
        tmp_path / "raw", [3, 4],
        ["win free prizes now click here subscribe today",
         "cheap deals best price limited offer buy now"],
    )
    out_dir = str(tmp_path / "out")
    env = dict(os.environ, PYTHONPATH=str(REPO))
    proc = subprocess.run(
        [sys.executable, "-m", "docling_api_spark.cli", "select",
         "--input", corpus, "--target", target, "--raw", raw,
         "-k", "5", "--output", out_dir],
        capture_output=True, text=True, cwd=str(REPO), env=env,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    report = json.loads(proc.stdout.strip().splitlines()[-1])
    assert report["selected"] == 0 and report["k"] == 5
    assert "min_score_scaled" not in report
    assert "max_score_scaled" not in report
    # glob the part files (Spark also writes a non-parquet _SUCCESS)
    parts = list(pathlib.Path(out_dir).glob("*.parquet"))
    assert parts and sum(pq.read_table(p).num_rows for p in parts) == 0
