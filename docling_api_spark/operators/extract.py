"""The extraction operator: ``mapInPandas`` over Arrow record batches.

This is the Spark incarnation of the reference's conversion core
(reference deployments/modal/modal_docling.py:185-264, 'process one
document, capsule errors'), vectorized batch-wise per the north rule:
one Python call per Arrow batch (≈2048 rows), zero per-row Python.

The operator is schema-generic: it appends the EXTRACT_RESULT_FIELDS to
whatever passthrough columns the caller keeps. Extraction is per-row
independent (no batch-boundary or partition-boundary dependence), which
is what makes the whole pipeline embarrassingly parallel and the
batch-invariance test (tests/test_spark_extract.py) meaningful.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from docling_api_spark.schema import EXTRACT_RESULT_FIELDS


def _result_schema(passthrough: T.StructType) -> T.StructType:
    return T.StructType(list(passthrough.fields) + list(EXTRACT_RESULT_FIELDS))


def extract_text_column(df: DataFrame, text_col: str = "text",
                        keep_cols: list[str] | None = None) -> DataFrame:
    """Append extraction result columns, dropping the raw payload.

    ``keep_cols`` defaults to every column except ``text_col`` — the raw
    payload is dropped after extraction (at 100 TB you do not carry the
    input bytes through the shuffleless write, you re-read them from the
    source snapshot on resume).
    """
    keep = keep_cols if keep_cols is not None else [
        c for c in df.columns if c != text_col
    ]
    passthrough = T.StructType([df.schema[c] for c in keep])
    out_schema = _result_schema(passthrough)

    def run(batches: Iterator) -> Iterator:
        # import inside the task: keeps the closure tiny; the kernel module
        # (with its precompiled regex automata) loads once per worker and
        # is reused across batches (worker reuse is on by default).
        import pandas as pd

        from docling_api_spark.extraction.kernel import extract_records

        for pdf in batches:
            cols = extract_records(pdf[text_col].tolist())
            out = pdf[keep].copy() if keep else pd.DataFrame(index=pdf.index)
            out = out.reset_index(drop=True)
            for name, vals in cols.items():
                out[name] = vals
            out["pages"] = out["pages"].astype("int32")
            out["n_nodes"] = out["n_nodes"].astype("int32")
            yield out

    return df.mapInPandas(run, schema=out_schema)
