"""The extraction operator: ``mapInArrow`` over Arrow record batches.

This is the Spark incarnation of the reference's conversion core
(reference deployments/modal/modal_docling.py:185-264, 'process one
document, capsule errors'), vectorized batch-wise per the north rule:
one Python call per Arrow batch (≈4096 rows), zero per-row Python in
the data plane.

``mapInArrow`` (not ``mapInPandas``): the worker receives and returns
``pyarrow.RecordBatch`` directly. Passthrough columns are forwarded
**zero-copy** (the input Arrow buffers are re-emitted untouched), and
the nested ``spans`` column is assembled from the kernel's flat
parallel arrays via ``StructArray.from_arrays`` + ``ListArray.
from_arrays`` — the Arrow memory layout itself, no per-element Python
objects. Measured on this box the pandas serializer path costs ~35% of
end-to-end throughput; this path runs within ~7% of a no-output kernel
ceiling.

The operator is schema-generic: it appends the EXTRACT_RESULT_FIELDS to
whatever passthrough columns the caller keeps. Extraction is per-row
independent (no batch-boundary or partition-boundary dependence), which
is what makes the whole pipeline embarrassingly parallel and the
batch-invariance test (tests/test_spark_extract.py) meaningful.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from docling_api_spark.schema import EXTRACT_RESULT_FIELDS


def _result_schema(passthrough: T.StructType) -> T.StructType:
    return T.StructType(list(passthrough.fields) + list(EXTRACT_RESULT_FIELDS))


def classify_blocks_udf():
    """§2.11 UDF #2: the C2 boilerplate classifier exposed on its own for
    fixture-level testing — html payload -> JSON array of per-block
    labels (node id, kind, chrome flag, link density, kept-as-content
    decision), independent of markdown emission. Scalar Arrow-batched
    pandas UDF; shares the parse/classify kernels with extract_turns so
    label parity with the extraction output is structural."""
    from pyspark.sql import functions as F

    @F.pandas_udf(T.StringType())
    def classify(texts: pd.Series) -> pd.Series:
        import json

        from docling_api_spark.extraction.kernel import (
            _Table,
            _classify_block,
            _parse_html,
        )

        out = []
        for t in texts:
            if t is None:
                out.append("[]")
                continue
            labels = []
            for node in _parse_html(t):
                if isinstance(node, _Table):
                    labels.append({"id": node.node_id, "kind": "table",
                                   "chrome": node.chrome,
                                   "content": not node.chrome and bool(node.rows)})
                    continue
                tl = node.text_len()
                labels.append({
                    "id": node.node_id, "kind": node.kind,
                    "chrome": node.chrome,
                    "link_density": round(node.link_len / tl, 4) if tl else 0.0,
                    "content": _classify_block(node),
                })
            out.append(json.dumps(labels, sort_keys=True, separators=(",", ":")))
        return pd.Series(out)

    return classify


def extract_text_column(df: DataFrame, text_col: str = "text",
                        keep_cols: list[str] | None = None,
                        options=None) -> DataFrame:
    """Append extraction result columns, dropping the raw payload.

    ``keep_cols`` defaults to every column except ``text_col`` — the raw
    payload is dropped after extraction (at 100 TB you do not carry the
    input bytes through the shuffleless write, you re-read them from the
    source snapshot on resume).

    ``options`` is an ``ExtractOptions`` (default: reference defaults —
    output_format='markdown', tables on). It is captured in the UDF
    closure as a per-job constant (SURVEY §1.1: 'broadcast literals
    passed to the UDF constructor', never per-row).
    """
    keep = keep_cols if keep_cols is not None else [
        c for c in df.columns if c != text_col
    ]
    passthrough = T.StructType([df.schema[c] for c in keep])
    out_schema = _result_schema(passthrough)
    opt_fmt = options.output_format if options is not None else "markdown"
    opt_tables = options.enable_table_extraction if options is not None else True
    opt_maxchars = options.max_payload_chars if options is not None else None

    def run(batches: Iterator) -> Iterator:
        # import inside the task: keeps the closure tiny; the kernel module
        # (with its precompiled regex automata) loads once per worker and
        # is reused across batches (worker reuse is on by default).
        import pyarrow as pa

        from docling_api_spark.extraction.kernel import (
            ExtractOptions,
            extract_flat,
        )

        if opt_maxchars is None:
            opts = ExtractOptions(opt_fmt, opt_tables)
        else:
            opts = ExtractOptions(opt_fmt, opt_tables, opt_maxchars)

        span_struct = pa.struct([
            pa.field("start", pa.int64(), nullable=False),
            pa.field("end", pa.int64(), nullable=False),
            pa.field("node_id", pa.int32(), nullable=False),
            pa.field("kind", pa.string(), nullable=False),
        ])
        out_arrow = None  # built from the first batch (keeps input arrow
        # types, e.g. timestamp unit/tz, exactly as Spark sent them)

        for b in batches:
            idx = b.schema.get_field_index(text_col)
            cols = extract_flat(b.column(idx).to_pylist(), opts)

            structs = pa.StructArray.from_arrays(
                [
                    pa.array(cols["span_start"], pa.int64()),
                    pa.array(cols["span_end"], pa.int64()),
                    pa.array(cols["span_node_id"], pa.int32()),
                    pa.array(cols["span_kind"], pa.string()),
                ],
                fields=list(span_struct),
            )
            spans = pa.ListArray.from_arrays(
                pa.array(cols["span_offsets"], pa.int32()), structs
            )
            keep_arrays = [
                b.column(b.schema.get_field_index(c)) for c in keep
            ]
            result_arrays = [
                pa.array(cols["status"], pa.string()),
                pa.array(cols["payload_kind"], pa.string()),
                pa.array(cols["extracted_text"], pa.string()),
                pa.array(cols["doc_json"], pa.string()),
                spans,
                pa.array(cols["pages"], pa.int32()),
                pa.array(cols["n_nodes"], pa.int32()),
                pa.array(cols["error"], pa.string()),
            ]
            if out_arrow is None:
                out_arrow = pa.schema(
                    [b.schema.field(b.schema.get_field_index(c)) for c in keep]
                    + [
                        pa.field("status", pa.string()),
                        pa.field("payload_kind", pa.string()),
                        pa.field("extracted_text", pa.string()),
                        pa.field("doc_json", pa.string()),
                        pa.field("spans", pa.list_(span_struct)),
                        pa.field("pages", pa.int32()),
                        pa.field("n_nodes", pa.int32()),
                        pa.field("error", pa.string()),
                    ]
                )
            yield pa.RecordBatch.from_arrays(
                keep_arrays + result_arrays, schema=out_arrow
            )

    return df.mapInArrow(run, schema=out_schema)
