"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct; decode / feature-extraction runs batch-wise in
``mapInPandas``. The actual codec step is a **clearly-marked STUB** —
image/audio libraries are not in this container — but the Spark-side
contract (schema, batching, UDF signature, partition behavior) is real
and tested, per the build brief.

The deterministic fake decoder parses a tiny header we synthesize
(``FIMG`` magic + width + height), standing in for e.g. PIL decode.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FAKE_IMAGE_MAGIC = b"FIMG"

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("format", T.StringType(), True),
        T.StructField("mean_byte", T.DoubleType(), True),
    ]
)


def encode_fake_image(width: int, height: int, payload: bytes) -> bytes:
    """Deterministic synthetic 'image': header + raw bytes (test helper)."""
    return FAKE_IMAGE_MAGIC + struct.pack("<II", width, height) + payload


def real_decode_stub(data: bytes):
    """Where a real codec (PIL / ffmpeg / soundfile) would run.

    Deliberately unimplemented in this container; the pipeline routes
    around it via the FIMG fake for tests.
    """
    raise NotImplementedError(
        "real image/audio decode requires codec libraries not present in "
        "this environment; use the FIMG deterministic fake in tests"
    )


def with_image_metadata(df: DataFrame, bin_col: str = "image") -> DataFrame:
    """Decode/feature-extract over Arrow batches: one numpy pass per batch.
    Bad payloads produce NULL metadata fields, never task failures (same
    error-capsule posture as the text kernel, C10)."""
    passthrough = T.StructType(
        [f for f in df.schema.fields if f.name != bin_col]
    )
    out_schema = T.StructType(
        list(passthrough.fields) + [T.StructField("image_meta", IMAGE_META_SCHEMA, True)]
    )
    keep = [f.name for f in passthrough.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            metas = []
            for raw in pdf[bin_col]:
                if raw is None or len(raw) < 12 or bytes(raw[:4]) != FAKE_IMAGE_MAGIC:
                    metas.append(
                        {"width": None, "height": None,
                         "n_bytes": 0 if raw is None else len(raw),
                         "format": None, "mean_byte": None}
                    )
                    continue
                w, h = struct.unpack("<II", bytes(raw[4:12]))
                body = np.frombuffer(bytes(raw[12:]), dtype=np.uint8)
                metas.append(
                    {"width": int(w), "height": int(h), "n_bytes": len(raw),
                     "format": "fimg",
                     "mean_byte": round(float(body.mean()), 4) if len(body) else None}
                )
            out = pdf[keep].copy().reset_index(drop=True)
            out["image_meta"] = metas
            yield out

    return df.mapInPandas(run, schema=out_schema)
