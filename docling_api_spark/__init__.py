"""docling_api_spark — a PySpark-native main-content extraction engine.

A from-scratch rebuild of the data-processing capabilities of
vivek1240/docling-api (reference at /root/reference, read-only) as an
idiomatic Spark pipeline:

- document/HTML -> cleaned markdown + content spans (Docling-style
  boilerplate stripping, DOM-density heuristics, table recovery), run
  batch-wise through Arrow record batches (``mapInArrow``), never
  per-row Python  [reference: deployments/modal/modal_docling.py:80-264]
- metering / usage analytics as pure DataFrame aggregations
  [reference: api/services/key_service.py, api/routes/documents.py:35-78]
- per-partition lineage + manifest checkpointing for resumable runs
  [reference async-job surface: api/routes/documents.py:255-339]

Nothing is copied from the reference; it is a spec, not a source.
"""

__version__ = "0.1.0"
