"""webxtract — PySpark-native web/document content extraction engine.

A from-scratch rebuild of the per-document computations of the reference
service ``tanveerafzal/document-ocr`` (see SURVEY.md) as columnar DataFrame
transformations over a Common-Crawl-style page table
``(url, warc_ts, html, text, lang)``:

- main-content extraction (HTML boilerplate strip / PDF page parse) via
  vectorized Arrow UDFs — the only Python on the hot path,
- span assembly, structured-field extraction, document-type detection,
  fake/specimen scoring and the validation battery as pure Catalyst
  column expressions (whole-stage-codegen'd, zero per-row Python),
- plus the large-scale training-data toolkit (dedup, similarity search,
  text analysis) and audit/lineage + idempotent resume.
"""

__version__ = "0.1.0"
