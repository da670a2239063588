"""deepseek_ocr_spark — a PySpark-native document-extraction engine.

A from-scratch, Spark-first re-expression of the data-processing
capabilities of nkotak/DeepSeek-OCR (reference at /root/reference):
interleaved span extraction, classification, media-ref resolution,
boilerplate dropping, reading-order recovery, normalization and
per-document assembly — plus the large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal
plumbing) such an engine needs at 100 TB.

Design rules (see SURVEY.md):
- DataFrame/SQL only; Catalyst does the optimizing.
- No per-row Python UDFs: vectorized pandas/Arrow UDFs or built-in
  functions everywhere.
- Explicit ordering columns (`offset`, `page_no`) — row order never
  survives a shuffle, so every ordered semantic re-sorts explicitly.
"""

__version__ = "0.1.0"
