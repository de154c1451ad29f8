"""websearchengine_spark — a PySpark-native full-text index + BM25 engine.

A from-scratch rebuild of the query and data-processing capabilities of the
reference engine sl3760/WebSearchEngine (see SURVEY.md), expressed as
idiomatic Spark DataFrame plans plus a small set of vectorized Arrow UDFs:

- ``functions``   scalar layer: text extraction, the reference's 3-step
                  stemmer + stopword tokenizer, delta-gap/varint codec
- ``sources``     corpus fixture synthesis and readers (TSV corpus, view log,
                  ads TSV, parquet/Iceberg-style tables)
- ``operators``   index build, statistics, query evaluation, ranking, graph
                  mining, IR evaluation, dedup / similarity / text-analysis
- ``plans``       end-to-end build pipeline with per-partition checkpoints,
                  segment merge compaction
- ``streaming``   incremental indexing wrappers (Structured Streaming)
- ``oracle``      pure-Python re-implementation of the reference semantics,
                  used only by tests as the ground truth
"""

__version__ = "0.1.0"
