"""PySpark-native analytics engine with the query and data-processing
capabilities of viru2001/realtime_financial_transactions_data_pipeline.

The reference is a GCP streaming ETL (Pub/Sub -> Beam/Dataflow -> BigQuery
+ Power BI analytics). This package re-expresses that surface Spark-first:

- ``sources``   : batch + streaming readers with declared (not inferred)
                  schemas, incl. the Avro-union JSON unwrap.
- ``functions`` : scalar function library (masking, date_id arithmetic,
                  calendar extraction) + FPE tokenization (pandas UDF).
- ``operators`` : relational probe queries (star joins, slicer filters,
                  dashboard aggregates) and LLM-data-pipeline extensions
                  (dedup, similarity search, text analysis, multimodal).
- ``streaming`` : the flagship parse -> validate -> tokenize -> dual-sink
                  pipeline as Structured Streaming with foreachBatch
                  (idempotent per-epoch dual append, refreshed lookups).
- ``plans``     : plan-inspection helpers (broadcast / pushdown asserts)
                  backing the plan-regression tests.

Everything here derives from the public Apache Spark API and the public
reference repo; citations to reference files use ``file:line`` form.
"""

__version__ = "0.1.0"
