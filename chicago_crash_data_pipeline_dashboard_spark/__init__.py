"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference Chicago-Crash-Data-Pipeline-Dashboard.

Brand-new Spark-first design (DataFrame / Spark SQL / Catalyst /
Structured Streaming) — NOT a port of the reference's
Go + Polars + Pandas + DuckDB stack. See SURVEY.md for the capability
blueprint this package implements.

Layout
------
- ``session``   : SparkSession factory tuned for AQE + local[N] testing.
- ``schemas``   : explicit StructTypes for bronze/silver/gold layers.
- ``sources``   : partitioned JSON/CSV/Parquet readers, job-spec filters.
- ``functions`` : column-expression builders (cleaning, text, vectors).
- ``operators`` : silver transform, gold cleaning chain, upsert,
                  dedup family, similarity search, multimodal plumbing.
- ``plans``     : the named analytics query surface (dashboard metrics).
- ``streaming`` : watermark state + incremental/structured ingest.
- ``ml``        : Spark ML classification pipeline + threshold scoring.
"""

__version__ = "0.1.0"
