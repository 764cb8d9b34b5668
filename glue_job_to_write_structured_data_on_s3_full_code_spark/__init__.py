"""PySpark-native analytics engine with the capability surface of the
reference repo ``MonamiDattaDataEngineer/GLUE-JOB-TO-WRITE-STRUCTURED-DATA-ON-S3-FULL-CODE``
(an AWS Glue batch ETL pipeline over snapshot-partitioned CRM tables),
re-expressed Spark-first per SURVEY.md.

Layout
------
- ``session``    : tuned SparkSession factory / conf helpers
- ``sources``    : parquet snapshot tables, JDBC, REST-JSON, doc-store stand-in
- ``operators``  : fallback (waterfall) join, top-1 dedup, anti-join
                   incremental load, reconcile/validation, surrogate keys,
                   dedup (exact/minhash/simhash/jaccard), similarity search,
                   nested document assembly
- ``functions``  : scalar helpers (text analysis, datetime/timezone)
- ``plans``      : end-to-end pipelines (flagship prospect-style pipeline)
- ``streaming``  : incremental micro-batch wrappers

Everything compiles to Spark logical plans; Catalyst/Tungsten/AQE own the
physical execution (SURVEY.md §4 — the reference needs zero custom rules).
"""

__version__ = "0.1.0"
