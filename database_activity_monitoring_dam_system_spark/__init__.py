"""PySpark-native analytics engine with the query and data-processing
capabilities of the Database-Activity-Monitoring (DAM) reference system.

The reference (read-only at /root/reference/) delegates all execution to
MySQL; this engine re-expresses its entire workload — relational analytics,
rule batteries, compliance explode, firewall matching, anomaly detection,
streaming ingest — as idiomatic Spark DataFrame / SQL / Structured Streaming
plans, plus the large-scale training-data-pipeline extensions (dedup,
similarity search, text analysis, multimodal plumbing).

Layout:
    session.py    SparkSession factory (UTC, AQE, Arrow)
    schemas.py    explicit StructTypes for every DAM table
    sources/      testdata loaders + agent-event normalization
    functions/    scalar expression library (SURVEY.md §2.7)
    operators/    analytics / rules / anomaly / dedup / similarity / text
    plans/        query registry backing __spark_entry__.py
    streaming/    Structured Streaming ingest pipeline (SURVEY.md §2.9)
"""

__version__ = "0.1.0"
