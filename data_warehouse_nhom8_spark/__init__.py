"""data_warehouse_nhom8_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference warehouse (``22130124/data_warehouse_nhom8``,
a MySQL/Python/Java batch ELT pipeline) as an idiomatic Apache Spark
engine: DataFrame/SQL logical plans on Catalyst, Parquet-backed storage,
Structured Streaming for the incremental semantics, plus the
large-scale training-data operators (dedup, similarity search, text
analysis, multimodal plumbing) such a warehouse needs at 100 TB.

Layout:
    session     SparkSession factory (AQE, timezone, shuffle sizing)
    schemas     explicit StructTypes for every table
    sources     readers/writers (parquet testdata, partitioned CSV, JDBC stub)
    operators   joins / aggregates / windows / setops / dedup / scd2 /
                similarity / text / multimodal
    functions   scalar column-expression builders (salary parser, dates, ...)
    plans       declared oracle queries Q01..Q32 + extensions
    pipeline    run-ledger, staging transform, warehouse merge, datamart
    streaming   Structured Streaming twins of the batch pipeline
"""

__version__ = "0.1.0"
