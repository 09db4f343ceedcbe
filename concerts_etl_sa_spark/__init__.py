"""concerts_etl_sa_spark — a PySpark-native analytics engine.

Re-expresses the query/data-processing capabilities of the reference
``Olympedpnt/concerts-etl-sa`` (a single-process row-at-a-time Python ETL)
as an idiomatic Spark DataFrame/SQL engine, designed for 100 TB scale:

- declarative logical plans (Catalyst does pushdown/pruning/join selection)
- equi-key blocking before every fuzzy join (no unbounded cross joins)
- broadcast hints for small dimensions, AQE for runtime re-planning
- JVM-side ``pyspark.sql.functions`` everywhere in the hot path

Subpackages
-----------
- ``sources``   — parquet readers with explicit schemas (SURVEY §2.A)
- ``functions`` — Column->Column scalar library (SURVEY §2.B/C)
- ``operators`` — composed transforms: consolidation joins, dedup, ANN,
  text analysis (SURVEY §2.D-H, §2.L)
- ``sinks``     — writers (SURVEY §2.A sinks)
- ``streaming`` — incremental/availableNow veneer (SURVEY §2.I)
"""

__version__ = "0.1.0"
