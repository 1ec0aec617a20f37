"""PySpark-native analytics engine with the query & data-processing
capabilities of ``nguyenbavietquang123/stock-data-warehouse-analytics``.

The reference (at ``/root/reference``, read-only) is an eager pandas
pipeline over one denormalized stock fact table.  This package
re-expresses every operator it exercises (SURVEY.md §2) — plus the
mandated large-scale LLM-data-pipeline extensions — as lazy, declarative
Spark DataFrame plans designed for a multi-executor cluster:

- ``session``    SparkSession builder (AQE on, sane shuffle sizing)
- ``schemas``    fixed schemas + the Vietnamese→English rename map
- ``sources``    CSV/parquet scans & sinks (S1–S8)
- ``functions``  scalar expressions: parsers C1–C4, derivations C5–C10,
                 text analysis, vector math
- ``operators``  olap (A1–A14), windows (W1–W13), joins (J1), stats
                 (M6–M7), mining (M1–M5), dedup, similarity
- ``streaming``  event-time windows, watermarks, sessionization
- ``plans``      the query registry backing ``__spark_entry__.py``
                 (each query paired with a DuckDB oracle SQL string)
"""

__version__ = "0.1.0"
