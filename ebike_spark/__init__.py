"""ebike_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the ebike reference (an OLAP database;
see SURVEY.md), re-expressed Spark-first.

Layout
------
- ``session``    : tuned SparkSession builder (AQE, UTC, arrow).
- ``sources``    : parquet table registry for the driver's test tables.
- ``plans``      : declarative query builders (the SURVEY §2.C set and
                   beyond) each paired with an ANSI-SQL oracle string.
- ``operators``  : large-scale data-pipeline operators (dedup,
                   similarity search, text analysis, multimodal).
- ``functions``  : reusable Column-expression helpers (JVM-side).
- ``engine``     : the ebike-parity SQL frontend (DDL/DML/SHOW/session
                   semantics) over Parquet-backed managed tables.
- ``streaming``  : Structured Streaming paths for the events table.

Everything is built on the public PySpark DataFrame/SQL API; physical
execution is delegated to Catalyst/Tungsten.
"""

from ebike_spark.session import get_spark, stop_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "stop_spark", "__version__"]
