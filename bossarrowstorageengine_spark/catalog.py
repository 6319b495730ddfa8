"""Table registry over the test-data parquet directories.

The reference's storage role — materialize table symbols into columnar data
(SURVEY.md §1.1) — maps to: parquet scans registered as temp views, so both
the DataFrame API and ``spark.sql`` resolve the same tables (SURVEY.md §1.3).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: The ten driver tables (TESTDATA.md / FIXTURES.md).
TABLES: tuple[str, ...] = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar scan of one table. Catalyst handles predicate pushdown,
    column pruning and (for partitioned layouts) partition pruning.

    ``events.ts`` is parquet ``timestamp[ns]`` — an illegal type for Spark's
    parquet reader. With ``spark.sql.legacy.parquet.nanosAsLong`` it arrives
    as a long of nanoseconds; we floor-divide to µs and rebuild a timestamp,
    which is bit-identical to DuckDB 1.0's read of the same file (DuckDB
    returns TIMESTAMP = µs, floor-truncated — verified empirically).
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str,
                   tables: tuple[str, ...] = TABLES) -> None:
    """Register every table as a temp view so SQL and DataFrame entry points
    are interchangeable (SURVEY.md §3.2 E1/E2)."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
