"""Catalog facade: the engine-side equivalents of the reference's DDL and
introspection surface (scidb.py):

- ``create array`` (scidb.py:267-294)      -> register/save a tile table
- ``remove(A)`` (scidb.py:126-156)          -> drop
- ``show(A)`` / ``list('arrays')`` (scidb.py:158-190) -> schema / listing
- ``list('instances')`` (SciDB_analysis.py:317-318)    -> parallelism probe
  (the reference sizes its ingest partitioning from the instance count;
  the engine reads Spark's default parallelism)

Tables live as temp views (session catalog) or parquet dirs (persistent);
Iceberg would slot in here behind the same calls (config switch, no code
dependency — SURVEY §7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class ArrayCatalog:
    def __init__(self, spark: SparkSession, warehouse: str | None = None):
        self.spark = spark
        self.warehouse = warehouse

    # -- create array ------------------------------------------------------
    def register(self, name: str, df: DataFrame) -> None:
        df.createOrReplaceTempView(name)

    def save(self, name: str, df: DataFrame) -> None:
        if not self.warehouse:
            raise ValueError("no warehouse dir configured")
        df.write.mode("overwrite").parquet(f"{self.warehouse}/{name}")
        self.register(name, self.spark.read.parquet(f"{self.warehouse}/{name}"))

    # -- show / list -------------------------------------------------------
    def show(self, name: str) -> str:
        """Schema string (the reference regex-parses show() output to clone
        dimension specs — here the schema is first-class)."""
        return self.spark.table(name).schema.simpleString()

    def list_arrays(self) -> list[str]:
        return [t.name for t in self.spark.catalog.listTables()]

    # -- remove ------------------------------------------------------------
    def remove(self, name: str) -> None:
        self.spark.catalog.dropTempView(name)

    # -- list('instances') -------------------------------------------------
    def instance_count(self) -> int:
        return self.spark.sparkContext.defaultParallelism
