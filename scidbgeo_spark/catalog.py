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

    def save_tiles(self, name: str, tiles: DataFrame) -> DataFrame:
        """Persist a chunked-array table with SciDB-like chunk placement:
        hive-partitioned by tile_y so dimension-range queries prune whole
        chunk-row directories at planning time (the Iceberg partition-spec
        analog — `bucket(tile_y, tile_x)` there; plain parquet here).
        Returns the re-read table (scans of it show PartitionFilters)."""
        if not self.warehouse:
            raise ValueError("no warehouse dir configured")
        path = f"{self.warehouse}/{name}"
        tiles.write.mode("overwrite").partitionBy("tile_y").parquet(path)
        df = self.spark.read.parquet(path)
        self.register(name, df)
        return df

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

    # -- Iceberg switch point ------------------------------------------------
    def iceberg_available(self) -> bool:
        """The production catalog is Iceberg (snapshots replace SciDB
        array versions; MERGE INTO replaces insert(redimension(...));
        bucket(tile_y, tile_x) partition specs give chunk placement).
        This sandbox ships no Iceberg jars, so save()/save_tiles() write
        hive-partitioned parquet with lineage manifests
        (plans/lineage.py) as the functional stand-in.  Wiring Iceberg is
        a config change: spark.sql.catalog.<name>=org.apache.iceberg...
        and df.writeTo(...) in the two save methods."""
        try:
            self.spark._jvm.Class.forName("org.apache.iceberg.catalog.Catalog")
            return True
        except Exception:  # noqa: BLE001
            return False
