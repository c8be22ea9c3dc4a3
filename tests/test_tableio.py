"""TableIO adapter seam (sources/tableio): ParquetSnapshotIO must be a
drop-in for IceTable behind the interface; IcebergIO must fail FAST with
a clear message in this jar-less sandbox; open_table dispatches."""

import pytest
from pyspark.sql import functions as F

from geopy_spark.sources.icetab import IceTable
from geopy_spark.sources.tableio import (IcebergIO, ParquetSnapshotIO,
                                         TableIO, open_table)


def test_parquet_snapshot_io_roundtrip(spark, tmp_path):
    t = open_table(str(tmp_path / "tab"))
    assert isinstance(t, ParquetSnapshotIO)
    assert isinstance(t, TableIO) and isinstance(t, IceTable)

    df = spark.range(10).withColumn("p", F.lit("a"))
    t.append(df, "p=a", run_id="r1")
    assert t.committed_partitions() == {"p=a"}
    assert t.read(spark).count() == 10

    # two-phase write: staged partitions invisible until commit
    pend = [t.write_partition(spark.range(5).withColumn("p", F.lit("b")), "p=b"),
            t.write_partition(spark.range(3).withColumn("p", F.lit("c")), "p=c")]
    assert t.committed_partitions() == {"p=a"}
    t.commit(pend, run_id="r2")
    assert t.committed_partitions() == {"p=a", "p=b", "p=c"}
    assert t.read(spark).count() == 18
    assert t.read_partition(spark, "p=b").count() == 5

    lin = {r.partition: r.rows_out for r in t.lineage(spark).collect()}
    assert lin == {"p=a": 10, "p=b": 5, "p=c": 3}

    t.set_properties({"fingerprint": "xyz"})
    assert t.properties() == {"fingerprint": "xyz"}


def test_iceberg_io_clear_error_without_catalog(spark):
    with pytest.raises(RuntimeError, match="spark.sql.catalog.prod"):
        IcebergIO(spark, "prod.db.tiles")


def test_open_table_dispatch(spark, tmp_path):
    assert isinstance(open_table(str(tmp_path / "x")), ParquetSnapshotIO)
    # dotted identifier routes to IcebergIO, which probes the catalog
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        open_table("prod.db.tiles", spark)
