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


# ---------------------------------------------------------------------------
# IcebergIO contract tests against a spy Spark surface (round 4 — the
# binding runs on a real cluster only; here every method's call sequence
# through the public SQL surface is pinned so a catalog swap can't break
# silently in ways the env-probe test would miss)
# ---------------------------------------------------------------------------


class _SpyRow:
    def __init__(self, **kw):
        self.__dict__.update(kw)
        self._vals = list(kw.values())

    def __getitem__(self, i):
        return self._vals[i]


class _SpyWriteTo:
    def __init__(self, log, ident):
        self._log, self._ident = log, ident

    def append(self):
        self._log.append(("writeTo.append", self._ident))

    def createOrReplace(self):
        self._log.append(("writeTo.createOrReplace", self._ident))


class _SpyDF:
    def __init__(self, log, name, rows=None, n=0):
        self._log, self._name = log, name
        self._rows, self._n = rows or [], n

    def _child(self, op):
        self._log.append((op, self._name))
        return self

    def filter(self, *_): return self._child("filter")
    def select(self, *_): return self._child("select")
    def distinct(self): return self._child("distinct")
    def unionByName(self, other): return self._child("unionByName")
    def collect(self): return self._rows
    def first(self): return self._rows[0] if self._rows else None
    def count(self): return self._n
    def writeTo(self, ident): return _SpyWriteTo(self._log, ident)


class _SpyConf:
    def __init__(self, confs): self._confs = confs
    def get(self, k, default=None): return self._confs.get(k, default)


class _SpyCatalog:
    def __init__(self, existing): self._existing = existing
    def tableExists(self, ident): return ident in self._existing


class _SpySpark:
    """Records every SQL statement + DataFrame op IcebergIO issues."""

    def __init__(self, confs=None, tables=None, existing=()):
        self.log = []
        self.conf = _SpyConf(confs or {})
        self.catalog = _SpyCatalog(set(existing))
        self._tables = tables or {}

    def sql(self, q):
        self.log.append(("sql", q))
        qn = " ".join(q.split())
        if "FROM" in qn and ".snapshots" in qn and "snapshot_id" in qn.split("SELECT")[1][:30]:
            return _SpyDF(self.log, "snapshots", rows=[_SpyRow(snapshot_id=777)])
        if "committed_at" in qn:
            return _SpyDF(self.log, "snapshots",
                          rows=[_SpyRow(committed_at="2026-01-02 03:04:05")])
        if qn.startswith("SHOW TBLPROPERTIES"):
            return _SpyDF(self.log, "props",
                          rows=[_SpyRow(key="k", value="v")])
        return _SpyDF(self.log, "sql")

    def table(self, ident):
        self.log.append(("table", ident))
        return self._tables.get(ident, _SpyDF(self.log, ident))

    def createDataFrame(self, rows, schema):
        self.log.append(("createDataFrame", len(rows)))
        return _SpyDF(self.log, "lineage_new", n=len(rows))


def _mk(confs=True, **kw):
    spy = _SpySpark(
        confs={"spark.sql.catalog.prod": "org.apache.iceberg.spark.SparkCatalog"}
        if confs else {}, **kw)
    return spy, IcebergIO(spy, "prod.db.tiles")


def _sqls(spy):
    return [q for op, q in spy.log if op == "sql"]


def test_icebergio_commit_is_one_snapshot_append():
    spy, io = _mk(existing=["prod.db.tiles_lineage"])
    p1 = io.write_partition(_SpyDF(spy.log, "d1", n=5), "z=0")
    p2 = io.write_partition(_SpyDF(spy.log, "d2", n=3), "z=1")
    # nothing written before commit
    assert not [e for e in spy.log if e[0].startswith("writeTo")]
    snap = io.commit([p1, p2], "run9")
    assert snap == 777
    writes = [e for e in spy.log if e[0].startswith("writeTo")]
    # exactly ONE data append (atomic snapshot) + one lineage append
    assert writes == [("writeTo.append", "prod.db.tiles"),
                      ("writeTo.append", "prod.db.tiles_lineage")]


def test_icebergio_lineage_table_created_when_missing():
    spy, io = _mk(existing=[])   # no lineage table yet
    io.commit([io.write_partition(_SpyDF(spy.log, "d", n=2), "z=0")], "r")
    writes = [e for e in spy.log if e[0].startswith("writeTo")]
    assert ("writeTo.createOrReplace", "prod.db.tiles_lineage") in writes


def test_icebergio_compact_quotes_string_partition_values(spark):
    """ADVICE r3: the where-clause for a string partition value must
    carry DOUBLED inner quotes (where => 'z = ''v'''), and numeric
    values go unquoted."""
    spy, io = _mk()
    io.compact(None, "z=west", "r")
    call = [q for q in _sqls(spy) if "rewrite_data_files" in q][0]
    assert "where => 'z = ''west'''" in call
    assert "prod.system.rewrite_data_files" in call
    assert "target-file-size-bytes" in call

    spy2, io2 = _mk()
    io2.compact(None, "z=42", "r")
    call2 = [q for q in _sqls(spy2) if "rewrite_data_files" in q][0]
    assert "where => 'z = 42'" in call2


def test_icebergio_expire_and_orphans_procedures():
    spy, io = _mk()
    io.expire_before(777)
    exp = [q for q in _sqls(spy) if "expire_snapshots" in q][0]
    assert "TIMESTAMP '2026-01-02 03:04:05'" in exp

    spy2, io2 = _mk()
    io2.remove_orphans(older_than_s=0)
    orph = [q for q in _sqls(spy2) if "remove_orphan_files" in q][0]
    assert "older_than => TIMESTAMP" in orph


def test_icebergio_reads_and_metadata(spark):
    rows = [_SpyRow(partition="z=0"), _SpyRow(partition="z=1")]
    spy = _SpySpark(
        confs={"spark.sql.catalog.prod": "x"},
        tables={"prod.db.tiles_lineage": _SpyDF([], "lin", rows=rows)})
    io = IcebergIO(spy, "prod.db.tiles")
    assert io.committed_partitions() == {"z=0", "z=1"}
    io.read(where={"cell": (3, 9)})          # → two pushed filters
    assert [e[0] for e in spy.log if e[0] == "filter"].count("filter") == 2
    io.read_partition(None, "z=0")
    assert io.properties() == {"k": "v"}
    io.set_properties({"a": "b"})
    assert any("SET TBLPROPERTIES" in q for q in _sqls(spy))


def test_icebergio_write_partitioned_splits_by_value(spark):
    spy, io = _mk()
    src = _SpyDF(spy.log, "src", rows=[_SpyRow(p="a"), _SpyRow(p="b")])
    pend = io.write_partitioned(src, "p")
    assert [p["partition"] for p in pend] == ["p=a", "p=b"]
