"""TableIO — the table-format adapter seam (SURVEY.md §4.2, VERDICT r2 #6).

The engine's jobs (EP-3 tile pipeline, EP-4 corpus pipeline) talk to
tables ONLY through this interface:

* ``ParquetSnapshotIO`` — the sandbox implementation: the icetab
  emulation (snapshot-isolated parquet + manifests + atomic
  rename-as-commit; sources/icetab.py).
* ``IcebergIO`` — the real-cluster implementation: binds the same
  operations to an Iceberg catalog table through the public Spark SQL
  surface (``spark.table``, ``df.writeTo(...).append()``, and the
  ``<table>.partitions`` / ``<table>.snapshots`` metadata tables). It is
  fully written but env-blocked here: this sandbox has no
  ``iceberg-spark-runtime`` jar, so the constructor probes the catalog
  and raises a clear error instead of failing deep inside a job.

The swap is one call: ``open_table("<dir>")`` vs
``open_table("cat.db.t", spark)`` — plus the usual Iceberg session confs
(``spark.sql.catalog.<cat>=org.apache.iceberg.spark.SparkCatalog`` etc.)
on a cluster that has the runtime jar.

Contract notes:
* ``write_partition`` returns an opaque *pending* token; nothing is
  visible until ``commit`` publishes the batch atomically. For
  ParquetSnapshotIO the token carries already-staged files; for
  IcebergIO it carries the partition DataFrames and ``commit`` performs
  ONE ``append`` (one Iceberg snapshot) of their union — same
  all-or-nothing semantics.
* ``committed_partitions`` + table properties give the resume
  protocol: planned − committed, guarded by a parameter fingerprint.
"""

from __future__ import annotations

import abc
import time

from pyspark.sql import DataFrame, SparkSession

from .icetab import IceTable


class TableIO(abc.ABC):
    """Operations the engine's pipelines need from a table format."""

    @abc.abstractmethod
    def read(self, spark: SparkSession) -> DataFrame: ...

    @abc.abstractmethod
    def read_partition(self, spark: SparkSession, partition: str) -> DataFrame: ...

    @abc.abstractmethod
    def lineage(self, spark: SparkSession) -> DataFrame: ...

    @abc.abstractmethod
    def committed_partitions(self) -> set[str]: ...

    @abc.abstractmethod
    def properties(self) -> dict: ...

    @abc.abstractmethod
    def set_properties(self, props: dict) -> None: ...

    @abc.abstractmethod
    def write_partition(self, df: DataFrame, partition: str): ...

    @abc.abstractmethod
    def write_partitioned(self, df: DataFrame, part_col: str) -> list: ...

    @abc.abstractmethod
    def commit(self, pending: list, run_id: str) -> int: ...

    def append(self, df: DataFrame, partition: str, run_id: str) -> int:
        """Write one partition and commit it as one snapshot."""
        return self.commit([self.write_partition(df, partition)], run_id)

    # Maintenance (optional — implementations map to their format's
    # native procedures; ParquetSnapshotIO inherits real ones from
    # IceTable: compact / expire_before / remove_orphans).


class ParquetSnapshotIO(IceTable, TableIO):
    """The icetab emulation behind the seam (inherits the full
    implementation; IceTable remains importable for existing tests)."""


class IcebergIO(TableIO):
    """Real Iceberg catalog binding via the public Spark SQL surface.

    partition strings use the icetab convention "<col>=<value>".
    Lineage rows go to a sibling ``<identifier>_lineage`` table (Iceberg
    snapshot summaries hold engine metadata; per-partition metrics rows
    are the engine's own schema, so they live in a normal table).
    """

    def __init__(self, spark: SparkSession, identifier: str):
        self.spark = spark
        self.identifier = identifier
        cat = identifier.split(".", 1)[0]
        conf = spark.conf.get(f"spark.sql.catalog.{cat}", None)
        if conf is None:
            raise RuntimeError(
                f"IcebergIO: no catalog conf 'spark.sql.catalog.{cat}' on "
                f"this session — configure iceberg-spark-runtime "
                f"(SparkCatalog) on the cluster; in this sandbox use "
                f"ParquetSnapshotIO / open_table(<dir>)")

    # ------------------------------------------------------------------ read
    def read(self, spark: SparkSession | None = None,
             where: dict | None = None) -> DataFrame:
        df = (spark or self.spark).table(self.identifier)
        if where:
            # expressed as a row filter: Iceberg's scan planning turns
            # the pushed-down range predicate into the same file-level
            # min/max pruning icetab does manually (plan_files)
            from pyspark.sql import functions as F
            for col, (lo, hi) in where.items():
                if lo is not None:
                    df = df.filter(F.col(col) >= lo)
                if hi is not None:
                    df = df.filter(F.col(col) <= hi)
        return df

    def read_partition(self, spark: SparkSession | None, partition: str) -> DataFrame:
        col, val = partition.split("=", 1)
        from pyspark.sql import functions as F
        return self.read(spark).filter(F.col(col).cast("string") == val)

    def lineage(self, spark: SparkSession | None = None) -> DataFrame:
        return (spark or self.spark).table(f"{self.identifier}_lineage")

    def committed_partitions(self) -> set[str]:
        lin = self.spark.table(f"{self.identifier}_lineage")
        return {r.partition for r in lin.select("partition").distinct().collect()}

    # ------------------------------------------------------------- metadata
    def properties(self) -> dict:
        rows = self.spark.sql(
            f"SHOW TBLPROPERTIES {self.identifier}").collect()
        return {r.key: r.value for r in rows}

    def set_properties(self, props: dict) -> None:
        kv = ", ".join(f"'{k}'='{v}'" for k, v in props.items())
        self.spark.sql(
            f"ALTER TABLE {self.identifier} SET TBLPROPERTIES ({kv})")

    # ----------------------------------------------------------------- write
    def write_partition(self, df: DataFrame, partition: str,
                        stats_cols: list | None = None):
        # nothing is written yet: the pending token defers to commit(),
        # which publishes the whole batch as ONE Iceberg snapshot.
        # stats_cols is accepted for seam parity and ignored: Iceberg
        # writers collect per-data-file column bounds natively and its
        # scan planning prunes on them without engine help.
        return {"df": df, "partition": partition, "t0": time.monotonic()}

    def write_partitioned(self, df: DataFrame, part_col: str,
                          stats_cols: list | None = None) -> list:
        parts = [r[0] for r in df.select(part_col).distinct().collect()]
        from pyspark.sql import functions as F
        return [{"df": df.filter(F.col(part_col) == p),
                 "partition": f"{part_col}={p}", "t0": time.monotonic()}
                for p in parts]

    def commit(self, pending: list, run_id: str) -> int:
        from functools import reduce
        union = reduce(lambda a, b: a.unionByName(b),
                       [p["df"] for p in pending])
        union.writeTo(self.identifier).append()  # one atomic snapshot
        snap = self.spark.sql(
            f"SELECT snapshot_id FROM {self.identifier}.snapshots "
            f"ORDER BY committed_at DESC LIMIT 1").first()[0]
        lin_rows = []
        for p in pending:
            n = p["df"].count()
            lin_rows.append((run_id, int(snap), p["partition"], int(n),
                             int((time.monotonic() - p["t0"]) * 1000), 1))
        lin = self.spark.createDataFrame(
            lin_rows, "run_id string, snapshot_id long, partition string, "
                      "rows_out long, wall_ms long, n_files long")
        lin.writeTo(f"{self.identifier}_lineage").createOrReplace() \
            if not self.spark.catalog.tableExists(f"{self.identifier}_lineage") \
            else lin.writeTo(f"{self.identifier}_lineage").append()
        return int(snap)

    # ------------------------------------------------------- maintenance
    def compact(self, spark: SparkSession | None, partition: str,
                run_id: str, stats_cols: list | None = None,
                target_file_bytes: int = 128 << 20) -> int:
        """Iceberg's own bin-pack rewrite, scoped to one partition."""
        col, val = partition.split("=", 1)
        cat = self.identifier.split(".", 1)[0]
        # the where argument is itself a single-quoted SQL string, so a
        # string-typed partition value needs its quotes DOUBLED inside it
        # (where => 'z = ''v''') — Python repr would nest bare quotes and
        # fail to parse (ADVICE r3). Bare numerics go through unquoted so
        # int/long partition columns compare natively.
        if _is_sql_numeric(val):
            pred = f"{col} = {val}"
        else:
            pred = f"{col} = ''" + val.replace("'", "''''") + "''"
        self.spark.sql(
            f"CALL {cat}.system.rewrite_data_files(table => "
            f"'{self.identifier}', where => '{pred}', options => "
            f"map('target-file-size-bytes', '{target_file_bytes}'))")
        return int(self.spark.sql(
            f"SELECT snapshot_id FROM {self.identifier}.snapshots "
            f"ORDER BY committed_at DESC LIMIT 1").first()[0])

    def expire_before(self, snapshot_id: int) -> list:
        cat = self.identifier.split(".", 1)[0]
        ts = self.spark.sql(
            f"SELECT committed_at FROM {self.identifier}.snapshots "
            f"WHERE snapshot_id = {int(snapshot_id)}").first()[0]
        self.spark.sql(
            f"CALL {cat}.system.expire_snapshots(table => "
            f"'{self.identifier}', older_than => TIMESTAMP '{ts}')")
        return []  # Iceberg reports counts, not paths

    def remove_orphans(self, older_than_s: float = 3 * 86400) -> list:
        # Iceberg's procedure already defaults older_than to 3 days; pass
        # the horizon explicitly so both implementations honor the same
        # writer-safety contract (see IceTable.remove_orphans docstring)
        cat = self.identifier.split(".", 1)[0]
        ts = time.time() - older_than_s
        self.spark.sql(
            f"CALL {cat}.system.remove_orphan_files(table => "
            f"'{self.identifier}', older_than => "
            f"TIMESTAMP '{time.strftime('%Y-%m-%d %H:%M:%S', time.gmtime(ts))}')")
        return []


def _is_sql_numeric(val: str) -> bool:
    """True when ``val`` can be embedded unquoted in a SQL predicate
    (plain int/float literal — NOT nan/inf, which float() accepts but
    SQL does not)."""
    import re
    return bool(re.fullmatch(r"[+-]?\d+(\.\d+)?", val))


def open_table(spec: str, spark: SparkSession | None = None) -> TableIO:
    """The one-call swap: a filesystem path → ParquetSnapshotIO (icetab
    emulation); a dotted catalog identifier → IcebergIO (real cluster)."""
    import os
    if os.path.sep in spec or spec.startswith("."):
        return ParquetSnapshotIO(spec)
    if "." in spec and spark is not None:
        return IcebergIO(spark, spec)
    return ParquetSnapshotIO(spec)
