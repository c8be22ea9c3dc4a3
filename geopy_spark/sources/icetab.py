"""Iceberg-compatible table emulation over parquet ("icetab") —
SURVEY.md §2.2 G11 / §4.2: snapshot-isolated reads, atomic rename-as-commit
appends, per-partition lineage rows, and resumable checkpoints so a killed
job restarts at the last committed snapshot (north_rule BASELINE.json:14).

No Iceberg runtime jar exists in this sandbox (SURVEY.md §0), so this is a
thin, faithful emulation of the parts the engine depends on, behind a
small API seam — on a real cluster with iceberg-spark-runtime the same
call sites bind to a catalog table instead (documented adapter seam).

Layout:

    <table>/metadata/version-hint.txt   advisory head pointer (see
                                        current_version: forward walk)
    <table>/metadata/v<N>.json          snapshot: manifest path + parent;
                                        claimed EXCLUSIVELY (os.link)
    <table>/manifests/snap-<id>.parquet rows: (partition, file, rows,
                                        stats); unique names, referenced
                                        only from a claimed vN.json
    <table>/data/<partition>/*.parquet  data files (immutable once committed)
    <table>/lineage/snap-<id>.parquet   rows: (run_id, snapshot_id, partition,
                                         rows_out, wall_ms, n_files);
                                         unique names, append-only

Invariants:
* Readers resolve files ONLY through the committed manifest → files written
  by an in-flight (or killed) job are invisible: snapshot isolation.
* Commit = write a uniquely-named manifest (invisible), then CLAIM the
  next vN.json with an exclusive hard link and flip the advisory hint —
  Iceberg's optimistic-concurrency protocol: racing committers never
  clobber each other, the loser retries onto the next version (round 3;
  previously single-writer-by-discipline). A kill at any point leaves
  the previous snapshot intact and at worst an orphan manifest, which
  remove_orphans sweeps.
* Pipelines write each partition in one snapshot delta → resume =
  planned_partitions − committed_partitions. Later snapshots may append
  more files to a partition, or REPLACE its file set entirely
  (``compact`` — recorded as ``replaced_partitions`` in the snapshot so
  readers shadow older deltas; time travel still sees them).
* Maintenance mirrors Iceberg: ``compact`` = rewrite_data_files,
  ``expire_before`` = expire_snapshots (reclaims replaced data files,
  keeps tiny metadata), ``remove_orphans`` = remove_orphan_files
  (killed-writer debris; safe because visibility is manifest-only).
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession

_MANIFEST_SCHEMA = pa.schema([
    ("partition", pa.string()), ("file", pa.string()), ("rows", pa.int64()),
    # per-file column bounds for scan pruning (Iceberg data-file stats
    # parity): JSON {col: [min, max]} or null — added round 3; readers
    # treat a missing/null value as "no stats, keep the file"
    ("stats", pa.string()),
])
_LINEAGE_SCHEMA = pa.schema([
    ("run_id", pa.string()), ("snapshot_id", pa.int64()),
    ("partition", pa.string()), ("rows_out", pa.int64()),
    ("wall_ms", pa.int64()), ("n_files", pa.int64()),
])


class CommitConflict(RuntimeError):
    """A REPLACE commit (compaction) found that a concurrent snapshot
    touched one of the partitions it rewrites since the rewrite's read
    version — publishing would silently shadow the concurrent delta and
    a later expire would physically delete it. Iceberg's RewriteFiles
    validation raises exactly here; callers re-plan the whole rewrite
    from the new head (see :meth:`IceTable.compact`)."""


class IceTable:
    def __init__(self, path: str):
        self.path = path
        self.meta_dir = os.path.join(path, "metadata")
        self.manifest_dir = os.path.join(path, "manifests")
        self.data_dir = os.path.join(path, "data")
        self.lineage_dir = os.path.join(path, "lineage")
        for d in (self.meta_dir, self.manifest_dir, self.data_dir, self.lineage_dir):
            os.makedirs(d, exist_ok=True)

    # ------------------------------------------------------------- metadata
    def properties(self) -> dict:
        """Table-level properties (job parameter fingerprint etc.)."""
        p = os.path.join(self.meta_dir, "properties.json")
        if not os.path.exists(p):
            return {}
        with open(p) as f:
            return json.load(f)

    def set_properties(self, props: dict) -> None:
        _write_text_atomic(os.path.join(self.meta_dir, "properties.json"),
                           json.dumps(props, indent=1))

    def current_version(self) -> int:
        """Latest committed version. The hint file is ADVISORY (Iceberg's
        version-hint semantics): a racing writer may leave it stale or
        even regressed, so walk forward from the hint until the next
        vN.json is missing — snapshots are claimed exclusively and
        sequentially (see commit), so the walk is usually 0 extra stats
        and always self-heals."""
        hint = os.path.join(self.meta_dir, "version-hint.txt")
        v = 0
        if os.path.exists(hint):
            with open(hint) as f:
                v = int(f.read().strip())
        while os.path.exists(os.path.join(self.meta_dir, f"v{v + 1}.json")):
            v += 1
        return v

    def snapshot(self, version: int | None = None) -> dict | None:
        v = self.current_version() if version is None else version
        if v == 0:
            return None
        with open(os.path.join(self.meta_dir, f"v{v}.json")) as f:
            return json.load(f)

    def manifest_rows(self, version: int | None = None) -> list[dict]:
        """Cumulative manifest of the snapshot (follows parent chain).
        A snapshot that REPLACED a partition (compaction) shadows every
        older delta for that partition: its own rows are the partition's
        whole file set and ancestors' rows for it are skipped."""
        rows: list[dict] = []
        replaced: set[str] = set()
        v = self.current_version() if version is None else version
        while v > 0:
            snap = self.snapshot(v)
            t = pq.read_table(os.path.join(self.path, snap["manifest"]))
            rows.extend(r for r in t.to_pylist()
                        if r["partition"] not in replaced)
            replaced |= set(snap.get("replaced_partitions") or [])
            v = snap["parent"]
        return rows

    def committed_partitions(self) -> set[str]:
        return {r["partition"] for r in self.manifest_rows()}

    def partition_rows(self, partition: str,
                       version: int | None = None) -> int:
        """Exact committed row count of a partition from manifest
        metadata alone (write_partition records per-file footer counts)
        — an O(manifest) driver read, zero Spark jobs. The Iceberg
        analogue is summing record_count over a snapshot's data files."""
        return sum(r["rows"] for r in self.manifest_rows(version)
                   if r["partition"] == partition)

    # ----------------------------------------------------------------- read
    def plan_files(self, where: dict | None = None,
                   version: int | None = None) -> tuple[list[str], int]:
        """Resolve the snapshot's file list, pruning files whose recorded
        column bounds cannot intersect ``where`` (Iceberg scan-planning
        parity). ``where`` maps column → (lo, hi); either bound may be
        None for a half-open range. Files without stats for a referenced
        column are kept (conservative). Returns (kept_paths, n_skipped).

        This is FILE pruning only — an I/O plan, not a filter: callers
        still apply the row-level predicate; rows outside ``where`` that
        share a file with matching rows are read as normal. At the
        10^12-row design point this is the difference between touching
        every data file and touching the few whose sort-clustered cell
        range overlaps the query window."""
        kept, skipped = [], 0
        for r in self.manifest_rows(version):
            keep = True
            s = r.get("stats")
            if where and s:
                st = json.loads(s)
                for col, (lo, hi) in where.items():
                    if col in st:
                        mn, mx = st[col]
                        if ((lo is not None and mx < lo)
                                or (hi is not None and mn > hi)):
                            keep = False
                            break
            if keep:
                kept.append(os.path.join(self.path, r["file"]))
            else:
                skipped += 1
        return kept, skipped

    def read(self, spark: SparkSession, where: dict | None = None,
             version: int | None = None,
             merge_schema: bool = False) -> DataFrame:
        """Snapshot-isolated read: only manifest-listed files; with
        ``where``, only files whose stats ranges can match (see
        :meth:`plan_files` — callers still apply the row predicate).
        ``version``: time travel — read the table as of that snapshot
        (valid until :meth:`expire_before` reclaims its files).
        ``merge_schema``: schema-evolution reads (Iceberg add-column
        parity) — union the columns across files written under different
        schemas, nulling the ones a file predates; off by default
        because the footer-merge pass costs one extra metadata read per
        file."""
        reader = spark.read
        if merge_schema:
            reader = reader.option("mergeSchema", "true")
        files, _ = self.plan_files(where, version)
        if not files:
            all_files = [os.path.join(self.path, r["file"])
                         for r in self.manifest_rows(version)]
            if not all_files:
                raise FileNotFoundError(
                    f"icetab {self.path}: no committed snapshot")
            # every file pruned: empty frame with the table schema
            # (footer-only read)
            return reader.parquet(*all_files).limit(0)
        return reader.parquet(*files)

    def read_partition(self, spark: SparkSession, partition: str) -> DataFrame:
        files = [os.path.join(self.path, r["file"])
                 for r in self.manifest_rows() if r["partition"] == partition]
        return spark.read.parquet(*files)

    def lineage(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.lineage_dir)

    # ---------------------------------------------------------------- write
    def write_partition(self, df: DataFrame, partition: str,
                        stats_cols: list[str] | None = None) -> dict:
        """Write one partition's data files (NOT yet visible — becomes
        visible only at the next commit()). Returns manifest delta rows +
        lineage row for this partition. ``stats_cols``: record per-file
        min/max bounds for these columns in the manifest (read from the
        parquet footer — no data pass) so later reads can prune files
        (:meth:`plan_files`); worthwhile when the data is written
        sort-clustered on those columns (e.g. sortWithinPartitions on the
        cell id), which is exactly the Iceberg sort-order + stats story."""
        t0 = time.monotonic()
        staging = os.path.join(self.path, f"_staging-{uuid.uuid4().hex}")
        df.write.mode("overwrite").parquet(staging)
        part_dir = os.path.join(self.data_dir, partition)
        os.makedirs(part_dir, exist_ok=True)
        deltas, rows_out = [], 0
        for fn in sorted(os.listdir(staging)):
            if not fn.endswith(".parquet"):
                continue
            dst = os.path.join(part_dir, f"{uuid.uuid4().hex}.parquet")
            shutil.move(os.path.join(staging, fn), dst)
            nrows = pq.read_metadata(dst).num_rows
            rows_out += nrows
            deltas.append({"partition": partition,
                           "file": os.path.relpath(dst, self.path),
                           "rows": int(nrows),
                           "stats": _file_stats(dst, stats_cols)})
        shutil.rmtree(staging, ignore_errors=True)
        wall_ms = int((time.monotonic() - t0) * 1000)
        lineage = {"partition": partition, "rows_out": int(rows_out),
                   "wall_ms": wall_ms, "n_files": len(deltas)}
        return {"deltas": deltas, "lineage": lineage}

    def write_partitioned(self, df: DataFrame, part_col: str,
                          stats_cols: list[str] | None = None) -> list[dict]:
        """Write MANY partitions in one Spark job (df partitioned by
        ``part_col`` dir layout); returns one write_partition-style pending
        dict per partition value. One shuffle-free write replaces N
        sequential per-partition jobs — the manifest still records files
        per partition, so readers/resume keep partition granularity."""
        from pyspark.sql import functions as F
        t0 = time.monotonic()
        staging = os.path.join(self.path, f"_staging-{uuid.uuid4().hex}")
        # duplicate the partition column: partitionBy moves it into the dir
        # name, but icetab readers resolve plain files — data keeps the col
        df.withColumn("__part", F.col(part_col)) \
            .write.mode("overwrite").partitionBy("__part").parquet(staging)
        pendings = []
        for d0 in sorted(os.listdir(staging)):
            src = os.path.join(staging, d0)
            if not os.path.isdir(src) or not d0.startswith("__part="):
                continue
            d = f"{part_col}=" + d0.split("=", 1)[1]
            part_dir = os.path.join(self.data_dir, d)
            os.makedirs(part_dir, exist_ok=True)
            deltas, rows_out = [], 0
            for fn in sorted(os.listdir(src)):
                if not fn.endswith(".parquet"):
                    continue
                dst = os.path.join(part_dir, f"{uuid.uuid4().hex}.parquet")
                shutil.move(os.path.join(src, fn), dst)
                nrows = pq.read_metadata(dst).num_rows
                rows_out += nrows
                deltas.append({"partition": d,
                               "file": os.path.relpath(dst, self.path),
                               "rows": int(nrows),
                               "stats": _file_stats(dst, stats_cols)})
            pendings.append({"deltas": deltas,
                             "lineage": {"partition": d, "rows_out": int(rows_out),
                                         "wall_ms": int((time.monotonic() - t0) * 1000),
                                         "n_files": len(deltas)}})
        shutil.rmtree(staging, ignore_errors=True)
        return pendings

    def commit(self, pending: list[dict], run_id: str,
               replaced_partitions: list[str] | None = None,
               base_version: int | None = None) -> int:
        """Atomically publish a batch of write_partition results as one new
        snapshot — OPTIMISTIC-CONCURRENCY safe (Iceberg's commit
        protocol): the manifest gets a unique, unreferenced name; the
        snapshot json is claimed with an exclusive hard link, so two
        racing committers can never clobber each other — the loser
        re-reads the head and retries onto the next version. For plain
        appends the retry is just a new parent pointer (disjoint file
        sets compose under any order). A REPLACE commit
        (``replaced_partitions`` set, compaction) is NOT order-free: it
        must pass ``base_version`` — the head it planned its rewrite
        against — and the retry loop validates that no snapshot newer
        than that touched a replaced partition (Iceberg RewriteFiles
        validation); on conflict the pending files + manifest are
        cleaned up and :class:`CommitConflict` is raised so the caller
        re-plans the whole rewrite instead of silently shadowing (and
        later expiring) the concurrent append. Kill-safe at every step:
        nothing is visible until the vN.json claim lands; the hint flips
        last and is advisory (see current_version). Readers of a replace
        snapshot and later skip the replaced partitions' older files;
        older snapshots still see them (time travel)."""
        if replaced_partitions and base_version is None:
            raise ValueError("replace commits must pass base_version "
                             "(the head the rewrite was planned against)")
        deltas = [d for p in pending for d in p["deltas"]]
        man_rel = os.path.join("manifests", f"snap-{uuid.uuid4().hex}.parquet")
        _write_parquet_atomic(
            pa.Table.from_pylist(deltas, schema=_MANIFEST_SCHEMA),
            os.path.join(self.path, man_rel))

        while True:
            v_old = self.current_version()
            if replaced_partitions and v_old > base_version:
                touched = self._partitions_touched(base_version + 1, v_old)
                clash = touched & set(replaced_partitions)
                if clash:
                    # abort: unpublish our never-visible files + manifest
                    for d in deltas:
                        try:
                            os.remove(os.path.join(self.path, d["file"]))
                        except FileNotFoundError:
                            pass
                    try:
                        os.remove(os.path.join(self.path, man_rel))
                    except FileNotFoundError:
                        pass
                    raise CommitConflict(
                        f"snapshot(s) after v{base_version} touched "
                        f"replaced partition(s) {sorted(clash)}; re-plan "
                        f"the rewrite from v{v_old}")
            v_new = v_old + 1
            meta = {"snapshot_id": v_new, "parent": v_old,
                    "manifest": man_rel,
                    "partitions": sorted({d["partition"] for d in deltas}),
                    "run_id": run_id}
            if replaced_partitions:
                meta["replaced_partitions"] = sorted(set(replaced_partitions))
            if _claim_exclusive(os.path.join(self.meta_dir, f"v{v_new}.json"),
                                json.dumps(meta, indent=1)):
                break   # we own version v_new

        # lineage after the claim: a losing attempt must not double-append
        lin_rows = [{**p["lineage"], "run_id": run_id, "snapshot_id": v_new}
                    for p in pending]
        _write_parquet_atomic(
            pa.Table.from_pylist(lin_rows, schema=_LINEAGE_SCHEMA),
            os.path.join(self.lineage_dir, f"snap-{uuid.uuid4().hex}.parquet"))

        # monotonic best-effort hint; any lost race that regresses it is
        # healed by the forward walk in current_version
        hint = os.path.join(self.meta_dir, "version-hint.txt")
        try:
            with open(hint) as f:
                stale = int(f.read().strip())
        except (FileNotFoundError, ValueError):
            stale = 0
        if v_new > stale:
            _write_text_atomic(hint, str(v_new))
        return v_new

    def _partitions_touched(self, v_from: int, v_to: int) -> set[str]:
        """Union of partitions appended-to or replaced by snapshots
        v_from..v_to inclusive — the conflict footprint a replace commit
        must validate against (metadata-only: reads the tiny vN.json
        files, never the manifests)."""
        touched: set[str] = set()
        for v in range(v_from, v_to + 1):
            snap = self.snapshot(v)
            touched |= set(snap.get("partitions") or [])
            touched |= set(snap.get("replaced_partitions") or [])
        return touched

    def append(self, df: DataFrame, partition: str, run_id: str) -> int:
        """Convenience: write one partition and commit it as one snapshot."""
        return self.commit([self.write_partition(df, partition)], run_id)

    # ----------------------------------------------------- maintenance ops
    def compact(self, spark: SparkSession, partition: str, run_id: str,
                stats_cols: list[str] | None = None,
                target_file_bytes: int = 128 << 20,
                max_retries: int = 3) -> int:
        """Bin-pack one partition's files into ~``target_file_bytes``
        files and commit a snapshot that REPLACES the partition's file
        set (Iceberg ``rewrite_data_files`` parity). The 100 TB story:
        incremental per-partition appends accumulate small files whose
        per-file open/footer cost eventually dominates scans; compaction
        restores large sequential reads without touching other
        partitions. Old files stay on disk so time-travel reads of older
        snapshots keep working until :meth:`expire_before` reclaims
        them. With ``stats_cols`` the rewrite re-sorts within output
        files so the recorded min/max bounds stay tight for pruning.

        Concurrency: the whole rewrite is optimistic — the file set is
        planned at the current head, and commit() validates at claim
        time that no newer snapshot touched this partition (otherwise a
        concurrent append would be shadowed and later expired). On
        :class:`CommitConflict` the rewrite RE-PLANS from the new head,
        picking up the racer's files, up to ``max_retries`` times."""
        last_exc: CommitConflict | None = None
        for _ in range(max(1, max_retries)):
            base = self.current_version()
            rows = [r for r in self.manifest_rows(base)
                    if r["partition"] == partition]
            if len(rows) <= 1:
                return self.current_version()  # nothing to bin-pack
            paths = [os.path.join(self.path, r["file"]) for r in rows]
            total = sum(os.path.getsize(p) for p in paths)
            n_out = max(1, -(-total // target_file_bytes))
            df = spark.read.parquet(*paths).coalesce(n_out)
            if stats_cols:
                df = df.sortWithinPartitions(*stats_cols)
            pending = self.write_partition(df, partition, stats_cols)
            try:
                return self.commit([pending], run_id,
                                   replaced_partitions=[partition],
                                   base_version=base)
            except CommitConflict as e:
                last_exc = e              # racer landed: re-plan rewrite
        raise last_exc

    def _snapshot_delta_files(self, version: int) -> set[str]:
        """Raw file list ADDED by one snapshot's own manifest delta."""
        snap = self.snapshot(version)
        t = pq.read_table(os.path.join(self.path, snap["manifest"]),
                          columns=["file"])
        return set(t.column("file").to_pylist())

    def expire_before(self, version: int) -> list[str]:
        """Reclaim data files reachable ONLY from snapshots older than
        ``version`` (Iceberg ``expire_snapshots`` parity) — i.e. files a
        later compaction replaced. Deletes nothing that any snapshot
        >= ``version`` still references, so current reads are untouched;
        time travel to versions < ``version`` may fail afterwards.
        Metadata/manifests are kept (they are tiny and the parent chain
        needs them). Returns the deleted relative paths."""
        cur = self.current_version()
        version = max(1, min(int(version), cur))
        keep: set[str] = set()
        for v in range(version, cur + 1):
            keep |= {r["file"] for r in self.manifest_rows(v)}
        candidates: set[str] = set()
        for v in range(1, cur + 1):
            candidates |= self._snapshot_delta_files(v)
        removed = []
        for rel in sorted(candidates - keep):
            try:
                os.remove(os.path.join(self.path, rel))
                removed.append(rel)
            except FileNotFoundError:
                pass                       # already reclaimed: idempotent
        return removed

    def remove_orphans(self, older_than_s: float = 3 * 86400) -> list[str]:
        """Delete files under data/ referenced by NO snapshot, plus
        leftover ``_staging-*`` dirs (Iceberg ``remove_orphan_files``
        parity) — debris of killed writers whose commit never happened.

        ``older_than_s``: only sweep entries whose mtime is at least this
        old (Iceberg's ``older_than`` threshold, same 3-day default). An
        unreferenced file is invisible to every reader, but it is NOT
        necessarily dead: write_partition moves files into data/ BEFORE
        commit, so an in-flight writer's not-yet-committed files (and its
        live _staging dir) look orphaned for the duration of the write.
        The age horizon is what makes maintenance safe to run while
        writers are active — anything younger than the horizon is
        presumed in-flight and skipped. Pass 0 only when no writer can be
        running. Returns deleted relative paths."""
        now = time.time()

        def _old_enough(p: str) -> bool:
            try:
                return now - os.path.getmtime(p) >= older_than_s
            except OSError:
                return False       # raced with its writer: clearly live

        ref: set[str] = set()
        man_ref: set[str] = set()
        for v in range(1, self.current_version() + 1):
            ref |= self._snapshot_delta_files(v)
            man_ref.add(self.snapshot(v)["manifest"])
        removed: list[str] = []
        for entry in os.listdir(self.path):
            full = os.path.join(self.path, entry)
            if entry.startswith("_staging-") and _old_enough(full):
                shutil.rmtree(full, ignore_errors=True)
                removed.append(entry)
        for dirpath, _dirs, files in os.walk(self.data_dir):
            for fn in files:
                full = os.path.join(dirpath, fn)
                rel = os.path.relpath(full, self.path)
                if rel not in ref and _old_enough(full):
                    os.remove(full)
                    removed.append(rel)
        # manifests written by commit attempts that never claimed a
        # version (kill between manifest write and claim) are orphans too
        for fn in os.listdir(self.manifest_dir):
            rel = os.path.join("manifests", fn)
            full = os.path.join(self.manifest_dir, fn)
            if (fn.endswith(".parquet") and rel not in man_ref
                    and _old_enough(full)):
                os.remove(full)
                removed.append(rel)
        return sorted(removed)


def _file_stats(path: str, cols: list[str] | None) -> str | None:
    """Per-file [min, max] bounds for ``cols`` as a JSON string, read
    from the parquet footer row-group statistics — metadata only, never a
    data pass. A column is dropped (conservatively, no pruning on it) if
    any row group lacks min/max or the bounds are not plain
    int/float/str (binary payloads, nested types)."""
    if not cols:
        return None
    md = pq.read_metadata(path)
    mins: dict[str, object] = {}
    maxs: dict[str, object] = {}
    bad: set[str] = set()
    want = set(cols)
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            c = g.column(ci)
            name = c.path_in_schema
            if name not in want or name in bad:
                continue
            st = c.statistics
            if (st is None or not st.has_min_max
                    or not isinstance(st.min, (int, float, str))
                    or not isinstance(st.max, (int, float, str))):
                bad.add(name)
                mins.pop(name, None)
                maxs.pop(name, None)
                continue
            mins[name] = st.min if name not in mins else min(mins[name], st.min)
            maxs[name] = st.max if name not in maxs else max(maxs[name], st.max)
    if not mins:
        return None
    return json.dumps({k: [mins[k], maxs[k]] for k in mins})


def _fsync_dir(path: str) -> None:
    """Durably record the rename itself: without a directory fsync the
    new name can vanish on power loss even though the data blocks made it
    (kill-safety alone never needed this; crash-safety does)."""
    fd = os.open(os.path.dirname(os.path.abspath(path)), os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)


def _claim_exclusive(path: str, content: str) -> bool:
    """Atomically create ``path`` with ``content`` IFF it does not exist
    (os.link fails with EEXIST — the POSIX exclusive-claim primitive),
    fsynced before the claim so a winner's snapshot is durable. Returns
    False when another writer owns the path."""
    tmp = path + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        f.write(content)
        f.flush()
        os.fsync(f.fileno())
    try:
        os.link(tmp, path)
        _fsync_dir(path)
        return True
    except FileExistsError:
        return False
    finally:
        os.remove(tmp)


def _write_text_atomic(path: str, content: str) -> None:
    tmp = path + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        f.write(content)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, path)
    _fsync_dir(path)


def _write_parquet_atomic(table: pa.Table, path: str) -> None:
    tmp = path + f".tmp-{uuid.uuid4().hex}"
    pq.write_table(table, tmp)
    # fsync the file contents before the rename publishes the name — a
    # crash after rename but before writeback must not leave a truncated
    # manifest behind the committed name (ADVICE r1)
    fd = os.open(tmp, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)
    os.rename(tmp, path)
    _fsync_dir(path)
