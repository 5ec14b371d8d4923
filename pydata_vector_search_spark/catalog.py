"""Tiny named-table catalog: name -> Parquet path (+ key metadata).

Replaces the reference's Hudi table layer (demo.ipynb c8:15-26: record-keyed
COW table at TABLE_PATH). We keep the two things the demo actually relies on —
(1) a stable name/path for snapshot reads, (2) a record key enabling upsert
semantics — and drop the rest (timeline, meta columns in user SELECTs).

Tables are directories of Parquet files, so at 100 TB a table is simply more
files; reads stay a vectorized columnar scan with predicate pushdown + column
pruning, and optional hive-style partition columns give partition pruning.
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass, field, asdict

from pyspark.sql import DataFrame, SparkSession, Window, functions as F


@dataclass
class TableInfo:
    name: str
    path: str
    key: str | None = None            # record key for upsert (reference: job_id)
    partition_by: list[str] = field(default_factory=list)
    num_buckets: int = 0              # >0: bucketed table (session catalog)
    last_commit: int = 0              # monotonically increasing commit id (1 = bootstrap)
    commit_times: dict = field(default_factory=dict)  # commit id (str) -> epoch seconds
    history_start: int = 1            # earliest replayable commit (expire_commits raises it)
    format: str = "parquet"           # any Spark DataSource (csv/json/orc/text)
    options: dict = field(default_factory=dict)   # reader options (csv header, …)
    has_schema: bool = False          # an explicit schema was given at registration
    indexes: dict = field(default_factory=dict)   # vector_col -> {path, commit}
    aggregates: dict = field(default_factory=dict)  # agg table -> {group_by, sums, count_col, commit}


def overwrite_dir_via_swap(df: DataFrame, path: str,
                           partition_by: list[str] | None = None) -> None:
    """FULL-directory COW rewrite in ONE materialization (r16
    optimization): write ``df`` to a temp sibling directory, then swap
    it into place with same-filesystem renames.

    Replaces the ``localCheckpoint(eager=True)`` + ``mode("overwrite")``
    idiom, which materializes the whole table TWICE (once into executor
    storage, once into parquet) purely so the overwrite does not delete
    the files its own input is still reading. Writing to a sibling
    leaves the current files readable until the write has fully
    committed, so the plan runs exactly once — at 100 TB that is one
    full table write saved per COW commit. Only for FULL rewrites;
    dynamic partition overwrites (which surgically replace a subset of
    partition directories) keep the checkpoint idiom.

    LOCAL-FS ONLY (r17 hardening): relies on same-filesystem atomic
    directory ``os.rename`` — object stores have no rename; deployments
    on S3/GCS must route full rewrites through the checkpoint+overwrite
    idiom instead (``catalog.write`` without ``_swap``). Crash safety:
    the order is (1) write the tmp sibling, (2) rename current → old,
    (3) rename tmp → current, (4) delete old. A crash before (2) leaves
    the table untouched plus a tmp sibling; between (2) and (3) the
    table dir is briefly ABSENT but the complete old sibling remains.
    Sibling names are DOT-PREFIXED (``.<name>.__swap_tmp`` /
    ``.<name>.__swap_old``) so Spark's hidden-path filter ignores any
    residue during partition discovery — a stranded plain-named sibling
    inside a ``commit=``-partitioned changes root would otherwise parse
    as a partition value. ``Catalog`` attach sweeps residue: tmp dirs
    are deleted, an old dir whose target is missing is restored
    (``_sweep_swap_residue``).

    INVARIANT (load-bearing for the hardlinked commit-1 bootstrap,
    ``Catalog.write``): snapshot rewrites must always land NEW part
    files and unlink the old ones — exactly what this swap and the
    checkpoint+overwrite idiom both do — never modify a part file in
    place. ``commit=1`` of a keyed table shares the bootstrap files'
    inodes, so an in-place writer would silently rewrite history."""
    parent, base = os.path.split(path.rstrip("/"))
    tmp = os.path.join(parent, f".{base}.__swap_tmp")
    old = os.path.join(parent, f".{base}.__swap_old")
    shutil.rmtree(tmp, ignore_errors=True)
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(tmp)
    shutil.rmtree(old, ignore_errors=True)
    if os.path.isdir(path):
        os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)


def _sweep_swap_residue(root: str, _depth: int = 0) -> None:
    """Attach-time cleanup of dirs stranded by a crash mid-swap
    (r17 hardening): ``.<name>.__swap_tmp`` is an incomplete write —
    delete; ``.<name>.__swap_old`` whose target is missing means the
    crash hit between the two renames — RESTORE it (it is the complete
    pre-rewrite table); with the target present it is a finished swap's
    leftover — delete. Recurses one level into ``*__changes`` roots
    (commit-dir rewrites swap too). Bounded by the catalog's own entry
    count — no data files are ever opened."""
    try:
        entries = os.listdir(root)
    except OSError:
        return
    for d in entries:
        p = os.path.join(root, d)
        if d.startswith(".") and d.endswith(".__swap_tmp"):
            shutil.rmtree(p, ignore_errors=True)
        elif d.startswith(".") and d.endswith(".__swap_old"):
            target = os.path.join(root, d[1:-len(".__swap_old")])
            if os.path.exists(target):
                shutil.rmtree(p, ignore_errors=True)
            else:
                os.rename(p, target)
        elif (_depth == 0 and d.endswith("__changes")
              and os.path.isdir(p)):
            _sweep_swap_residue(p, 1)


class Catalog:
    """File-backed catalog so sessions can reattach to existing tables."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._meta_path = os.path.join(root, "_catalog.json")
        self._tables: dict[str, TableInfo] = {}
        self._schemas: dict = {}      # session-scoped explicit schemas (not persisted)
        if os.path.exists(self._meta_path):
            with open(self._meta_path) as f:
                for name, info in json.load(f).items():
                    self._tables[name] = TableInfo(**info)
            # only a REATTACH can see residue from a crashed writer; a
            # fresh catalog root has nothing to sweep
            _sweep_swap_residue(root)

    def _persist(self) -> None:
        with open(self._meta_path, "w") as f:
            json.dump({n: asdict(t) for n, t in self._tables.items()}, f, indent=2)

    # -- registration ------------------------------------------------------
    def register_path(self, name: str, path: str, key: str | None = None,
                      format: str = "parquet",
                      schema=None, **options) -> TableInfo:
        """Attach an existing file/dir as a named external table.

        ``format`` may be any Spark DataSource (parquet/csv/json/orc/text).
        Non-parquet sources are for INGEST convenience — at scale, land
        them once into a managed parquet table (``write``) so reads get
        columnar pruning + pushdown; csv/json scans re-parse text every
        query and csv can't push predicates. A provided ``schema`` avoids
        a full inference pass over the files."""
        info = TableInfo(name=name, path=path, key=key, format=format,
                         options=dict(options), has_schema=schema is not None)
        if schema is not None:
            self._schemas[name] = schema
        self._tables[name] = info
        self._persist()
        return info

    def write(self, name: str, df: DataFrame, key: str | None = None,
              mode: str = "overwrite", partition_by: list[str] | None = None,
              reset_history: bool = True, _swap: bool = False) -> TableInfo:
        """Write a managed table (reference S3: mode('overwrite') write, c8:26).

        A fresh write is commit 1 (the bootstrap load) and clears any
        previous change log; maintenance rewrites (compaction) pass
        ``reset_history=False`` to preserve commit history.

        Refuses to overwrite an EXTERNAL (registered path / non-parquet /
        explicit-schema) or BUCKETED registration: rebuilding those as a
        managed parquet table would silently change the table's path,
        format, and bucket metadata out from under readers (upsert and
        compact route through here, so they inherit the guard). Drop or
        re-register the name first."""
        path = os.path.join(self.root, name)
        prior = self._tables.get(name)
        if prior is not None and (
                prior.num_buckets or prior.format != "parquet"
                or prior.options or prior.has_schema or prior.path != path):
            kind = "bucketed" if prior.num_buckets else "external"
            raise ValueError(
                f"table {name!r} is a {kind} registration "
                f"(format={prior.format!r}, path={prior.path!r}); "
                "write/upsert/compact would silently convert it to a "
                "managed parquet table — drop() it or register a new name")
        if _swap and mode == "overwrite":
            # COW rewrite whose input reads this very table (upsert /
            # delete / compact): one write into a temp sibling + rename
            # instead of checkpoint-then-overwrite (see
            # overwrite_dir_via_swap)
            overwrite_dir_via_swap(df, path, partition_by)
        else:
            writer = df.write.mode(mode)
            if partition_by:
                writer = writer.partitionBy(*partition_by)
            writer.parquet(path)
        prev = self._tables.get(name)
        if reset_history:
            shutil.rmtree(self._changes_root(name), ignore_errors=True)
        last = 1 if reset_history or prev is None else prev.last_commit
        # COW rewrites (upsert/compact/delete) keep index registrations —
        # staleness is judged from last_commit, not dropped metadata; a
        # fresh bootstrap (reset_history) is new table content, so prior
        # registrations are cleared.
        idx = {} if reset_history or prev is None else dict(prev.indexes)
        ag = {} if reset_history or prev is None else dict(prev.aggregates)
        ct = {} if reset_history or prev is None else dict(prev.commit_times)
        hs = 1 if reset_history or prev is None else prev.history_start
        info = TableInfo(name=name, path=path, key=key,
                         partition_by=list(partition_by or []),
                         last_commit=last, indexes=idx, aggregates=ag,
                         commit_times=ct, history_start=hs)
        self._tables[name] = info
        self._persist()
        if reset_history and key is not None:
            # Record the bootstrap as commit 1 so the change log is a
            # COMPLETE history and ``read_asof`` can reconstruct any
            # commit by replay. NON-PARTITIONED snapshots are HARDLINKED
            # into the commit=1 log partition (r16 optimization): the
            # files are immutable (every rewrite swaps in new files and
            # unlinks, never mutates), so a link is byte-equivalent to
            # the full columnar copy the old Spark job wrote, at zero
            # I/O and zero extra storage. The linked files lack the
            # ``_deleted`` column; every log reader already treats an
            # absent/NULL ``_deleted`` as false (mergeSchema +
            # coalesce — the pre-``_deleted``-era compatibility path),
            # so replay semantics are identical. Partitioned snapshots
            # keep the Spark-write copy: their partition columns live in
            # DIRECTORY names, and nesting them under commit=1/ would
            # give the log inconsistent partition depths. Keyless
            # tables skip it (no merge identity → no time travel).
            if not partition_by:
                import time as _time
                boot = os.path.join(self._changes_root(name), "commit=1")
                shutil.rmtree(boot, ignore_errors=True)
                os.makedirs(boot)
                for f in os.listdir(path):
                    if f.endswith(".parquet"):
                        try:
                            os.link(os.path.join(path, f),
                                    os.path.join(boot, f))
                        except OSError:       # cross-device: plain copy
                            shutil.copy2(os.path.join(path, f),
                                         os.path.join(boot, f))
                info.commit_times["1"] = _time.time()
                self._persist()
            else:
                self.log_commit(name, self.spark.read.parquet(path),
                                commit=1)
        return info

    def write_bucketed(self, name: str, df: DataFrame, key: str,
                       num_buckets: int = 32,
                       mode: str = "overwrite") -> TableInfo:
        """Bucketed managed table: rows hash-clustered AND sorted by the
        record key at write time. Two tables bucketed the same way join
        with ZERO exchanges (verified in tests) — at 100 TB this is the
        difference between re-shuffling the fact table per join and never
        shuffling it at all. Spark requires the session catalog for bucket
        metadata, so this uses ``saveAsTable`` (warehouse dir), not a bare
        path; reads go through ``spark.table``."""
        (df.write.mode(mode)
           .bucketBy(num_buckets, key).sortBy(key)
           .option("path", os.path.join(self.root, name))
           .saveAsTable(name))
        info = TableInfo(name=name, path=os.path.join(self.root, name),
                         key=key, num_buckets=num_buckets)
        self._tables[name] = info
        self._persist()
        return info

    # -- incremental / CDC (the reference stack's Hudi incremental pull) ----
    def _changes_root(self, name: str) -> str:
        return os.path.join(self.root, f"{name}__changes")

    def log_commit(self, name: str, batch: DataFrame,
                   op: str = "upsert", commit: int | None = None) -> int:
        """Append a change batch to the table's commit log.

        The log is hive-partitioned by commit id (``commit=N/``), so an
        incremental read of commits > N is a PARTITION-PRUNED scan — cost
        proportional to the changed data, never to the table. Called by
        ``upsert_table`` with the upsert batch and by ``delete_where``
        with the removed rows as TOMBSTONES (``_deleted = true`` — the
        CDC convention that lets incremental consumers retract); the
        snapshot itself holds no history (it stays a plain COW parquet
        table).

        An explicit ``commit`` writes that log partition without bumping
        ``last_commit`` — used by ``write`` to record the bootstrap as
        commit 1 (the basis for ``read_asof`` time travel)."""
        import time

        info = self._tables[name]
        bump = commit is None
        commit = info.last_commit + 1 if commit is None else commit
        (batch.withColumn("_deleted", F.lit(op == "delete"))
              .write.mode("overwrite").parquet(
                  os.path.join(self._changes_root(name), f"commit={commit}")))
        # wall-clock instant of the commit (the Hudi-timeline timestamp),
        # enabling read_asof_timestamp; stored as JSON-string keys
        info.commit_times[str(commit)] = time.time()
        if bump:
            info.last_commit = commit
        self._persist()
        return commit

    def current_commit(self, name: str) -> int:
        return self._tables[name].last_commit

    def read_incremental(self, name: str, since_commit: int,
                         latest_only: bool = True) -> DataFrame:
        """Hudi-style incremental pull: rows changed AFTER ``since_commit``.

        ``latest_only`` keeps one row per record key (the latest commit's
        value) when the same key was upserted several times in the range —
        the semantics a downstream incremental consumer wants. The returned
        frame carries a ``commit`` column.

        Commit 1 is the bootstrap load and lives only in the snapshot;
        consumers start from ``since_commit >= 1``."""
        info = self._tables[name]
        if since_commit < 1:
            raise ValueError(
                "commit 1 is the bootstrap load: read it via load(), then "
                "consume incrementally with since_commit >= 1")
        if since_commit < info.history_start and info.history_start > 1:
            raise ValueError(
                f"commits before {info.history_start} were expired "
                f"(expire_commits); an incremental read since "
                f"{since_commit} cannot be served faithfully — re-bootstrap "
                "the consumer from the snapshot")
        croot = self._changes_root(name)
        if since_commit >= info.last_commit or not os.path.isdir(croot):
            empty = (self.load(name)
                     .withColumn("_deleted", F.lit(False))
                     .withColumn("commit", F.lit(0).cast("int")))
            return empty.filter(F.lit(False))
        # mergeSchema: a persisted catalog can mix pre-``_deleted`` commit
        # files with current ones; without it the schema is picked from one
        # footer and the tombstone column can vanish for incremental readers.
        df = (self.spark.read.option("mergeSchema", "true").parquet(croot)
              .filter(F.col("commit") > since_commit))
        if "_deleted" not in df.columns:
            df = df.withColumn("_deleted", F.lit(False))
        else:
            df = df.withColumn("_deleted",
                               F.coalesce(F.col("_deleted"), F.lit(False)))
        if latest_only and info.key:
            w = Window.partitionBy(info.key).orderBy(F.col("commit").desc())
            df = (df.withColumn("__rn", F.row_number().over(w))
                    .filter(F.col("__rn") == 1).drop("__rn"))
        return df

    def read_asof(self, name: str, commit: int) -> DataFrame:
        """Snapshot time travel: the table's state AS OF ``commit``.

        The Hudi-timeline semantics the reference stack configures
        (demo.ipynb c8:20-24): reads against an earlier commit see the
        table as it was then — the reproducible-training-run contract.
        Reconstruction is a replay of the commit log up to ``commit``:
        last-write-wins per key (window on commit desc), minus tombstoned
        keys. Cost ∝ the log through commit N (partition-pruned on the
        hive ``commit=`` dirs), never the live table; asking for the
        current commit short-circuits to the plain snapshot scan.

        Requires a record key and a complete history (tables bootstrapped
        before bootstrap-logging, or written with ``reset_history=False``
        compaction only, can't replay commit 1)."""
        info = self._tables[name]
        if commit < 1:
            raise ValueError("commits start at 1 (the bootstrap load)")
        if commit > info.last_commit:
            raise ValueError(
                f"commit {commit} does not exist for table {name!r} "
                f"(last commit is {info.last_commit}); Hudi/Delta time "
                "travel raises on future instants rather than silently "
                "returning the current snapshot")
        if commit == info.last_commit:
            return self.load(name)
        if info.key is None:
            raise ValueError(
                f"table {name!r} has no record key; time travel requires "
                "keyed last-write-wins history")
        if commit < info.history_start:
            raise ValueError(
                f"commit {commit} of table {name!r} predates the retained "
                f"history (expire_commits collapsed the timeline at "
                f"{info.history_start})")
        boot = os.path.join(self._changes_root(name),
                            f"commit={info.history_start}")
        if not os.path.isdir(boot):
            raise ValueError(
                f"table {name!r} has no base commit in its change "
                "log (created before bootstrap logging, or history was "
                "compacted away); read_asof cannot replay")
        df = (self.spark.read.option("mergeSchema", "true")
              .parquet(self._changes_root(name))
              .filter(F.col("commit") <= commit))
        if "_deleted" not in df.columns:
            df = df.withColumn("_deleted", F.lit(False))
        w = Window.partitionBy(info.key).orderBy(F.col("commit").desc())
        return (df.withColumn("__rn", F.row_number().over(w))
                  .filter(F.col("__rn") == 1)
                  .filter(~F.coalesce(F.col("_deleted"), F.lit(False)))
                  .drop("__rn", "_deleted", "commit"))

    def read_asof_timestamp(self, name: str, ts) -> DataFrame:
        """Time travel by WALL-CLOCK instant (the Hudi timeline is
        timestamp-keyed; commit ids are this catalog's compact spelling):
        resolves the newest commit whose recorded instant is <= ``ts``
        (epoch seconds or datetime) and delegates to ``read_asof``.

        Instants are recorded at commit time in the catalog metadata —
        resolution is a dict lookup, no file listing."""
        from datetime import datetime

        if isinstance(ts, datetime):
            ts = ts.timestamp()
        info = self._tables[name]
        eligible = [int(c) for c, t in info.commit_times.items()
                    if t <= float(ts)]
        if not eligible:
            raise ValueError(
                f"no commit of table {name!r} at or before timestamp {ts} "
                "(first recorded instant is "
                f"{min(info.commit_times.values()) if info.commit_times else 'absent — table predates instant recording'})")
        return self.read_asof(name, max(eligible))

    def expire_commits(self, name: str, upto: int) -> None:
        """Commit-log retention (the lakehouse VACUUM for the timeline):
        collapse commits < ``upto`` into one materialized base — the
        table's full state AS OF ``upto`` written into the ``commit=upto``
        log partition — and delete the older commit directories.

        Afterwards: ``read_asof(c >= upto)`` replays from the collapsed
        base (time travel keeps working for retained history);
        ``read_asof``/``read_incremental`` for commits before ``upto``
        raise explicitly (history expired) instead of silently returning
        wrong reconstructions. Without retention the log grows with every
        commit forever — at 100 TB the timeline itself becomes a table.

        Run it when no CDC tail is mid-stream over the expired range: the
        collapsed base lands as NEW files in ``commit=upto``, which a
        file-source checkpoint that already consumed the original batch
        will deliver again (the standard retention/compaction caveat for
        log consumers)."""
        info = self._tables[name]
        if upto <= info.history_start:
            return
        if upto > info.last_commit:
            raise ValueError(
                f"cannot expire through commit {upto}: table "
                f"{name!r} is at commit {info.last_commit}")
        # swap write (r16): the as-of state READS commit=upto (among
        # others), so the old code checkpointed it before overwriting;
        # writing to a temp sibling + rename keeps the source readable
        # through the single write. Older commit dirs are only deleted
        # after the swap lands.
        croot = self._changes_root(name)
        overwrite_dir_via_swap(
            self.read_asof(name, upto).withColumn("_deleted", F.lit(False)),
            os.path.join(croot, f"commit={upto}"))
        for c in range(info.history_start, upto):
            shutil.rmtree(os.path.join(croot, f"commit={c}"),
                          ignore_errors=True)
        info.history_start = upto
        info.commit_times = {c: t for c, t in info.commit_times.items()
                             if int(c) >= upto}
        self._persist()

    # -- vector indexes (table-scoped, like the reference's Lance index) ---
    def register_index(self, table: str, vector_col: str, path: str,
                       params: dict | None = None) -> None:
        """Record a vector index as TABLE-SCOPED metadata (the reference's
        index is table-scoped too — "Same vector index", demo.ipynb c14:1),
        pinned to the table's CURRENT commit. Any later upsert/delete
        advances ``last_commit`` past the pinned commit, making the index
        detectably STALE — the contract ``Engine.ann_search`` enforces
        (an unsuspecting search against a silently stale index returns
        pre-mutation vectors). ``params`` are the build kwargs, persisted
        so a rebuild reproduces the SAME index geometry (num_centroids,
        metric, …) — a rebuild that silently changed num_centroids would
        break every caller's nprobe assumptions."""
        info = self._tables[table]
        info.indexes[vector_col] = {"path": path,
                                    "commit": info.last_commit,
                                    "params": dict(params or {})}
        self._persist()

    def index_info(self, table: str, vector_col: str | None = None) -> dict | None:
        """The registered index entry (+ its ``vector_col`` and a ``stale``
        flag), or None. ``vector_col=None`` resolves an only index."""
        info = self._tables[table]
        if vector_col is None:
            if len(info.indexes) != 1:
                return None
            vector_col = next(iter(info.indexes))
        entry = info.indexes.get(vector_col)
        if entry is None:
            return None
        return {**entry, "vector_col": vector_col,
                "stale": entry["commit"] < info.last_commit}

    # -- access ------------------------------------------------------------
    def load(self, name: str) -> DataFrame:
        """Snapshot scan (reference S4: spark.read.format('hudi').load, c11:5).
        Bucketed tables load via the session catalog so the bucket spec
        survives into join planning."""
        info = self._tables[name]
        if info.num_buckets:
            return self.spark.table(name)
        reader = self.spark.read.options(**info.options)
        if name in self._schemas:
            reader = reader.schema(self._schemas[name])
        return reader.format(info.format).load(info.path)

    def info(self, name: str) -> TableInfo:
        return self._tables[name]

    def __contains__(self, name: str) -> bool:
        return name in self._tables

    def names(self) -> list[str]:
        return sorted(self._tables)

    def create_view(self, name: str, view_name: str | None = None) -> None:
        """Temp-view registration (reference S5: createOrReplaceTempView, c11:2,5)."""
        self.load(name).createOrReplaceTempView(view_name or name)

    def compact(self, name: str, target_partitions: int | None = None) -> None:
        """Small-files maintenance: rewrite the table at a sane file count
        (streaming upsert sinks and frequent small batches accrete files;
        at scale every extra file is a task + a footer read per query).
        Partitioned tables keep their layout; ``target_partitions``
        defaults to the session's parallelism."""
        info = self._tables[name]
        n = target_partitions or self.spark.sparkContext.defaultParallelism
        df = self.load(name)
        if info.partition_by:
            df = df.repartition(n, *info.partition_by)
        else:
            df = df.repartition(n)
        # swap write (r16): the rewrite reads the files it replaces, so
        # the old code checkpointed the whole table first — one write
        # into a temp sibling + rename does it in a single pass
        self.write(name, df, key=info.key,
                   partition_by=info.partition_by or None,
                   reset_history=False, _swap=True)

    def purge_keys(self, name: str, keys: list, key: str | None = None,
                   max_keys: int = 1_000_000) -> dict:
        """Right-to-be-forgotten: PHYSICALLY remove the given record keys
        from the snapshot, from EVERY retained commit in the change log,
        and from any registered vector index's data files.

        This is the compliance operation ``delete_where`` is not:
        delete_where logs tombstones and keeps prior images replayable
        via ``read_asof`` — exactly what a GDPR erasure request forbids.
        After a purge, historical reads still work but no longer contain
        the purged keys (compliance trumps reproducibility — the same
        trade Delta's VACUUM + DELETE and Hudi's cleaner make), and no
        tombstone row records the purged key's prior image.

        Cost: PARTITIONED snapshots rewrite only the partitions that
        contain a purged key (dynamic partition overwrite, same
        economics as ``merge_into``/``delete_where``; a partition left
        empty has its directory dropped explicitly); unpartitioned
        snapshots pay one full COW. Plus one filtered rewrite per commit
        dir that actually contains a purged key (checked with an early-
        terminating probe), plus a pruned partition rewrite per
        registered index. ``keys`` is a driver-side list by design
        (erasure requests are bounded); ``max_keys`` guards against
        abuse of that assumption.

        NULL-key rows are never purge targets: every keep-filter uses
        ``NOT coalesce(hit, false)`` so SQL three-valued logic cannot
        silently drop them (``~isin`` alone evaluates to NULL on a NULL
        key and would destroy data beyond the request)."""
        from pyspark.sql import functions as F

        info = self._tables[name]
        if info.num_buckets or info.format != "parquet" or info.has_schema:
            raise ValueError(
                f"table {name!r} is a bucketed/external registration; "
                "purge rewrites raw parquet and would break its metadata "
                "— rebuild it as a managed table first")
        key = key or info.key
        if key is None:
            raise ValueError(
                f"table {name!r} has no record key; purge needs one")
        if len(keys) > max_keys:
            raise ValueError(
                f"{len(keys):,} keys exceeds max_keys={max_keys:,}; "
                "split the request or raise the limit explicitly")
        keys = list(keys)
        hit = F.col(key).isin(keys)
        # NULL-safe keep: a NULL key makes `hit` NULL, and `~NULL` is
        # NULL — a plain `filter(~hit)` would drop NULL-key rows from
        # every rewrite. Purge must remove EXACTLY the requested keys.
        keep_cond = ~F.coalesce(hit, F.lit(False))

        snap = self.load(name)
        doomed = snap.filter(hit).localCheckpoint(eager=True)
        n_purged = doomed.count()
        if n_purged and info.partition_by:
            # Rewrite only the partitions holding purged keys (dynamic
            # overwrite); drop directories of partitions left empty.
            from pydata_vector_search_spark.operators.upsert import (
                _emptied_partition_dirs, _partition_pred)
            touched = [tuple(r) for r in
                       doomed.select(*info.partition_by).distinct()
                             .collect()]
            kept = (snap.filter(_partition_pred(info.partition_by,
                                                touched))
                        .filter(keep_cond).localCheckpoint(eager=True))
            survivors = {tuple(r) for r in
                         kept.select(*info.partition_by).distinct()
                             .collect()}
            emptied = [p for p in touched if p not in survivors]
            empty_dirs = _emptied_partition_dirs(snap, info.partition_by,
                                                 emptied)
            (kept.write.mode("overwrite")
                 .option("partitionOverwriteMode", "dynamic")
                 .partitionBy(*info.partition_by).parquet(info.path))
            for d in empty_dirs:
                shutil.rmtree(d, ignore_errors=True)
        elif n_purged:
            # swap write (r16) — one materialization instead of two
            overwrite_dir_via_swap(snap.filter(keep_cond), info.path)

        commits_rewritten = 0
        root = self._changes_root(name)
        if os.path.isdir(root):
            for d in sorted(os.listdir(root)):
                cdir = os.path.join(root, d)
                if not (d.startswith("commit=") and os.path.isdir(cdir)):
                    continue
                cdf = self.spark.read.parquet(cdir)
                if key not in cdf.columns:
                    continue
                if cdf.filter(hit).limit(1).count() == 0:
                    continue
                overwrite_dir_via_swap(cdf.filter(keep_cond), cdir)
                commits_rewritten += 1

        indexes_patched = []
        for vcol, entry in info.indexes.items():
            data_path = os.path.join(entry["path"], "data")
            if not os.path.isdir(data_path):
                continue
            idx = self.spark.read.parquet(data_path)
            if key not in idx.columns:
                continue
            stale = idx.filter(hit)
            touched = [r[0] for r in
                       stale.select("__cid").distinct().collect()]
            if not touched:
                continue
            keep_idx = (idx.filter(F.col("__cid").isin(touched))
                           .filter(keep_cond).localCheckpoint(eager=True))
            (keep_idx.write.mode("overwrite")
                     .option("partitionOverwriteMode", "dynamic")
                     .partitionBy("__cid").parquet(data_path))
            indexes_patched.append(vcol)

        # Materialized aggregates still CONTAIN the purged rows'
        # contributions, and a purge is not a commit — incremental
        # refresh would never retract them. Rebuild each registered
        # rollup from the purged snapshot (rollups are small by
        # definition; correctness beats the one full-aggregate pass).
        aggs_rebuilt = []
        for agg_name, spec in info.aggregates.items():
            from pydata_vector_search_spark.operators.incremental_agg \
                import _aggregate
            rebuilt = _aggregate(self.load(name), spec["group_by"],
                                 spec["sums"], spec["count_col"],
                                 spec.get("mins"), spec.get("maxs"))
            self.write(agg_name, rebuilt)
            spec["commit"] = info.last_commit
            aggs_rebuilt.append(agg_name)
        if aggs_rebuilt:
            self._persist()

        return {"purged": n_purged, "commits_rewritten": commits_rewritten,
                "indexes_patched": indexes_patched,
                "aggregates_rebuilt": aggs_rebuilt}

    def drop(self, name: str, delete_files: bool = True) -> None:
        """Table drop (reference S7: shutil.rmtree(TABLE_PATH), c8:10-11)."""
        info = self._tables.pop(name, None)
        self._persist()
        if info and delete_files and info.path.startswith(self.root):
            shutil.rmtree(info.path, ignore_errors=True)
        if info and delete_files:
            shutil.rmtree(self._changes_root(name), ignore_errors=True)
            for entry in info.indexes.values():
                if entry["path"].startswith(self.root):
                    shutil.rmtree(entry["path"], ignore_errors=True)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver testdata table, normalizing nanosecond timestamps.

    The events table stores ``ts`` as parquet TIMESTAMP(NANOS), which Spark's
    reader rejects by default; we read nanos as long and truncate to
    microseconds with integer division (``DIV`` — double division would lose
    precision above 2^53 ns), matching DuckDB's nanos→micros truncation so
    oracle comparisons agree.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def register_sf_dir(spark: SparkSession, sf_dir: str,
                    tables: tuple[str, ...] = ("region", "nation", "customer",
                                               "supplier", "part", "orders",
                                               "lineitem", "events",
                                               "documents", "embeddings")) -> None:
    """Register the driver's testdata parquet files as temp views."""
    for t in tables:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            read_table(spark, sf_dir, t).createOrReplaceTempView(t)
