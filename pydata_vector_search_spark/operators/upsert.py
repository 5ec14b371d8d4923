"""Keyed upsert (last-write-wins) — the reference's Hudi COW semantics.

Reference: record key = job_id, write op = upsert, DefaultSparkRecordMerger
(demo.ipynb c8:17-23, raw L518-524): a second write with the same key replaces
the row. Re-expressed relationally: union old+new with a monotonically
increasing commit timestamp, keep row_number()=1 per key ordered by commit
desc, rewrite (copy-on-write).

Scale note: v0 rewrites the whole table (fine for fixtures; matches COW on a
non-partitioned table, which is exactly what the reference configures —
NonpartitionedKeyGenerator, c8:18-19). At 100 TB the table must be
partitioned; then the anti-join prunes to only the partitions containing
updated keys and only those are rewritten (classic COW). ``upsert`` takes
``partition_by`` to enable that layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

META_TS = "_commit_ts"


def merge_last_write_wins(old: DataFrame, new: DataFrame, key: str,
                          ts_col: str = META_TS) -> DataFrame:
    """Pure-plan merge: rows from ``new`` replace same-key rows in ``old``.

    Implemented as union + window dedup so it composes with any plan. The
    window shuffles by key once — at scale the union inherits the scan
    partitioning and AQE handles skewed keys.
    """
    old_t = old.withColumn(ts_col, F.lit(0)) if ts_col not in old.columns else old
    new_t = new.withColumn(ts_col, F.lit(1)) if ts_col not in new.columns else new
    u = old_t.unionByName(new_t, allowMissingColumns=True)
    w = Window.partitionBy(key).orderBy(F.col(ts_col).desc())
    return (u.withColumn("__rn", F.row_number().over(w))
             .filter(F.col("__rn") == 1)
             .drop("__rn", ts_col))


def upsert_table(catalog, name: str, new: DataFrame, key: str | None = None) -> None:
    """COW upsert into a catalog table.

    Non-partitioned: read snapshot → merge → full rewrite (exactly the
    reference's NonpartitionedKeyGenerator COW behavior, c8:18-19).

    Partitioned: classic partition-scoped COW — only the partitions the
    new batch touches are read (partition pruning), merged, and replaced
    (dynamic partition overwrite); untouched partitions' files are never
    opened or rewritten. At 100 TB this is the difference between a
    full-table rewrite per batch and work proportional to the batch."""
    import operator
    from functools import reduce

    info = catalog.info(name)
    key = key or info.key
    if key is None:
        raise ValueError(f"table {name!r} has no record key; register with key=")
    old = catalog.load(name)

    if info.partition_by:
        touched = [tuple(r) for r in
                   new.select(*info.partition_by).distinct().collect()]
        if not touched:           # empty batch: nothing to rewrite, no commit
            return
        # Append the batch to the commit log FIRST (while any inputs it
        # derives from are still readable), enabling incremental pulls
        # (catalog.read_incremental) — the Hudi incremental-query semantics
        # of the reference stack. A failed rewrite leaves an orphan log
        # commit; the snapshot stays consistent either way.
        catalog.log_commit(name, new)
        pred = reduce(operator.or_, [
            reduce(operator.and_,
                   [F.col(c).eqNullSafe(F.lit(v))
                    for c, v in zip(info.partition_by, p)])
            for p in touched])
        merged = merge_last_write_wins(old.filter(pred), new, key)
        (merged.localCheckpoint(eager=True)
               .write.mode("overwrite")
               .option("partitionOverwriteMode", "dynamic")
               .partitionBy(*info.partition_by)
               .parquet(info.path))
        return

    # Log the batch before the snapshot rewrite (see note above).
    catalog.log_commit(name, new)
    merged = merge_last_write_wins(old, new, key)
    # Materialize before overwrite (can't overwrite a path while reading it).
    tmp = merged.localCheckpoint(eager=True) if merged.isStreaming is False else merged
    catalog.write(name, tmp, key=key, mode="overwrite",
                  partition_by=info.partition_by or None, reset_history=False)


def delete_where(catalog, name: str, predicate) -> int:
    """Keyed delete — the OTHER Hudi write operation ('delete'): rows
    matching ``predicate`` are removed by COW rewrite, and the removed
    rows are logged to the commit log as tombstones (``_deleted=true``)
    so incremental consumers can retract them downstream.

    Partitioned tables rewrite only the partitions containing matches
    (dynamic partition overwrite) — work proportional to affected data,
    the same economics as the partition-scoped upsert. A touched partition
    left with ZERO surviving rows contributes nothing to the dynamic
    overwrite, so its directory is dropped explicitly (located via the
    doomed rows' ``input_file_name`` — ground truth, no path-escaping
    guesswork). Returns the number of rows deleted; a no-match delete
    writes nothing and logs nothing.

    SQL DELETE semantics: only rows where the predicate is TRUE are
    deleted; rows where it evaluates to NULL are retained (``kept``
    filters on ``NOT coalesce(pred, false)``, not ``NOT pred``)."""
    import operator
    import os
    import shutil
    from functools import reduce
    from urllib.parse import unquote, urlparse

    info = catalog.info(name)
    old = catalog.load(name)
    cond = F.expr(predicate) if isinstance(predicate, str) else predicate
    doomed = old.filter(cond).localCheckpoint(eager=True)
    n = doomed.count()
    if n == 0:
        return 0
    catalog.log_commit(name, doomed, op="delete")
    # NULL-predicate rows are neither doomed nor dropped: keep = NOT TRUE.
    keep_cond = ~F.coalesce(cond, F.lit(False))

    if info.partition_by:
        touched = [tuple(r) for r in
                   doomed.select(*info.partition_by).distinct().collect()]
        pred = reduce(operator.or_, [
            reduce(operator.and_,
                   [F.col(c).eqNullSafe(F.lit(v))
                    for c, v in zip(info.partition_by, p)])
            for p in touched])
        kept = (old.filter(pred).filter(keep_cond)
                   .localCheckpoint(eager=True))
        survivors = {tuple(r) for r in
                     kept.select(*info.partition_by).distinct().collect()}
        emptied = [p for p in touched if p not in survivors]
        empty_dirs: set[str] = set()
        if emptied:
            # Resolve the emptied partitions' directories BEFORE the
            # rewrite, from the actual files (dynamic overwrite would
            # otherwise never touch a partition with no surviving rows
            # and the deleted rows would survive on disk).
            empty_pred = reduce(operator.or_, [
                reduce(operator.and_,
                       [F.col(c).eqNullSafe(F.lit(v))
                        for c, v in zip(info.partition_by, p)])
                for p in emptied])
            files = [r[0] for r in old.filter(empty_pred)
                     .select(F.input_file_name()).distinct().collect()]
            empty_dirs = {os.path.dirname(unquote(urlparse(f).path))
                          for f in files}
        (kept.write.mode("overwrite")
             .option("partitionOverwriteMode", "dynamic")
             .partitionBy(*info.partition_by)
             .parquet(info.path))
        for d in empty_dirs:
            shutil.rmtree(d, ignore_errors=True)
        return n

    kept = old.filter(keep_cond).localCheckpoint(eager=True)
    catalog.write(name, kept, key=info.key, mode="overwrite",
                  reset_history=False)
    return n
