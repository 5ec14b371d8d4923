"""Structured Streaming extension (SURVEY.md §2.9 / §7 M6).

The reference is batch-only (README.md:9-21 describes only batch patterns;
no readStream anywhere) — this module is the capability extension the survey
scopes for the driver's ``events`` table: file-source stream → watermark →
tumbling / sliding / session windows → (a) sink to memory/console, or
(b) ``foreachBatch`` keyed upsert into a catalog table, closing the loop
with the batch upsert operator (U1).

Design notes for scale:

* The file source is Spark's production pattern for replayable ingest; each
  micro-batch lists new files only. Windowed aggregations keep per-window
  partial state in the state store, partitioned by group key — state size
  is windows × keys, independent of events scanned.
* ``withWatermark`` bounds that state: windows older than the watermark are
  finalized and evicted, late rows beyond it are dropped — without it an
  append-mode aggregation would hold every window forever (unbounded state
  = the classic 100 TB streaming failure). Note Spark's (3.4+) split
  watermarks: late-record FILTERING uses the previous batch's watermark
  while EVICTION uses the current one, so a too-late row is only
  guaranteed-dropped from the second batch after the watermark advanced
  (pinned in tests/test_streaming_watermark.py).
* The stateful running-total operator uses ``applyInPandasWithState``
  (Arrow-batched per-key state) — the escape hatch for semantics windows
  can't express.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (DoubleType, LongType, StringType, StructField,
                               StructType, TimestampType)

# Streaming file sources require an explicit schema (no inference at plan
# time). ``ts`` is TIMESTAMP(MICROS) in current fixtures but earlier
# generations used TIMESTAMP(NANOS), which Spark's reader only accepts as
# long (see catalog.read_table); the reader sniffs one footer and picks the
# right schema + conversion.
def _events_schema(ts_type) -> StructType:
    return StructType([
        StructField("event_id", LongType()),
        StructField("ts", ts_type),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ])


def read_events_stream(spark: SparkSession, path: str,
                       max_files_per_trigger: int | None = None) -> DataFrame:
    """``readStream`` over the events parquet (file or directory).

    Returns the same shape as ``catalog.read_table(..., "events")`` so every
    batch transformation applies unchanged to the stream.

    The file source monitors a DIRECTORY for new files (that's the
    replayable-ingest contract); a single-file path (the sf fixtures) is
    adapted via a symlink dir."""
    import glob
    import os
    import tempfile

    if os.path.isfile(path):
        d = tempfile.mkdtemp(prefix="pvss_stream_src_")
        os.symlink(os.path.abspath(path),
                   os.path.join(d, os.path.basename(path)))
        path = d

    # Sniff one footer (driver-side, O(1)) for the physical ts unit.
    # Micros are read under an explicit TimestampType schema: watermarks
    # REQUIRE "TIMESTAMP" (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE on NTZ), and
    # declaring TZ makes Spark treat the raw NTZ micros as UTC instants —
    # exactly DuckDB's epoch() reading, so emitted epochs are independent of
    # the driver session's timezone. Nanos must be read as long (Spark
    # rejects TIMESTAMP(NANOS)) and truncated to micros like the batch path.
    ts_is_nanos = False
    sample = sorted(glob.glob(os.path.join(path, "**", "*.parquet"),
                              recursive=True))
    if sample:
        try:
            import pyarrow.parquet as pq
            import pyarrow.types as pat
            t = pq.read_schema(sample[0]).field("ts").type
            ts_is_nanos = pat.is_timestamp(t) and t.unit == "ns"
        except Exception:
            pass

    if ts_is_nanos:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        reader = spark.readStream.schema(_events_schema(LongType()))
    else:
        reader = spark.readStream.schema(_events_schema(TimestampType()))
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(path)
    if ts_is_nanos:
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def tumbling_window_agg(events: DataFrame, window: str = "1 day",
                        watermark: str = "1 day") -> DataFrame:
    """Per (tumbling window, event_type): count + sum(value). Late rows
    beyond the watermark are dropped; closed windows are evicted."""
    return (events.withWatermark("ts", watermark)
            .groupBy(F.window("ts", window).alias("win"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value"), 2).alias("sum_value"))
            .select(F.col("win.start").alias("win_start"),
                    F.col("win.end").alias("win_end"),
                    "event_type", "n_events", "sum_value"))


def sliding_window_agg(events: DataFrame, window: str = "1 day",
                       slide: str = "6 hours",
                       watermark: str = "1 day") -> DataFrame:
    """Overlapping windows: each event lands in window/slide buckets."""
    return (events.withWatermark("ts", watermark)
            .groupBy(F.window("ts", window, slide).alias("win"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(F.col("win.start").alias("win_start"),
                    F.col("win.end").alias("win_end"),
                    "event_type", "n_events"))


def session_window_agg(events: DataFrame, gap: str = "30 minutes",
                       watermark: str = "1 day") -> DataFrame:
    """Per-user sessions: a session extends while consecutive events are
    within ``gap``. State is one open session per user, merged on overlap."""
    return (events.withWatermark("ts", watermark)
            .groupBy(F.session_window("ts", gap).alias("sess"), "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value"), 2).alias("sum_value"))
            .select(F.col("sess.start").alias("sess_start"),
                    F.col("sess.end").alias("sess_end"),
                    "user_id", "n_events", "sum_value"))


_STATE_SCHEMA = StructType([StructField("total", DoubleType()),
                            StructField("n", LongType())])
_RUNNING_OUT = StructType([
    StructField("event_type", StringType()),
    StructField("n_events", LongType()),
    StructField("total_value", DoubleType()),
])


def dedup_stream(events: DataFrame, keys: list[str],
                 watermark: str | None = "1 day",
                 within_watermark: bool = False) -> DataFrame:
    """Streaming exact dedup: emit the first row seen per key combination.

    ``within_watermark=False`` (default) is GLOBAL dedup — state holds one
    entry per distinct key forever, so the emitted key SET is exactly the
    batch-distinct keys (deterministic however the input is micro-batched);
    the cost is state proportional to distinct keys, the right trade when
    keys are bounded (user × event_type) or the stream is a backfill.

    ``within_watermark=True`` switches to ``dropDuplicatesWithinWatermark``:
    state for keys older than the watermark is EVICTED, bounding state for
    unbounded key domains (event ids at 100 TB/day) — the trade is that a
    key recurring after eviction is re-emitted, so results depend on event
    spread, not an exact global distinct."""
    w = events.withWatermark("ts", watermark) if watermark else events
    if within_watermark:
        return w.dropDuplicatesWithinWatermark(keys)
    return w.dropDuplicates(keys)


def running_totals_stateful(events: DataFrame,
                            timeout_duration: str = "30 minutes") -> DataFrame:
    """Custom stateful operator: running (count, sum(value)) per event_type
    via ``applyInPandasWithState`` — per-key Arrow-batched state the window
    operators can't express (a total over the whole stream, emitted every
    micro-batch)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        total, n = state.get if state.exists else (0.0, 0)
        for pdf in pdfs:
            total += float(pdf["value"].sum())
            n += int(len(pdf))
        state.update((total, n))
        import pandas as pd
        yield pd.DataFrame({"event_type": [key[0]], "n_events": [n],
                            "total_value": [round(total, 2)]})

    return (events.groupBy("event_type")
            .applyInPandasWithState(update, _RUNNING_OUT, _STATE_SCHEMA,
                                    "update",
                                    GroupStateTimeout.NoTimeout))


def stream_stream_join(left: DataFrame, right: DataFrame, on: str,
                       left_ts: str = "ts", right_ts: str = "ts",
                       within: str = "30 minutes",
                       watermark: str | None = "1 day") -> DataFrame:
    """Stream-stream INNER join: rows of ``right`` that follow a ``left``
    row with the same ``on`` key within ``within`` (the canonical
    click→purchase attribution shape).

    The time-range predicate (r.ts in [l.ts, l.ts + within]) plus BOTH
    watermarks is what makes the state bounded: each side buffers only
    rows newer than (watermark − within); without them an inner
    stream-stream join must keep every row forever. ``watermark=None``
    opts into exactly that unbounded-state mode — the trade is
    determinism however the input is micro-batched (no row can be
    evicted before its match arrives), the same knob/contract as
    ``dedup_stream``: bounded state for production tails, exact results
    for replayable backfills.

    Columns are prefixed ``l_``/``r_`` (a self-join of one source stream
    would otherwise collide)."""
    l = left.select(F.col(on).alias("__k"),
                    *[F.col(c).alias(f"l_{c}") for c in left.columns
                      if c != on])
    r = right.select(F.col(on).alias("__rk"),
                     *[F.col(c).alias(f"r_{c}") for c in right.columns
                       if c != on])
    if watermark is not None:
        l = l.withWatermark(f"l_{left_ts}", watermark)
        r = r.withWatermark(f"r_{right_ts}", watermark)
    cond = ((F.col("__k") == F.col("__rk"))
            & (F.col(f"r_{right_ts}") >= F.col(f"l_{left_ts}"))
            & (F.col(f"r_{right_ts}")
               <= F.col(f"l_{left_ts}") + F.expr(f"INTERVAL {within}")))
    return (l.join(r, cond, "inner")
             .withColumnRenamed("__k", on).drop("__rk"))


def read_changes_stream(spark: SparkSession, catalog, table: str) -> DataFrame:
    """Streaming CDC tail-follow of a table's commit log (the streaming
    SOURCE counterpart of ``stream_upsert_sink``).

    Every upsert commit lands as new files under ``commit=N/`` in the
    table's change log (catalog.log_commit); Spark's file stream source
    lists only UNSEEN files per micro-batch and tracks them in the
    checkpoint, so a downstream consumer sees each change batch exactly
    once — across restarts — without the engine keeping any consumer
    state. ``commit`` arrives as a real column (hive partition dir), so
    per-commit grouping/filtering prunes files, not rows.

    At scale this is the standard lakehouse CDC pattern: the log is
    append-only, listing cost is proportional to new commits, and the
    snapshot table never carries history columns.

    The stream schema mirrors ``read_incremental``'s contract: commit rows
    carry ``_deleted`` (tombstones from ``delete_where``) so CDC consumers
    can retract — without it a downstream upsert sink would resurrect
    deleted keys. Pre-``_deleted`` commit files surface NULL for the
    column; it is coalesced to false (those commits were all upserts).
    """
    from pyspark.sql.types import BooleanType, IntegerType

    info = catalog.info(table)
    root = catalog._changes_root(table)
    import os as _os
    if not _os.path.isdir(root):
        raise ValueError(
            f"table {info.name!r} has no change log yet (no upsert commits); "
            "bootstrap consumers read the snapshot via catalog.load()")
    schema = (catalog.load(table).schema
              .add("_deleted", BooleanType())
              .add("commit", IntegerType()))
    df = (spark.readStream.schema(schema)
          .option("basePath", root)
          .parquet(root))
    # commit 1 is the bootstrap load (logged for read_asof time travel),
    # not a change — CDC consumers read the initial state via the
    # snapshot; the partition-column filter prunes those files unread.
    return (df.filter(F.col("commit") > 1)
              .withColumn("_deleted",
                          F.coalesce(F.col("_deleted"), F.lit(False))))


def stream_upsert_sink(stream_df: DataFrame, catalog, table: str, key: str,
                       checkpoint: str, order_by: str | None = None,
                       trigger_available_now: bool = True):
    """``foreachBatch`` keyed upsert into a catalog table — the streaming
    counterpart of the reference's Hudi upsert write (demo.ipynb c8:17-23).
    Each micro-batch is first collapsed to one row per ``key`` (latest by
    ``order_by`` desc when given — Hudi's precombine field — else an
    arbitrary deterministic-per-batch row), then merged last-write-wins."""
    from pyspark.sql import Window

    from pydata_vector_search_spark.operators.upsert import upsert_table

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        b = batch_df
        if order_by is not None:
            w = Window.partitionBy(key).orderBy(F.col(order_by).desc())
            b = (b.withColumn("__rn", F.row_number().over(w))
                  .filter(F.col("__rn") == 1).drop("__rn"))
        else:
            b = b.dropDuplicates([key])
        if table in catalog:
            upsert_table(catalog, table, b, key=key)
        else:
            catalog.write(table, b, key=key)

    writer = (stream_df.writeStream.foreachBatch(_sink)
              .option("checkpointLocation", checkpoint)
              .outputMode("update"))
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
