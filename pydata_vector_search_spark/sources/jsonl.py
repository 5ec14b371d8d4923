"""JSONL source/sink — the raw-crawl interchange format of LLM data
pipelines (one JSON document per line; what Common Crawl derivatives,
HF dataset dumps, and most labeling tools emit).

Built on Spark's native JSON datasource, configured for pipeline
reality rather than demo defaults:

* **PERMISSIVE ingest with quarantine** — a malformed line must never
  kill a 100-TB job (FAILFAST) or silently vanish (DROPMALFORMED).
  ``read_jsonl`` parses with an explicit schema + a
  ``_corrupt_record`` column; ``split_corrupt`` separates clean rows
  from quarantined raw lines so the pipeline can sideline them.
* **Explicit schema, not inference** — schema inference is a full
  extra pass over the data (Spark reads everything once just to guess
  types) and can mis-type sparse fields; at scale the schema is a
  contract, passed in.
* **Compression-aware** — gzip/zstd JSONL splits per FILE, not per
  block; the docstring contract tells callers to shard uploads
  accordingly (many medium files beat one huge .gz, which becomes one
  task).

``write_jsonl`` emits one JSON object per line (Spark's json writer),
optionally compressed; round-trip fidelity for the supported column
types (scalars, arrays, structs) is oracle-checked by the
``jsonl_roundtrip`` declared query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

CORRUPT_COL = "_corrupt_record"


def read_jsonl(spark: SparkSession, path: str, schema: str,
               corrupt_col: str = CORRUPT_COL) -> DataFrame:
    """Read JSONL with an explicit schema; malformed lines land intact in
    ``corrupt_col`` (added to the schema automatically) instead of
    failing the job or being dropped."""
    full = f"{schema}, {corrupt_col} string"
    return (spark.read.schema(full)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", corrupt_col)
            .json(path))


def split_corrupt(df: DataFrame,
                  corrupt_col: str = CORRUPT_COL
                  ) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined): clean rows lose the corrupt column;
    quarantined rows are the raw offending lines (single string column),
    ready to be written to a dead-letter path.

    Caches ``df``: Spark disallows querying ONLY the internal corrupt
    column from a raw JSON scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN); the
    documented workaround is caching the parsed frame — which also makes
    the two branches share one parse. For corpus-scale inputs where
    caching is unacceptable, use ``read_jsonl_quarantine`` (two scans,
    no materialization) instead."""
    df = df.cache()
    clean = df.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    bad = (df.filter(F.col(corrupt_col).isNotNull())
             .select(F.col(corrupt_col).alias("raw_line")))
    return clean, bad


def read_jsonl_quarantine(spark: SparkSession, path: str, schema: str
                          ) -> tuple[DataFrame, DataFrame]:
    """Scan-based quarantine split — the 100-TB shape: (clean, bad),
    nothing cached or materialized. Both branches parse via TEXT scan +
    ``from_json``: the json SOURCE's internal corrupt column carries a
    query restriction (QUERY_ONLY_CORRUPT_RECORD_COLUMN fires whenever
    column pruning leaves only it — e.g. ``clean.count()``), while
    ``from_json`` is an ordinary expression with none. Two notes baked
    in: from_json never returns a NULL struct in PERMISSIVE mode —
    malformed input yields a struct of NULL fields, so the corrupt
    column must be declared INSIDE the parse schema; blank lines are
    skipped, not quarantined (mirroring the json source)."""
    lines = spark.read.text(path).filter(F.trim(F.col("value")) != "")
    parsed = F.from_json(
        F.col("value"), f"{schema}, {CORRUPT_COL} string",
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL})
    both = lines.select(F.col("value"), parsed.alias("__p"))
    clean = (both.filter(F.col(f"__p.{CORRUPT_COL}").isNull())
                 .select("__p.*").drop(CORRUPT_COL))
    bad = (both.filter(F.col(f"__p.{CORRUPT_COL}").isNotNull())
               .select(F.col("value").alias("raw_line")))
    return clean, bad


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite",
                compression: str | None = None) -> None:
    """One JSON object per line. ``compression``: None | 'gzip' | 'zstd'
    — compressed JSONL is one task per FILE on read; shard accordingly
    (repartition before writing so no single file dominates)."""
    w = df.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    w.json(path)
