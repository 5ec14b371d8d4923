"""ORC source/sink — the warehouse interchange format.

The reference stack reads/writes one columnar format (Lance, via
Hudi's base-file option, demo.ipynb c8:22); real lakehouse estates are
polyglot: Hive/Trino/Presto warehouses hand data over as ORC at least
as often as Parquet. Spark ships a native, vectorized ORC
reader/writer (no extra jars), with the same scan-level optimizations
the engine's parquet tables get — predicate pushdown into ORC
stripes, column pruning, and whole-stage-codegen-compatible batches —
so ORC ingest at 100 TB costs what a parquet scan costs.

Design notes (mirrors sources/jsonl.py):

* **Explicit schema wins** — ORC files carry a schema, so unlike
  JSONL no inference pass is ever needed; ``read_orc`` still accepts
  an expected schema string and VERIFIES the file schema against it
  (a silently evolved upstream column type is a pipeline bug to
  surface at the boundary, not three jobs later).
* **Zstd by default** — Spark's ORC writer supports zstd; the ratio/
  speed tradeoff matches what modern warehouses emit.
* **Array fidelity** — ORC stores ``array<float>`` losslessly, so
  embedding columns round-trip bit-for-bit; the ``orc_roundtrip``
  declared query pins exactly that with a per-element integer
  checksum the DuckDB oracle recomputes from the original parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_orc(df: DataFrame, path: str, mode: str = "overwrite",
              partition_by: list[str] | None = None,
              compression: str = "zstd") -> None:
    """Write ``df`` as ORC part-files under ``path``.

    ``partition_by`` produces Hive-style ``col=value/`` directories —
    the layout warehouse engines partition-prune on."""
    w = df.write.mode(mode).option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_orc(spark: SparkSession, path: str,
             schema: str | None = None) -> DataFrame:
    """Read ORC files at ``path`` with the vectorized reader.

    When ``schema`` is given, the files' OWN schema (footer truth, read
    before any reconciliation could mask drift) is checked
    field-for-field against it — a type drifted upstream raises here,
    at the boundary — and the result is projected to the expected
    columns in the expected order."""
    df = spark.read.orc(path)
    if schema is None:
        return df
    from pyspark.sql.types import StructType

    expected = StructType.fromDDL(schema)
    got = {f.name: f.dataType for f in df.schema.fields}
    for f in expected.fields:
        if f.name not in got:
            raise ValueError(
                f"read_orc: column {f.name!r} missing at {path}")
        if got[f.name] != f.dataType:
            raise ValueError(
                f"read_orc: column {f.name!r} is {got[f.name]} at "
                f"{path}, expected {f.dataType}")
    return df.select(*[f.name for f in expected.fields])
