"""HuggingFace dataset source (reference S1: demo.ipynb c5:1 —
``load_dataset("nathansutton/data-science-job-descriptions",
split="train")`` fetched driver-side then ``spark.createDataFrame``).

Import-gated: the ``datasets`` library is not in this container, so the
adapter raises a clear error at call time; the conversion path
(records → Arrow-backed Spark DataFrame, optional row cap) is what a
deployment with the library installed exercises.

Scale note (SURVEY §2.1 S1): driver-side fetch is only sane for demo-sized
datasets. For anything real, pre-materialize the dataset to parquet
(``datasets.Dataset.to_parquet``) and ``spark.read.parquet`` it — the
``parquet_hint`` error text points users there.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def load_hf_dataset(spark: SparkSession, name: str, split: str = "train",
                    limit: int | None = None) -> DataFrame:
    """Fetch a HuggingFace dataset and return it as a Spark DataFrame."""
    try:
        from datasets import load_dataset  # type: ignore
    except ImportError as e:
        raise ImportError(
            "the 'datasets' library is not installed. For demo-sized data, "
            "`pip install datasets` and retry; for production scale, "
            "pre-materialize to parquet (Dataset.to_parquet) and use "
            "spark.read.parquet instead of a driver-side fetch.") from e

    ds = load_dataset(name, split=split)  # pragma: no cover - needs network
    if limit is not None:
        ds = ds.select(range(min(limit, len(ds))))
    return spark.createDataFrame(ds.to_pandas())
