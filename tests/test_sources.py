"""S1 HuggingFace source adapter (import-gated in this container)."""

import pytest

from pydata_vector_search_spark.sources import load_hf_dataset


def test_hf_source_raises_clear_error_without_datasets(spark):
    with pytest.raises(ImportError, match="parquet"):
        load_hf_dataset(spark, "nathansutton/data-science-job-descriptions")
