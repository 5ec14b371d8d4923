from pydata_vector_search_spark.sources.huggingface import (  # noqa: F401
    load_hf_dataset,
)
