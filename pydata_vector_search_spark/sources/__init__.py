from pydata_vector_search_spark.sources.huggingface import (  # noqa: F401
    load_hf_dataset,
)
from pydata_vector_search_spark.sources.columnar import (  # noqa: F401
    read_orc,
    write_orc,
)
from pydata_vector_search_spark.sources.jsonl import (  # noqa: F401
    read_jsonl,
    read_jsonl_quarantine,
    split_corrupt,
    write_jsonl,
)
