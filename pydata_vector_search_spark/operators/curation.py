"""End-to-end corpus curation: the selection chain a pretraining run
executes BEFORE the dataloader stage, composed from this engine's
proven gates as ONE Catalyst plan.

    1. per-domain token cap   (text_ops.domain_token_cap — the
       CCNet/RefinedWeb per-host downsampling gate)
    2. exact dedup            (min-id per normalized-text md5
       fingerprint over the SURVIVORS — real pipeline order: dedup
       what the cap kept, not the raw crawl)
    3. quality gate           (rounded quality_score threshold — the
       clean_pipeline discipline)
    4. global token budget    (text_ops.select_token_budget — "the
       best N tokens of what's left")

Downstream, ``packing``'s dataloader_epoch composition (mix → budget →
pack → shard) takes the output to training shards — together they
close the corpus-to-epoch story.

Scale shape: every stage is the operator its standalone oracle pins.
The cap stage accepts ``distributed=True`` (the whale-safe
bucket-routed spelling — no per-domain driver state, no single-task
whale window); the dedup stage is one fingerprint-key-partitioned
window (dup groups shard across tasks; a pathological all-identical
corpus concentrates ONE fingerprint group, the same bound exact dedup
has anywhere); the gate is a scalar filter in the same scan; the
budget stage routes through the bucket histogram with its own
distributed-prefix-sum escape. Staged r11 for the r12 declaration
(the last free window slot); the chained DuckDB oracle
(tools/curation_chain_oracle_draft.py) is validated EXACT at
sf0.001/0.01/0.1 and also pins the stage BOUNDARIES.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def curate_corpus(df: DataFrame, text_col: str, id_col: str,
                  domain_col: str, cap_tokens: int = 2000,
                  min_quality: float = 0.5, budget_tokens: int = 5000,
                  distributed: bool = False, **budget_kw) -> DataFrame:
    """Run the four-stage curation chain; returns the surviving rows of
    ``df`` (all original columns). ``distributed`` selects the
    whale-safe spelling of the cap stage (identical rows, pinned by
    tests); ``budget_kw`` passes through to ``select_token_budget``
    (e.g. ``bucket_decimals``, ``max_boundary_task_rows``)."""
    from pydata_vector_search_spark.functions.text import (fingerprint_md5,
                                                           quality_score)
    from pydata_vector_search_spark.operators.text_ops import (
        domain_token_cap, select_token_budget)

    capped = domain_token_cap(df, text_col, id_col, domain_col,
                              cap_tokens=cap_tokens,
                              distributed=distributed)
    wfp = Window.partitionBy("__fp")
    deduped = (capped.withColumn("__fp", fingerprint_md5(text_col))
               .withColumn("__md", F.min(id_col).over(wfp))
               .filter(F.col(id_col) == F.col("__md"))
               .drop("__fp", "__md"))
    gated = deduped.filter(F.round(quality_score(text_col), 2)
                           >= min_quality)
    return select_token_budget(gated, text_col, id_col,
                               budget_tokens=budget_tokens, **budget_kw)
