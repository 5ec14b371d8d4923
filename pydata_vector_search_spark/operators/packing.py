"""Training-batch assembly operators: sequence packing and
temperature-weighted corpus mixing.

Two ops every LLM pre-training pipeline runs between "corpus is clean"
and "tokens hit the trainer", absent from the reference (a vector-search
demo, demo.ipynb c0:4) and from Spark itself:

* ``pack_sequences`` — greedy NEXT-FIT bin packing of documents into
  fixed-token-capacity training sequences (the GPT-style "pack docs into
  4k-token rows" step; Raffel et al. T5 §2.2 describe the same packing).
  The greedy recurrence is inherently sequential, so the distributed
  spelling is BLOCKED: documents are grouped into fixed id-range blocks,
  each block packs independently in one Arrow batch (applyInPandas), and
  bins never cross blocks. Packing quality loses at most one partial bin
  per block (amortized ≪1% at block_span ≫ max_len/avg_len); in exchange
  every block packs in parallel and the result is deterministic under
  ANY partitioning — block id and in-block order derive from the id
  column alone, never from row order. At 100 TB: one hash shuffle on
  block id, then embarrassingly parallel Python batches of ~block_span
  rows.

* ``temperature_mix`` — deterministic temperature-weighted downsampling
  across sources (the Pile / ROOTS / mT5 mixing rule): group g with
  n_g documents gets target share ∝ n_g^alpha, flattening the source
  distribution as alpha → 0. Selection is a pure hash rule —
  keep iff u(id) < rate_g, u(id) = md5-derived uniform in [0,1) — so
  membership is reproducible row-for-row by any engine (md5 is the
  cross-engine hash family; same trick as the dedup oracles), stable
  under re-partitioning, and needs no RNG state. Plan: one tiny groupBy
  (|groups| rows, collected driver-side), a broadcast join of the rate
  table, one scan filter. No shuffle of the corpus.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

_U_BITS = 20                       # u(id) granularity: 2^20 ≈ 1e-6 steps
_U_DENOM = float(1 << _U_BITS)


def pack_sequences(df: DataFrame, id_col: str, len_col,
                   max_len: int, block_span: int = 256,
                   bin_col: str = "bin_id",
                   pos_col: str = "bin_pos") -> DataFrame:
    """Assign every document a packing bin of capacity ``max_len``.

    Returns the input plus ``bin_col`` (long, globally unique:
    ``block * block_span + bin-within-block``) and ``pos_col`` (0-based
    slot of the doc inside its bin). Greedy next-fit in ascending
    ``id_col`` order within each block of ``block_span`` consecutive id
    values: a doc opens a new bin when it no longer fits; a single doc
    longer than ``max_len`` gets a bin of its own (callers truncate or
    split upstream — packing never drops data silently).

    ``block_span`` and ``max_len`` must be >= 1 (validated at entry,
    matching ``shard_shuffle``'s guard style — a zero span would NULL
    every ``__blk`` and crash opaquely inside the Arrow batch).

    ``id_col`` must be integral (block identity is the FLOOR division
    ``id // block_span`` — pure arithmetic on the key, so the layout is
    reproducible from the data alone). The bin-id arithmetic cannot
    collide: floor division gives every block exactly ``block_span``
    consecutive ids (truncate-toward-zero would make the block
    straddling 0 twice as wide and let it open more bins than the next
    block's id range), so a block opens at most ``block_span`` bins.
    Computed entirely in long arithmetic — ``(id - pmod(id, span)) div
    span`` — never through a double, so 64-bit snowflake/hash ids
    beyond 2^53 keep exact block identity."""
    if block_span < 1:
        raise ValueError(f"pack_sequences: block_span must be >= 1, "
                         f"got {block_span}")
    if max_len < 1:
        raise ValueError(f"pack_sequences: max_len must be >= 1, "
                         f"got {max_len}")
    lc = F.col(len_col) if isinstance(len_col, str) else len_col
    idq = id_col.replace("`", "``")
    base = df.withColumn("__len", lc.cast("long")) \
             .withColumn("__blk", F.expr(
                 f"(cast(`{idq}` as bigint)"
                 f" - pmod(cast(`{idq}` as bigint), {int(block_span)}))"
                 f" div {int(block_span)}"))

    from pyspark.sql.types import LongType, StructField, StructType

    # fresh StructType — StructType.add MUTATES, and the DataFrame's
    # cached schema object must not grow the output columns
    out_schema = StructType(list(base.schema.fields)
                            + [StructField(bin_col, LongType()),
                               StructField(pos_col, LongType())])

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        blk = int(pdf["__blk"].iloc[0])
        bins, pos = [], []
        cur_bin, fill, slot = -1, 0, 0
        for ln in pdf["__len"]:
            ln = int(ln)
            if cur_bin < 0 or fill + ln > max_len:
                cur_bin += 1
                fill, slot = 0, 0
            bins.append(blk * block_span + cur_bin)
            pos.append(slot)
            fill += ln
            slot += 1
        pdf[bin_col] = pd.Series(bins, dtype="int64")
        pdf[pos_col] = pd.Series(pos, dtype="int64")
        return pdf

    return (base.groupBy("__blk").applyInPandas(_pack, out_schema)
                .drop("__len", "__blk"))


def _u01(id_col: str, seed: int) -> F.Column:
    """Deterministic uniform in [0,1) from the row id: top 20 bits of
    md5(seed||id) — exactly replayable as
    ``('0x' || substr(md5(...),1,5))::INT / 1048576.0`` in DuckDB."""
    h = F.md5(F.concat(F.lit(f"mix{seed}|"),
                       F.col(id_col).cast("string")))
    return F.conv(F.substring(h, 1, _U_BITS // 4), 16, 10) \
            .cast("long") / F.lit(_U_DENOM)


def temperature_mix(df: DataFrame, id_col: str, group_col: str,
                    alpha: float = 0.5, sample_frac: float = 0.5,
                    seed: int = 42,
                    rate_col: str = "mix_rate",
                    weight_col=None) -> DataFrame:
    """Temperature-weighted corpus mix: keep a deterministic subset where
    group ``g`` receives target share ``n_g^alpha / Σ n^alpha`` of
    ``sample_frac · N`` total mass (capped at keeping the whole group).

    ``weight_col`` (column or name, default None) switches the mass
    from document COUNT to a per-row weight — pass a token count to
    mix by TOKEN BUDGET, which is what pretraining recipes actually
    specify (the Pile/ROOTS shares are token shares, not document
    shares): group mass n_g = Σ w, and the expected KEPT token mass is
    ``rate_g · n_g ∝ n_g^alpha`` since the per-doc hash keep-rule is
    independent of document length. With weights the group aggregate
    is still one map-side-combinable sum — nothing else changes.

    Returns the surviving rows plus ``rate_col`` — the group's keep rate
    rounded to 9 decimals (rounded IDENTICALLY in the oracle, so the
    boundary comparison ``u < rate`` can never diverge by an ulp of
    ``pow``). alpha=1 reduces to uniform ``sample_frac`` sampling;
    alpha=0 equalizes sources. Selection is the pure md5 hash rule of
    ``_u01`` — reproducible under any partitioning, no RNG state."""
    if weight_col is None:
        mass = F.count(F.lit(1)).cast("long")
    else:
        wc = F.col(weight_col) if isinstance(weight_col, str) else weight_col
        # all-NULL weights sum to NULL — coalesce to 0 so the group takes
        # the zero-mass keep-outright branch instead of a driver TypeError
        mass = F.coalesce(F.sum(wc.cast("long")), F.lit(0))
    counts = df.groupBy(group_col).agg(mass.alias("__n")).collect()
    neg = [r[group_col] for r in counts if r["__n"] < 0]
    if neg:
        # negative group mass has no share semantics (and n**alpha would
        # go complex) — refuse loudly, matching the num_shards guard style
        raise ValueError(f"temperature_mix: negative total weight for "
                         f"group(s) {neg!r}; weights must be >= 0")
    total = sum(r["__n"] for r in counts)
    denom = sum(r["__n"] ** alpha for r in counts) or 1.0
    target = sample_frac * total
    # a zero-mass group (all-zero weights) contributes nothing to the
    # budget — keep it outright rather than divide by zero
    rates = [(r[group_col],
              round(min(1.0, (r["__n"] ** alpha / denom) * target
                        / r["__n"]), 9) if r["__n"] else 1.0)
             for r in counts]
    spark = df.sparkSession
    rdf = spark.createDataFrame(
        rates, df.select(group_col).schema.add(rate_col, "double"))
    return (df.join(F.broadcast(rdf), [group_col])
              .filter(_u01(id_col, seed) < F.col(rate_col)))


def shard_shuffle(df: DataFrame, id_col: str, num_shards: int,
                  seed: int = 42, shard_col: str = "shard",
                  order_col: str = "shard_key") -> DataFrame:
    """Deterministic global shuffle + sharding for training dataloaders:
    every row gets a stable pseudo-random 60-bit order key (the top 15
    hex chars of ``md5(seed||id)`` — 15·4 = 60 bits, kept one nibble
    under 16 so the long stays non-negative) and a shard
    ``key-derived % num_shards``, and rows
    are physically clustered by shard and sorted by key within it —
    the "write a shuffled, sharded training corpus" step that follows
    packing/mixing in every pre-training pipeline.

    The layout is a pure function of the id column: re-running on any
    partitioning (or any engine with md5) reproduces the identical
    shard membership and in-shard order — which is what makes
    resumable/elastic data loading possible. At 100 TB this is ONE hash
    exchange on the shard id plus an in-partition sort
    (repartition + sortWithinPartitions): no global sort, no
    range-boundary sampling job, shards stream straight to their output
    files."""
    if num_shards < 1:
        raise ValueError(f"shard_shuffle: num_shards must be >= 1, "
                         f"got {num_shards}")
    h = F.md5(F.concat(F.lit(f"shuf{seed}|"),
                       F.col(id_col).cast("string")))
    key = F.conv(F.substring(h, 1, 15), 16, 10).cast("long")
    out = df.withColumn(order_col, key) \
            .withColumn(shard_col,
                        (F.col(order_col) % num_shards).cast("int"))
    return out.repartition(num_shards, F.col(shard_col)) \
              .sortWithinPartitions(shard_col, order_col, id_col)
