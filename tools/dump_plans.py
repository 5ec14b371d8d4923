"""Regenerate PLANS.md: formatted physical plans of the flagship queries
with the scale-argument commentary. Usage: python tools/dump_plans.py
[sf_dir]."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NOTES = {
    "hybrid_prefilter": (
        "Pre-filter hybrid search — the headline improvement over the "
        "reference's post-filter (demo.ipynb c13:1-4). The label predicate "
        "is INSIDE the scan (PushedFilters), the cosine distance is a "
        "codegen'd expression above it, and the top-k is "
        "TakeOrderedAndProject: no shuffle, no global sort. At 100 TB each "
        "task keeps a k-row heap; the driver merges k rows per task."),
    "ann_ivf_knn": (
        "IVF probe: the scan carries PartitionFilters on __cid — "
        "directories outside the probed centroid set are never listed or "
        "opened. Above it, the same exact re-rank plan as hybrid_prefilter."),
    "join_multiway": (
        "Star join: every dimension is a BroadcastHashJoin build side; the "
        "lineitem fact table is never shuffled until the final single-key "
        "aggregate."),
    "agg_pricing_summary": (
        "TPC-H Q1 shape: partial HashAggregate before the exchange "
        "(map-side combine), one hash exchange on the 2-column group key, "
        "final HashAggregate."),
    "minhash_neardup": (
        "MinHash-LSH: shingle hash-aggregate collapses to docs x "
        "num_hashes before any shuffle; the banded self-join reuses one "
        "exchange (ReusedExchange); exact Jaccard verification touches "
        "only co-bucketed candidate pairs."),
    "shipping_priority": (
        "TPC-H Q3 shape: both filtered dimensions broadcast "
        "(BroadcastHashJoin); lineitem — the fact — is scanned once with "
        "its date filter pushed down and shuffles exactly once, on the "
        "aggregate key. TakeOrderedAndProject caps the result at k."),
    "scalar_subquery": (
        "TPC-H Q17 shape, written DECORRELATED: the per-part avg is one "
        "hash aggregate over lineitem, joined back instead of a per-row "
        "correlated re-scan; the brand dimension is broadcast. This is "
        "the only shape that survives 100 TB — correlated execution would "
        "rescan the fact once per outer row."),
    "knn_join_ivf": (
        "Batch KNN as an EQUI-join: queries are assigned to probed "
        "centroids, the corpus is pre-partitioned by centroid id, and the "
        "join key is __cid — a hash join whose build side is the query "
        "batch, NEVER a cross product. At 100 TB the per-pair distance "
        "work is bounded by nprobe/num_centroids of the corpus."),
    "bucketed_join": (
        "Join over bucketed tables. At this sf the dim side is small "
        "enough that Catalyst picks a broadcast join — ALSO exchange-free "
        "on the fact input, and strictly cheaper, so the right plan here. "
        "The bucketing contract itself (zero-exchange SortMergeJoin when "
        "broadcast is off / both sides are large — the 100 TB fact-fact "
        "case) is pinned in tests/test_bucketing.py: with "
        "autoBroadcastJoinThreshold=-1 the plan has SortMergeJoin and NO "
        "Exchange hashpartitioning, the write-time shuffle amortizing "
        "over every subsequent join."),
    "sessionize": (
        "Batch sessionization: ONE data exchange (hash on user_id); both "
        "lag/running-sum windows share the same sort, and Catalyst "
        "recognizes the (user_id, sess) and user_id aggregations are "
        "satisfied by that partitioning — no exchange between the four "
        "HashAggregates. The only other exchange orders the tiny per-user "
        "output."),
    "vector_knn": (
        "Exact KNN scan: pruned columnar scan -> codegen-unrolled cosine "
        "(scalar multiply/add tree inside WholeStageCodegen — no "
        "interpreted higher-order functions on the hot path, and since r4 "
        "the tree is rendered as ONE SQL string parsed JVM-side, skipping "
        "~1.5s of per-plan driver Py4J construction at dim=64) -> "
        "TakeOrderedAndProject(k). No exchange; each task keeps a k-row "
        "heap and the driver merges k rows per task."),
    "jaccard_prefix": (
        "Prefix-filtered exact Jaccard join (Bayardo WWW'07 + PPJoin "
        "size/positional filters, Xiao WWW'08): shingles hashed to longs "
        "row-side; the candidate self-join explodes only rarest-first "
        "prefixes and prunes on size ratio + best-case-overlap bounds "
        "(409k -> 26k candidates at sf0.1, exactness-preserving); the "
        "surviving pair list BROADCASTS into the verify joins, so the "
        "shingle-array table is never re-shuffled by id. At 100 TB the "
        "candidate volume is bounded by rare-shingle document "
        "frequencies, the verify by the near-dup rate."),
    "time_travel_read": (
        "Snapshot time travel (read_asof): ONE partition-pruned scan of "
        "the commit-log directories <= N, a single hash exchange on the "
        "record key for the last-write-wins window, tombstone filter "
        "above it. Cost is proportional to the log through commit N — "
        "the live table is never touched for historical reads, and the "
        "current-commit case short-circuits to the plain snapshot scan."),
    "ann_after_upsert": (
        "Post-rebuild index probe — identical plan shape to ann_ivf_knn "
        "(PartitionFilters on __cid + exact re-rank); what the query adds "
        "is the LIFECYCLE: the probed directories belong to the index "
        "REBUILT at the table's current commit, enforced by the catalog "
        "staleness contract rather than by plan structure."),
    "merge_clauses": (
        "Conditional MERGE: the final snapshot aggregate over the merged "
        "table — the merge itself ran as ONE SortMergeJoin (full outer on "
        "the record key, never a cartesian) with clause conditions "
        "evaluated map-side on the source before the join; the COW "
        "rewrite + two commit-log appends are write jobs, not part of "
        "this read plan."),
    "bm25_search": (
        "Okapi BM25 as one declarative plan: the query-term table, "
        "per-term document frequencies and the corpus stats row are all "
        "BroadcastExchange build sides; the only data shuffles are the "
        "partial->final HashAggregates on (doc,term) and doc — map-side "
        "combined, so shuffled bytes are bounded by docs x terms. Top-k "
        "is TakeOrderedAndProject: no global sort."),
    "hybrid_rrf": (
        "Reciprocal Rank Fusion: both rank inputs are k-truncated top-N "
        "lists, so the single-partition row_number windows sort <=50 rows "
        "each — the corpus never reaches a global window. The fusion "
        "full-outer join runs on two 50-row sides."),
    "semantic_dedup": (
        "SemDeDup: one shuffle on the LSH signature key, per-bucket BLAS "
        "verify (applyInPandas), O(log n) pointer-jump rounds for "
        "components, then a left-anti join whose right side is the doomed "
        "id set — near-dup-count-sized, AQE broadcasts it at runtime."),
    "merge_partitioned": (
        "Partition-scoped MERGE INTO: the target scan carries partition "
        "predicates for the source-touched partitions only (partition "
        "pruning — untouched directories never open), the outer join runs "
        "on (key, partition) identity, and the write is dynamic partition "
        "overwrite of exactly the touched partitions."),
    "incremental_agg": (
        "Incremental view maintenance: refresh reads the commit-pruned "
        "change log for the changed keys, replays only those keys' prior "
        "image as-of the last refresh (log replay, not a table scan), and "
        "applies a group-keyed delta onto the small materialized table. "
        "The base table is never rescanned."),
    "zorder_scan": (
        "Scan over the Z-ORDERED rewrite: both range predicates reach the "
        "parquet scan (PushedFilters on l_orderkey AND l_partkey), and "
        "because every file/row group covers a small Morton rectangle of "
        "BOTH keys, min/max stats prune on either column — the "
        "multi-dimensional generalization of clustered_scan."),
    "stream_stream_join": (
        "Batch rollup over the stream-stream join's sink; the streaming "
        "plan itself (two file-source streams, StreamingSymmetricHashJoin "
        "on user_id with the interval condition) ran before this with "
        "state sized to 4 partitions — see the declared query's "
        "docstring for the state-store economics."),
    "ivfpq_knn": (
        "IVF×PQ (r06): the scan carries PartitionFilters on __cid (IVF "
        "prune) and reads the pq_code column for ADC ranking — the float "
        "vectors are decoded only for the exact re-rank of the shortlist "
        "(columnar pruning does the second byte cut). Two prune factors "
        "multiply: nprobe/num_centroids of the rows at m bytes each."),
    "dedup_clusters_dist": (
        "Distributed connected components (r06): per iteration one "
        "edges⋈labels shuffle-join + groupBy-min + pointer-jump "
        "self-join, all hash-partitioned on node id; "
        "localCheckpoint(eager) truncates lineage every round so the "
        "plan below stays constant-size across iterations (the classic "
        "iterative-Spark failure avoided)."),
    "sequence_pack": (
        "Sequence packing (r06): ONE hash exchange on the block id, then "
        "FlatMapGroupsInPandas packs each ~block_span-doc block in a "
        "single Arrow batch — embarrassingly parallel, layout a pure "
        "function of ids. The rollup above is a standard partial-agg "
        "exchange on bin_id."),
    "temperature_mix": (
        "Temperature mixing (r06): the rate table (|groups| rows) is a "
        "BroadcastHashJoin build side and the md5 hash-rule filter is a "
        "codegen'd expression in the probe-side scan stage — the corpus "
        "is never shuffled or collected."),
    "incremental_agg_minmax": (
        "MIN/MAX IVM refresh (r06): affected groups (from the changed "
        "keys' old∪new images) broadcast into a left-semi join that "
        "scopes the snapshot groupBy, merged with the untouched rollup "
        "rows by a null-safe anti-join. Work ∝ changed groups' data; "
        "the plan shows the broadcast semi/anti pair, never a full "
        "rescan-aggregate of unchanged groups feeding the result."),
    "span_dedup": (
        "Substring-span dedup (r06, Lee et al. '21; r13 fan-out): the "
        "corpus fans out on the doc id FIRST (the interpreted zip_with "
        "gram build + per-window md5 otherwise runs on a single "
        "row-group's one partition — measured 2.4-2.9 -> 1.2-1.3 s at "
        "sf0.1), then the suffix array becomes a gram-keyed "
        "HashAggregate — (doc,pos) packs into ONE long so "
        "first-occurrence min is partial_min in a codegen "
        "HashAggregate, not a SortAggregate over structs; hot "
        "boilerplate grams collapse map-side before the exchange. One "
        "gram-keyed join tags duplicate occurrences (AQE broadcasts at "
        "test SF, sort-merge at scale), the interval merge is a per-doc "
        "window riding the same id hash layout — partitions stay "
        "balanced because each doc's duplicate starts are that doc's "
        "rows only — and the token rebuild is a codegen'd higher-order "
        "filter; no Python anywhere."),
    "paragraph_dedup": (
        "Paragraph dedup (r06): same two-shuffle shape as span_dedup "
        "minus the interval logic — unit-key groupBy-min (partial agg "
        "absorbs viral boilerplate paragraphs), join-back to tag "
        "survivors, doc-keyed reassembly via sorted collect_list. "
        "No self-join, no corpus-wide window."),
    "lm_perplexity": (
        "Bigram-LM scoring (r06; r12 scan reduction): n-gram counting "
        "is two map-side-combined HashAggregates (unigram + bigram "
        "keys); the total-token scalar derives from the unigram table "
        "(whose exchange the scoring joins share) instead of its own "
        "corpus sizes-sum pass; scoring joins the DISTINCT-gram cost "
        "table (vocabulary-sized, not corpus-sized) back to "
        "occurrences. Per-gram costs are floored to integer micro-nats "
        "BEFORE the per-doc sum, so the final aggregate is an exact "
        "long — order-independent under any partitioning, which is "
        "what makes the result oracle-hashable."),
    "dsir_select": (
        "DSIR selection (r06; r12 scan reduction): both hashed-bucket "
        "models are num_buckets-row BroadcastExchange build sides — "
        "the corpus explode joins them WITHOUT shuffling itself; the "
        "target model's count table localCheckpoints once (the "
        "emptiness guard forces it), so the target corpus is exploded "
        "exactly once. The only data exchange is the per-doc weight "
        "aggregate. Top-k is TakeOrderedAndProject on the exact "
        "integer weight."),
    "shard_shuffle": (
        "Dataloader shuffle+shard (r06): the operator itself is ONE "
        "hash exchange on the shard id + an in-partition sort (no "
        "global Sort node, no range-boundary sampling job); the "
        "declared query's per-shard rank window re-partitions on the "
        "same shard key, so AQE reuses the exchange. Shards stream "
        "straight to output files at any corpus size."),
    "clean_pipeline": (
        "End-to-end cleaning pipeline (r06): the quality/lang/token "
        "gate is pure codegen scalar expressions INSIDE the first scan "
        "stage (documents read once, filtered before the explode), and "
        "the paragraph-dedup stages above it are the same two "
        "map-side-combinable shuffles as paragraph_dedup — composing "
        "the stages adds zero extra passes over the corpus."),
    "dataloader_epoch": (
        "Assemble-a-training-epoch composition (r07) as ONE Catalyst "
        "plan: each union leg scans documents once with the broadcast "
        "mix-rate join and hash keep-rule pushed into the scan stage; "
        "the only unpartitioned Window runs over the BOUNDARY quality "
        "bucket alone (~1/buckets of the corpus — the "
        "select_token_budget design), never the whole corpus. "
        "Everything after selection is budget-bounded: one exchange to "
        "block-group for the packing Arrow batches "
        "(FlatMapGroupsInPandas), one map-side-combinable bin "
        "aggregate, one shard exchange + in-partition sort. The 100 TB "
        "corpus is touched only by the two gated scans; every later "
        "stage works on the selected token budget."),
    "temperature_mix_tokens": (
        "Token-weighted mixing (r07): one map-side-combinable "
        "sum(token_count) per source (group-cardinality-sized "
        "collect), rates broadcast back, md5 keep-rule evaluated "
        "inside the scan stage — the corpus itself never shuffles; "
        "the declared rollup adds the single group-key exchange."),
    "orc_roundtrip": (
        "ORC interchange (r07): both legs are vectorized ORC scans "
        "(Spark's native reader — same columnar batches and pushdown "
        "machinery as parquet) feeding partial+final hash aggregates; "
        "the md5/checksum expressions are codegen scalars, one "
        "exchange per leg on the group key."),
    "stream_index_patch": (
        "Stream-maintained index (r07): the displayed plan is the "
        "POST-PATCH probe — identical in shape to ann_ivf_knn "
        "(PartitionFilters-pruned scan + TakeOrderedAndProject); the "
        "streamed upsert and the ivf_patch partition rewrite happen "
        "during construction, each costing work proportional to the "
        "changed keys, never a rebuild scan."),
    "jaccard_auto_heavy": (
        "The auto dispatcher's PPJoin branch (r08; r16: the probe "
        "MATERIALIZES the hashed shingle table + capped dfreq once and "
        "threads them into the routed branch, so the corpus is "
        "tokenized/shingled/hashed exactly once per call — before r16 "
        "the branch re-ran the whole gram pipeline at action): the "
        "probe aggregate ran at construction (ratio above threshold on "
        "the doubled corpus) and its SUM C(df,2) fed the broadcast "
        "gate; the displayed plan is the prefix join over the "
        "checkpointed shingle table — rarest-first prefixes via one "
        "partitioned row_number window, size+positional-filtered "
        "candidate self-join, broadcast candidate verify with 8-byte "
        "hashed shingle arrays."),
    "token_budget_dist": (
        "Distributed boundary prefix sum (r08): both Window operators "
        "in the plan are PARTITIONED — the boundary bucket's running "
        "sum runs per id-range sub-bucket (__pb) with driver-computed "
        "offsets added back; no unpartitioned WindowExec anywhere, so "
        "no single task ever sees the whole boundary bucket. The "
        "histogram aggregate below it is map-side combinable."),
    "winnow_neardup": (
        "Winnowing fingerprints (r08; r13 fan-out): the corpus fans "
        "out on the doc id BEFORE the gram explode — the id hash "
        "layout satisfies the sliding-min window's clustering, so the "
        "per-gram md5 pipeline runs at full parallelism and the window "
        "adds NO second exchange (fingerprint stage 3.17 -> 0.56 s at "
        "sf0.1, identical fingerprints). Gram positions EXPLODE so the "
        "md5 k-gram hash runs inside WholeStageCodegen (the all-array "
        "HOF spelling pays ~9 us/element interpreted — measured 3x "
        "slower end-to-end); the fingerprint self-join is the dedup "
        "family's bounded equi-join reading the fingerprint distinct's "
        "own exchange as ReusedExchange (r16: the former extra "
        "round-robin barrier was a third full shuffle of the (id, fp) "
        "set on top of that exchange — removed, one less Exchange in "
        "the plan)."),
    "pack_tokenized": (
        "Tokenizer-hook packing (r08): one ArrowEvalPython/MapInPandas "
        "stage computes BPE-ish counts executor-side (tokenizer loads "
        "once per task), then the proven blocked next-fit "
        "applyInPandas — the only exchange is the block-id hash "
        "shuffle; swapping a real BPE vocab changes no plan shape."),
    "nb_classify": (
        "NB corpus classification (r09; r12 one-pass training; r13: "
        "the declared query materializes this rollup eagerly and "
        "releases the persisted count table — the plan shown is the "
        "executed train+score lineage via _nb_classify_lazy, not the "
        "local relation the query hands the driver): "
        "training runs EXACTLY ONE corpus explode-aggregate — the "
        "vocabulary-sized (label, token) count table persists (same "
        "magnitude as the dense model) and |V|, per-class totals, and "
        "the dense vocab spine all derive from it, so neither the "
        "eager |V| count nor the scoring join re-runs training over "
        "the corpus (pre-r12 they each did). Scoring explodes the "
        "corpus once, joins the BOUNDED dense model (max_vocab=4096 "
        "hash buckets — broadcast gated on the trained |V|, "
        "shuffle-join fallback past BROADCAST_SAFE_VOCAB), and "
        "shuffles once on the (doc,label) partial sums. The "
        "unseen-token mass is closed-form from per-doc token totals — "
        "no dense miss rows materialize."),
    "pagerank": (
        "Integer-exact PageRank (r09): the edge list (distinct "
        "customer-supplier purchase pairs, symmetrized) barriers ONCE "
        "(localCheckpoint — it is consumed iterations+2 times), then "
        "each iteration is one edges-to-ranks hash join + one "
        "groupBy(dst) sum, O(|E|) shuffled bytes with lineage "
        "truncated every SECOND round (r12: a two-layer "
        "uncheckpointed segment keeps the plan bounded at half the "
        "materialization jobs — 4.99 -> 4.31 s warm at sf0.1, "
        "bit-identical checksums); the final plan is at most the last "
        "two iterations, bounded regardless of iteration count. "
        "Edge/node blocks are released when the final ranks "
        "materialize."),
    "winnow_clusters": (
        "Winnow pairs composed into clusters (r09): the winnow_neardup "
        "lineage verbatim (explode + codegen md5 + doc-partitioned "
        "sliding-min window, capped fp equi-join) feeding "
        "connected-components; at this sf the materialized pair list "
        "is under the small-graph threshold so the hull closes "
        "driver-side in a microsecond union-find — at 100 TB the same "
        "call runs the O(log n) pointer-jumping loop, identical "
        "labels (pinned in tests)."),
    "kmeans": (
        "Integer-exact k-means assignment (r10): the plan is the FINAL "
        "assignment pass only — one Arrow-batched pandas_udf argmin "
        "over the checkpointed projection, no shuffle, no join (the "
        "k·d model rides in the task closure). The three training "
        "iterations each ran posexplode + a map-side-combined hash "
        "aggregate whose shuffle is partitions·k·d rows; their "
        "lineage is gone from this plan by construction."),
    "kmeans_sample": (
        "Cluster-balanced sampling (r10): the k-means argmin pass "
        "feeding the salted TOURNAMENT — two window stages, the first "
        "partitioned by (cluster, salt) so per-task input is bounded "
        "at |cluster|/salt_buckets, the second over the <= salt·n "
        "survivors. No whale-cluster single-task sort anywhere; the "
        "DuckDB oracle runs the single-window spelling the tournament "
        "provably equals."),
    "graph_triangles": (
        "Edge-iterator triangle counting (r10; r13: the edge build "
        "repartitions on l_orderkey before its collect_set aggregate — "
        "the single-row-group scan otherwise runs the 600k-row partial "
        "agg on one core, and the hash layout satisfies the groupBy so "
        "no extra exchange appears): degree-ordered "
        "orientation (two broadcast-able degree joins), out-adjacency "
        "arrays via collect_list (bounded O(sqrt E) per node by the "
        "orientation), then each oriented edge hash-joins both "
        "endpoints' arrays and intersects them in a catalyst "
        "expression — candidate wedges are never materialized as "
        "rows (the wedge spelling's 72M-row exchange on this graph; "
        "3.7x slower, heap-bound at the 100x probe). The explode "
        "feeds partial aggregation in the same stage. The dumped "
        "plan shows only the post-checkpoint scan — the result is "
        "eagerly materialized and lineage-truncated inside the "
        "operator (the pagerank discipline), so the executed stages "
        "live behind the ExistingRDD barrier."),
    "bpe_train": (
        "BPE vocabulary induction (r10): the ONLY corpus-sized work "
        "in the plan is the word-frequency aggregate (explode + "
        "map-side-combined count, shuffled by word type, capped by a "
        "deterministic (count desc, word) TakeOrdered); the merge "
        "loop is driver-side over that bounded table — incremental "
        "pair counting, O(affected words) per merge — and the "
        "returned merge table is merges-sized, re-parallelized via "
        "createDataFrame."),
    "semdedup_kmeans": (
        "Paper-faithful SemDeDup (r11): the kmeans argmin pass feeds "
        "ONE cluster-key shuffle into the Arrow triu pair pass (per-"
        "task input = one cluster, never the corpus), components is "
        "the O(log n) pointer-jump loop behind its checkpoint "
        "barrier, and the survivors join is a left_anti against the "
        "dup-count-sized doomed side (AQE broadcast). The dumped "
        "plan shows the rollup over the post-barrier join — the "
        "iterative stages are lineage-truncated by construction."),
    "domain_token_cap": (
        "Whale-safe per-domain token cap (r11, the DISTRIBUTED "
        "branch): bucket stats are one map-side-combined aggregate; "
        "the routing window runs over the BUCKET table partitioned "
        "by domain (per-task input = one domain's bucket count, "
        "never its rows); fully-kept buckets pass through one "
        "null-safe hash join; only boundary-bucket rows run a "
        "running-sum window, partitioned down to (domain, bucket, "
        "id-range sub-bucket) with window-computed offsets — no "
        "per-domain driver state, no whale single-task window."),
    "collocations_pmi": (
        "PMI collocations (r11): one exploded-bigram hash aggregate "
        "(map-side combine bounds the shuffle at partitions x "
        "distinct pairs) behind its checkpoint; marginals are two "
        "aggregates over the PAIR table (distinct-pair-sized, not "
        "corpus-sized) that AQE broadcasts into the final join "
        "(past the broadcast threshold the fallback is a word-keyed "
        "sort-merge over vocabulary-bounded tables — bounded, never "
        "corpus-sized; the min_count filter is pushed below both "
        "joins); top-k is TakeOrderedAndProject — per-partition "
        "heaps, no global sort."),
    "curation_chain": (
        "Full curation chain (r12, the final declaration): cap -> "
        "dedup -> gate -> budget as ONE pass over the corpus (r16: the "
        "cap->dedup->gate prefix materializes once at the budget "
        "stage's histogram barrier — select_token_budget's eager "
        "histogram collect previously ran it and the final plan then "
        "re-ran it from scratch; the dumped plan reads the "
        "checkpointed survivors). The cap "
        "stage is the declared whale-safe distributed branch (bucket "
        "stats aggregate + domain-partitioned routing window over "
        "the BUCKET table + null-safe joins + sub-bucketed boundary "
        "windows — the domain_token_cap plan verbatim); the dedup "
        "stage is one min-id window partitioned by the md5 text "
        "fingerprint — dup groups shard across tasks, and its ONLY "
        "skew exposure is a pathologically all-identical corpus "
        "concentrating one fingerprint group in one task, the same "
        "bound exact dedup has anywhere (operators/curation.py "
        "docstring); the quality gate is a scalar filter fused into "
        "the same scan; the budget stage routes through the quality "
        "histogram (driver sees only the bucket table) with the "
        "distributed-prefix-sum escape and the r12 naive-window "
        "NULL-token contract (leading NULL rows drop in every "
        "branch). Probe: sub-linear 9.6 -> 15.4 s over 10x -> 100x."),
}


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    import __spark_entry__ as entry
    from pydata_vector_search_spark.session import get_spark

    spark = get_spark("dump_plans")
    spark.sparkContext.setLogLevel("ERROR")

    out = ["# PLANS — physical-plan evidence for the flagship queries", "",
           f"Generated from `.explain('formatted')` at {os.path.basename(sf)}"
           " on local[32]. These are",
           "the plans the scale arguments in README.md claim; re-generate with",
           "`python tools/dump_plans.py`.", ""]
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    for name, note in NOTES.items():
        model = None
        if name == "nb_classify":
            # the declared query returns a local relation (eager rollup
            # + model release, r13); dump the REAL train+score lineage
            model, df = entry._nb_classify_lazy(spark, sf)
        else:
            df = entry.queries()[name](spark, sf)
        plan = df._jdf.queryExecution().explainString(mode)
        if model is not None:
            model.unpersist()
        head = plan.split("\n\n")[0]
        out += [f"## {name}", "", note, "", "```", head.strip(), "```", ""]
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
