"""Iterative graph operators for dedup clustering.

Near-dup pair emitters (``dedup.jaccard_similarity_join`` / MinHash / SimHash)
produce EDGES; a training-data pipeline keeps one representative per
*connected component* of that graph (A~B, B~C must collapse A,B,C together
even when A~C was never emitted). The reference has no graph surface at all
(it is a single-table vector-search demo, demo.ipynb c0:4) — this is part of
the LLM-data-pipeline mandate.

Scale design
------------

``connected_components`` is min-label propagation: every node repeatedly
adopts the smallest label among itself and its neighbours until fixpoint.
Each iteration is one shuffle-join (edges ⋈ labels on the neighbour key), a
groupBy-min, and a labels self-join for the pointer jump — all
hash-partitioned on node id, so an iteration costs O(|E| + |V|) shuffled
bytes. Near-dup graphs are unions of small dense cliques, so 2–3
iterations converge in practice; ``max_iter`` bounds the worst case and
raises rather than returning a half-merged clustering.

Per-iteration hygiene that matters at 100 TB:

* ``localCheckpoint(eager=True)`` truncates the lineage each round —
  without it the plan doubles per iteration and Catalyst re-optimizes an
  exponentially growing tree (the classic iterative-Spark failure).
* the previous iteration's labels are unpersisted as soon as the new ones
  materialize, keeping peak storage at 2×|V|.
* convergence is detected with a count of CHANGED labels (an aggregate over
  the already-materialized checkpoint, no recompute).

Each round interleaves a POINTER-JUMP (path compression: every label is
replaced by its label's label) with the neighbor-min step. Plain
propagation needs diameter rounds — a chain of length d takes d
iterations, the classic whale-component failure on 100 TB graphs.
Pointer jumping shortcuts label chains exponentially (the same idea as
the large-star/small-star rounds of Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14), giving O(log n) rounds
independent of diameter — pinned by the 200-node-path test converging
within 12 iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(edges: DataFrame, src: str = "src",
                         dst: str = "dst", max_iter: int = 25,
                         local_threshold: int = 2_000_000) -> DataFrame:
    """Label every node of the undirected graph ``edges`` with the minimum
    node id reachable from it.

    Returns ``(node, component)`` — one row per distinct node appearing in
    any edge; ``component`` is the component's smallest node id (a stable,
    deterministic cluster key).

    Small graphs (≤ ``local_threshold`` distinct edges) finish DRIVER-SIDE
    with union-find: a near-dup edge set is tiny relative to its corpus,
    and the distributed loop's per-iteration job latency (~1-2 s of
    scheduling for a handful of rows) dwarfs a microsecond union-find.
    This is the "finish locally once small" move of Kiveris et al.
    (SoCC'14) applied from round zero; the count that gates it is over
    the already-materialized deduped edge list, and above the threshold
    the O(log n) pointer-jumping loop below runs unchanged — identical
    labels either way (equality pinned in tests).

    Node ids must be INTEGRAL (byte/short/int/long): labels are longs
    and the min-label contract needs a total order the long cast
    preserves. A non-integral id column raises here rather than being
    cast — a string id would cast to NULL, every edge would then drop
    out of the ``u != v`` filter, and callers like
    ``semantic_dedup_kmeans`` would silently return their input
    unchanged instead of deduplicating (r09 ADVICE)."""
    from pyspark.sql import types as T
    for c in (src, dst):
        dt = edges.schema[c].dataType
        # scale-0 decimals with <= 18 digits (common in parquet/TPC-H
        # writers) cast to long exactly, so they stay allowed; wider or
        # fractional decimals would overflow/truncate to NULL, which is
        # the silent-no-op failure this guard exists for (r09/r10 ADVICE)
        integral = isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType,
                                   T.LongType)) or (
            isinstance(dt, T.DecimalType)
            and dt.scale == 0 and dt.precision <= 18)
        if not integral:
            raise TypeError(
                f"connected_components: edge column {c!r} has type "
                f"{dt.simpleString()}; node ids must be integral (or "
                "decimal(<=18, 0), which casts to long exactly) — map "
                "string/other ids to longs first (e.g. a dense id via "
                "zipWithIndex/monotonically_increasing_id + join back)")
    e = edges.select(F.col(src).cast("long").alias("u"),
                     F.col(dst).cast("long").alias("v"))
    # symmetrize once; self-loops drop out of the neighbour-min
    # naturally. The union-with-swap embeds the caller's edge lineage
    # twice in ONE plan, but Catalyst's exchange reuse collapses the
    # two branches onto a single execution of the upstream pair
    # generator (verified r12: an explicit eager barrier here measured
    # 6.4-7.1 s on winnow_clusters vs 6.3-6.7 s without — pure noise,
    # so the extra materialization job is not worth carrying).
    e = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v"))) \
         .filter(F.col("u") != F.col("v")).distinct() \
         .localCheckpoint(eager=True)

    if e.count() <= local_threshold:
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:          # path compression
                parent[x], x = r, parent[x]
            return r

        for row in e.toLocalIterator():
            a, b = row[0], row[1]
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:                   # union by MIN id — the label
                if ra < rb:                # contract is min-reachable-id
                    parent[rb] = ra
                else:
                    parent[ra] = rb
        out = [(n, find(n)) for n in parent]
        return e.sparkSession.createDataFrame(out, "node long, component long")

    labels = (e.select("u").distinct()
               .withColumn("component", F.col("u"))
               .localCheckpoint(eager=True))

    for _ in range(max_iter):
        nbr_min = (e.join(labels.select(F.col("u").alias("v"),
                                        F.col("component").alias("nbr_c")),
                          on="v")
                    .groupBy("u").agg(F.min("nbr_c").alias("nbr_c")))
        stepped = (labels.join(nbr_min, on="u", how="left")
                   .select("u",
                           F.least("component",
                                   F.coalesce("nbr_c", "component"))
                            .alias("component")))
        # pointer jump: component <- label(component). Labels only ever
        # decrease, so least() keeps monotonicity; a component value is
        # always some node's id, so the self-join resolves every row.
        new_labels = (stepped.join(
                          stepped.select(F.col("u").alias("component"),
                                         F.col("component").alias("root")),
                          on="component", how="left")
                      .select("u",
                              F.least("component",
                                      F.coalesce("root", "component"))
                               .alias("component"))
                      .localCheckpoint(eager=True))
        changed = (new_labels.join(labels.withColumnRenamed("component", "old"),
                                   on="u")
                   .filter(F.col("component") != F.col("old")).count())
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            return labels.select(F.col("u").alias("node"), "component")

    raise RuntimeError(
        f"connected_components did not converge in {max_iter} iterations "
        "(needs ~log2(n) rounds with pointer jumping — raise max_iter)")


def cluster_summary(edges: DataFrame, src: str = "src",
                    dst: str = "dst",
                    local_threshold: int = 2_000_000) -> DataFrame:
    """Per-component rollup of a near-dup pair graph: the dedup decision
    table (keep ``component`` = min id, drop the other ``size-1`` members).

    Returns ``(cluster_id, cluster_size, max_member)`` sorted by cluster id.
    ``local_threshold`` passes through to ``connected_components`` —
    ``0`` forces the distributed pointer-jumping loop regardless of edge
    count (the path every 100-TB graph takes)."""
    comps = connected_components(edges, src=src, dst=dst,
                                 local_threshold=local_threshold)
    return (comps.groupBy(F.col("component").alias("cluster_id"))
            .agg(F.count(F.lit(1)).alias("cluster_size"),
                 F.max("node").alias("max_member"))
            .orderBy("cluster_id"))


def pagerank_exact(edges: DataFrame, src: str = "src", dst: str = "dst",
                   damping_pct: int = 85, iterations: int = 5,
                   scale: int = 10 ** 12) -> DataFrame:
    """INTEGER-EXACT PageRank: fixed-iteration power iteration with all
    mass carried as LONG fixed-point units of ``scale`` total — the
    corpus-curation signal (seed-quality propagation over citation /
    near-dup / link graphs, as in Common Crawl harvest ranking) built
    so every engine reproduces the identical integers, the same
    discipline as the bm25/lm_score micro-nat partials.

    Per iteration (damping as the exact rational ``damping_pct/100``):

        contrib(j -> i) = r_j // outdeg(j)              (integer div)
        r_i' = ((100 - damping_pct) * (scale // N)) // 100
               + (damping_pct * SUM_j contrib(j -> i)) // 100

    Integer division DROPS remainder mass (so total mass shrinks
    slightly per iteration) and dangling-node mass is dropped rather
    than redistributed — both deliberate: the ranking order matches
    float PageRank to ~1/scale, while every intermediate is a long and
    a DuckDB recursive CTE replays the run bit-for-bit. Returns
    (node, rank_units) for every node of the graph.

    Scale shape: one eager N count, then per iteration one edges ⋈
    ranks join on the source key + one groupBy(node) sum (the base and
    dangling-mass term rides the same aggregate as a zero row per
    node) — O(|E|) shuffled bytes, hash-partitioned; lineage truncated
    every SIXTH round with localCheckpoint — safe because the plan
    grows only LINEARLY in iterations (ranks feeds exactly one join
    per round) — so the plan stays bounded across iterations. Edges
    whose source id is NULL are dropped (they can contribute no mass
    and NULL is not a rankable node id)."""
    if not 0 <= damping_pct <= 100:
        raise ValueError(f"pagerank_exact: damping_pct must be in "
                         f"[0, 100], got {damping_pct}")
    if iterations < 0:
        raise ValueError(f"pagerank_exact: iterations must be >= 0, "
                         f"got {iterations}")
    # ONE eager materialization of the caller's edge lineage (r17 —
    # fused from the r16 pair edges-then-edges_deg checkpoints): the
    # out-degree is folded into the edge list in the SAME execution
    # that first runs the caller's (often expensive — a near-dup pair
    # pipeline, measured 75.6 s -> 20.6 s at the 10x probe
    # unmaterialized) lineage. The degree aggregate and the join probe
    # side both read the caller lineage's top exchange — Catalyst
    # exchange reuse collapses them onto one upstream execution inside
    # this single checkpoint, so the separate ``edges`` barrier bought
    # nothing but an extra full-|E| materialization + its scheduling
    # round trips (41 construction jobs measured at sf0.1). __deg
    # values are identical to the r16 two-step spelling, so every rank
    # integer is unchanged (pinned by the oracle replay). The loop
    # below consumes ONLY edges_deg — one join + one aggregate per
    # iteration, never a per-round outdeg rebuild (the r16 win, kept).
    e0 = edges.select(src, dst)
    outdeg = (e0.groupBy(F.col(src).alias("__d"))
              .agg(F.count(F.lit(1)).alias("__deg")))
    edges_deg = (e0.join(outdeg, F.col(src) == F.col("__d"))
                 .select(src, dst, "__deg")
                 .localCheckpoint(eager=True))
    # nodes derive from the materialized edge list (cheap distinct over
    # checkpoint blocks — no second run of the caller lineage)
    nodes = (edges_deg.select(F.col(src).alias("node"))
             .unionByName(edges_deg.select(F.col(dst).alias("node")))
             .distinct().localCheckpoint(eager=True))
    n = nodes.count()
    if n == 0:
        edges_deg.unpersist()
        return nodes.withColumn("rank_units", F.lit(0).cast("long"))
    base = ((100 - damping_pct) * (scale // n)) // 100
    # initial ranks stay LAZY over the nodes checkpoint (r17): a
    # separate eager copy of |V| constant-rank rows bought nothing —
    # iteration 1 projects the constant straight off the nodes blocks
    ranks = nodes.withColumn("rank_units",
                             F.lit(scale // n).cast("long"))
    pinned = None                  # the latest loop-OWNED checkpoint
    for _i in range(iterations):
        contribs = (edges_deg
                    .join(ranks.withColumnRenamed("node", "__s"),
                          F.col(src) == F.col("__s"))
                    .select(F.col(dst).alias("node"),
                            F.expr("rank_units div __deg")
                            .alias("__c")))
        # `div` is Spark's exact LONG division — double `/` + cast can
        # round up across an integer boundary near 2^53-scale quotients
        # and silently diverge from an engine that divides in integers.
        # The dangling/base term folds into the SAME aggregate as the
        # contribution sum (r17): a zero-contribution row per node
        # replaces the former nodes ⟕ summed join — one shuffle per
        # iteration, no second join, no broadcast build, and
        # sum(real + 0) is bit-identical to coalesce(sum(real), 0)
        new = (contribs.unionByName(
                   nodes.select("node",
                                F.lit(0).cast("long").alias("__c")))
               .groupBy("node").agg(F.sum("__c").alias("__s"))
               .select("node",
                       (F.lit(base).cast("long")
                        + F.expr(f"({damping_pct} * __s) div 100"))
                       .cast("long").alias("rank_units")))
        # truncate lineage every SIXTH iteration (and always on the
        # last): the plan grows LINEARLY in iterations (ranks feeds one
        # join per round; edges_deg/nodes are checkpointed leaves), so
        # a multi-iteration lazy segment is one execution whose AQE
        # stage jobs replace per-round checkpoint round trips — r17
        # A/B at sf0.1 (5 iters): cadence 2 → 35 construction jobs,
        # fully lazy → 27, rank checksums bit-identical at every
        # cadence (a checkpoint is semantically a no-op). The cap
        # bounds optimizer/codegen time for large iteration counts.
        if _i % 6 == 5 or _i == iterations - 1:
            ranks = new.localCheckpoint(eager=True)
            if pinned is not None:
                pinned.unpersist() # the blocks the lazy segment read
            pinned = ranks
        else:
            ranks = new            # lazy — reads the pinned checkpoint
    # the final ranks are materialized (eager checkpoint) and no longer
    # read edges/nodes — release their pinned blocks instead of holding
    # them for the caller's session lifetime (r08 ADVICE). Only the
    # returned ranks checkpoint stays resident, and it must: it IS the
    # result. |ranks| = |V| rows of (long, long) — the bounded one.
    if iterations == 0:            # loop never materialized anything:
        ranks = ranks.localCheckpoint(eager=True)   # pin before the
    edges_deg.unpersist()          # leaves it reads are released
    nodes.unpersist()
    return ranks


def triangle_count(edges: DataFrame, src: str = "src",
                   dst: str = "dst",
                   assume_canonical: bool = False) -> DataFrame:
    """Per-node triangle counts over the undirected graph ``edges`` —
    the local-clustering signal of a near-dup / citation / link graph
    (a node whose neighbours all know each other sits inside a dense
    duplicate clique; a bridge node does not), complementing
    ``connected_components`` (membership) and ``pagerank_exact``
    (centrality) on the same pair inputs.

    Returns ``(node, degree, triangles)`` for every node incident to an
    edge: ``degree`` over the de-duplicated undirected edge set and the
    number of triangles the node participates in. Exact integers —
    a DuckDB three-way self-join replays it bit-for-bit.

    Scale design: DEGREE-ORDERED orientation (Suri & Vassilvitskii,
    WWW'11 "Counting Triangles and the Curse of the Last Reducer").
    Each undirected edge is directed from its (degree, id)-smaller
    endpoint to the larger, so every out-neighbourhood has size
    O(sqrt(|E|)) regardless of skew. Enumeration is the EDGE-ITERATOR
    spelling over that orientation (r10): out-adjacency arrays
    (bounded O(sqrt E) per node by the orientation), then each
    oriented edge (a -> b) intersects N+(a) with N+(b) — every common
    out-neighbour c closes the triangle {a, b, c}, found exactly once
    at its order-minimal edge (a precedes b precedes c in the
    (degree, id) total order, so (a, b) is unique). Total work stays
    the O(|E|^1.5) wedge bound, but it flows as array payloads through
    two hash equi-joins + a per-row hash intersect instead of
    materializing every candidate wedge as a row: on the dense sf0.1
    co-purchase graph (1.2M edges, 20k nodes, 72M wedges) the wedge
    self-join + closure join ran 22 s, its broadcast-closure variant
    15 s, and this spelling 6 s — same 1,884,488 triangles. No UDF,
    nothing driver-side; the intersect is a catalyst expression over
    long arrays."""
    e = edges.select(F.col(src).cast("long").alias("u"),
                     F.col(dst).cast("long").alias("v"))
    # canonical undirected edge set: u < v, exactly once.
    # ``assume_canonical`` (r12): callers whose edge list is ALREADY
    # u < v and distinct (e.g. a pair generator that emits each
    # unordered pair once) skip the re-canonicalizing distinct — a
    # full |E| shuffle that is a no-op on such input (measured 1.2 s
    # of the 7.5 s sf0.1 co-purchase query).
    # r17: the canonical set is NOT separately checkpointed any more —
    # the ONE materialization is ``oriented`` below; the canonical
    # lineage's own top exchange (its ``distinct``, or the caller's)
    # is ReusedExchange across the degree aggregate and the
    # orientation join inside that single execution, so the caller's
    # pair pipeline still runs exactly once while a full-|E|
    # checkpoint write+read and its scheduling round trips disappear
    # (A/B at sf0.1: 5.3/5.1/5.8 → 5.1/4.6/5.2 s warm, identical
    # triangle checksums). Callers passing assume_canonical=True with
    # an expensive NON-shuffle-terminated lineage should barrier it
    # themselves (a distinct-produced edge list always ends in one).
    if assume_canonical:
        canon = e
    else:
        canon = (e.filter(F.col("u") != F.col("v"))
                 .select(F.least("u", "v").alias("u"),
                         F.greatest("u", "v").alias("v"))
                 .distinct())
    deg0 = (canon.select(F.col("u").alias("node"))
            .unionByName(canon.select(F.col("v").alias("node")))
            .groupBy("node").agg(F.count(F.lit(1)).alias("degree")))
    # orient by (degree, id): lower endpoint -> higher. Total order, so
    # each edge gets exactly one direction and out-degrees are balanced.
    withdeg = (canon
               .join(deg0.select(F.col("node").alias("u"),
                                 F.col("degree").alias("du")), "u")
               .join(deg0.select(F.col("node").alias("v"),
                                 F.col("degree").alias("dv")), "v"))
    u_first = (F.col("du") < F.col("dv")) | \
              ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v")))
    oriented = withdeg.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("b"),
    ).localCheckpoint(eager=True)  # read 4x: degree, adjacency, 2 sides
    # per-node degree re-derived from the MATERIALIZED orientation
    # (orientation is a per-edge endpoint swap, so the {a,b} multiset
    # equals the {u,v} multiset — identical degrees) instead of from
    # the un-checkpointed canonical lineage, which execution 2 would
    # otherwise re-run from the corpus
    deg = (oriented.select(F.col("a").alias("node"))
           .unionByName(oriented.select(F.col("b").alias("node")))
           .groupBy("node").agg(F.count(F.lit(1)).alias("degree")))
    # out-adjacency arrays: distinct edges -> no duplicate neighbours;
    # array size bounded O(sqrt E) by the orientation, so no whale row
    adj = oriented.groupBy("a").agg(F.collect_list("b").alias("__nb"))
    # each oriented edge picks up both endpoints' out-neighbourhoods;
    # shuffled bytes total the same sum(outdeg^2) bound the wedge join
    # pays, carried as arrays instead of exploded rows (AQE broadcasts
    # the adjacency side when it is small)
    tri = (oriented
           .join(adj.select(F.col("a"), F.col("__nb").alias("__na")), "a")
           .join(adj.select(F.col("a").alias("b"),
                            F.col("__nb").alias("__nbb")), "b")
           .select("a", "b",
                   F.explode(F.array_intersect("__na", "__nbb"))
                   .alias("c")))
    per = (tri.select(F.col("a").alias("node"))
           .unionByName(tri.select(F.col("b").alias("node")))
           .unionByName(tri.select(F.col("c").alias("node")))
           .groupBy("node").agg(F.count(F.lit(1)).alias("triangles")))
    out = (deg.join(per, "node", "left")
           .select("node", "degree",
                   F.coalesce("triangles", F.lit(0)).cast("long")
                   .alias("triangles"))
           .localCheckpoint(eager=True))
    # result is materialized and lineage-free — release the working
    # checkpoint instead of pinning it for the session (the
    # pagerank_exact discipline; |out| = one (long,long,long) row per
    # node, the bounded artifact that must stay)
    oriented.unpersist()
    return out
