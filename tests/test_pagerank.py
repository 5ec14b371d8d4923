"""Integer-exact PageRank (operators/graph.pagerank_exact): bit-exact
parity with a pure-Python integer reference AND a DuckDB recursive-CTE
replay, ranking sanity, and guards."""

import pytest
from pyspark.sql import functions as F

from pydata_vector_search_spark.operators.graph import pagerank_exact


def _py_pagerank(edges, damping_pct=85, iterations=5, scale=10 ** 12):
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    base = ((100 - damping_pct) * (scale // n)) // 100
    r = {v: scale // n for v in nodes}
    for _ in range(iterations):
        s = {v: 0 for v in nodes}
        for a, b in edges:
            s[b] += r[a] // outdeg[a]
        r = {v: base + (damping_pct * s[v]) // 100 for v in nodes}
    return r


EDGES = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 1), (5, 1),
         (6, 3), (6, 1), (2, 4), (7, 7)]


def test_pagerank_matches_python_reference(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    got = {r.node: r.rank_units for r in
           pagerank_exact(df, iterations=5).collect()}
    assert got == _py_pagerank(EDGES, iterations=5)


@pytest.mark.parametrize("iters", [1, 2, 3, 4])
def test_pagerank_checkpoint_cadence_parity(spark, iters):
    """The every-2nd-iteration checkpoint cadence (r12 perf change)
    has distinct code paths by iteration-count parity: a single
    iteration hits only the ``_i == iterations - 1`` arm, an even
    count ends exactly on a cadence checkpoint, an odd count > 1 ends
    on the final-iteration arm with a one-deep lazy segment. Pin all
    parities against the pure-Python integer reference (r12 ADVICE)."""
    df = spark.createDataFrame(EDGES, "src long, dst long")
    got = {r.node: r.rank_units for r in
           pagerank_exact(df, iterations=iters).collect()}
    assert got == _py_pagerank(EDGES, iterations=iters)


def test_pagerank_matches_duckdb_recursive_cte(spark):
    """The exact same integer recurrence replayed as a DuckDB
    recursive CTE produces identical longs — the oracle a declared
    query would use (validated here ahead of the r09 declaration)."""
    import duckdb
    df = spark.createDataFrame(EDGES, "src long, dst long")
    got = {r.node: r.rank_units for r in
           pagerank_exact(df, iterations=5).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE edges(src BIGINT, dst BIGINT)")
    for s, d in EDGES:
        con.execute("INSERT INTO edges VALUES (?, ?)", [s, d])
    # fixed iteration count -> UNROLLED CTE chain (a recursive CTE may
    # reference itself only once per recursive term; the recurrence
    # needs the previous ranks twice — contribs + node preservation)
    steps = "".join(f""", it{i + 1} AS (
        SELECT n.node,
               ((15 * ((1000000000000 // (SELECT cnt FROM meta))))
                // 100
                + (85 * coalesce(s.su, 0)) // 100)::BIGINT AS r
        FROM nodes n LEFT JOIN (
            SELECT e.dst AS node, sum(p.r // dg.d)::BIGINT AS su
            FROM edges e
            JOIN it{i} p ON p.node = e.src
            JOIN deg dg ON dg.node = e.src
            GROUP BY e.dst
        ) s ON s.node = n.node
    )""" for i in range(5))
    sql = f"""
    WITH nodes AS (
        SELECT DISTINCT src AS node FROM edges
        UNION SELECT DISTINCT dst FROM edges
    ), meta AS (SELECT count(*)::BIGINT AS cnt FROM nodes),
    deg AS (
        SELECT src AS node, count(*)::BIGINT AS d FROM edges GROUP BY src
    ), it0 AS (
        SELECT node,
               (1000000000000 // (SELECT cnt FROM meta))::BIGINT AS r
        FROM nodes
    ){steps}
    SELECT node, r FROM it5 ORDER BY node
    """
    want = dict(con.execute(sql).fetchall())
    assert got == want


def test_pagerank_ranking_sanity(spark):
    """Node 2 (sole sink of hub 1's entire mass) ranks highest; nodes
    with no in-links (5, 6) sit at the damped base; the self-loop node
    7 retains ~its initial mass; 0 iterations = uniform."""
    df = spark.createDataFrame(EDGES, "src long, dst long")
    got = {r.node: r.rank_units for r in
           pagerank_exact(df, iterations=5).collect()}
    assert got[2] == max(got.values())
    assert got[5] == got[6] == min(got.values())   # no in-links → base
    assert abs(got[7] - 10 ** 12 // 7) < 100       # self-loop retains
    uni = {r.node: r.rank_units for r in
           pagerank_exact(df, iterations=0).collect()}
    assert len(set(uni.values())) == 1


def test_pagerank_guards(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    with pytest.raises(ValueError, match="damping_pct"):
        pagerank_exact(df, damping_pct=101)
    with pytest.raises(ValueError, match="iterations"):
        pagerank_exact(df, iterations=-1)
    empty = spark.createDataFrame([], "src long, dst long")
    assert pagerank_exact(empty).count() == 0
