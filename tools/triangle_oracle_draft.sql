-- VALIDATED r10 declaration draft: DuckDB oracle for a
-- `graph_triangles` query — per-node triangle counts over the
-- CO-PURCHASE graph (parts linked when they share an order; bounded
-- ~C(7,2) pairs per order at any scale), replayed as a naive
-- canonical-edge three-way self-join. Verified EXACT (rows + value
-- multiset) against operators/graph.py::triangle_count at sf0.001 and
-- sf0.01 by tools/validate_triangle_draft.py before being promoted to
-- __spark_entry__.oracle_sql() in round 10.
WITH pair0 AS (
  SELECT l1.l_partkey AS u, l2.l_partkey AS v
  FROM lineitem l1 JOIN lineitem l2
    ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
  GROUP BY 1, 2
),
deg AS (
  SELECT node, COUNT(*) AS degree FROM (
    SELECT u AS node FROM pair0 UNION ALL SELECT v AS node FROM pair0
  ) GROUP BY 1
),
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM pair0 e1
  JOIN pair0 e2 ON e2.u = e1.u AND e2.v > e1.v
  JOIN pair0 e3 ON e3.u = e1.v AND e3.v = e2.v
),
per AS (
  SELECT node, COUNT(*) AS triangles FROM (
    SELECT a AS node FROM tri UNION ALL SELECT b AS node FROM tri
    UNION ALL SELECT c AS node FROM tri
  ) GROUP BY 1
)
SELECT d.node, d.degree, COALESCE(p.triangles, 0) AS triangles
FROM deg d LEFT JOIN per p USING (node)
ORDER BY node
