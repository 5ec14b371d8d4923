-- VALIDATED r09 declaration draft: DuckDB oracle for an `nb_classify`
-- query (train multinomial NB on documents.lang, score the same
-- corpus, per-predicted-label rollup). Verified EXACT against
-- operators/classify.nb_train/nb_score at sf0.001 during r08
-- (identical floored micro-nat integers incl. score sums).
-- Spark side: nb_train(docs,'text','lang'); nb_score(...); groupBy
-- pred_label agg count/id_sum/score_sum. Ties: score DESC, label DESC.
WITH toks AS (
  SELECT doc_id, lang,
         list_filter(regexp_split_to_array(trim(regexp_replace(lower(coalesce(text,'')), '\s+', ' ', 'g')), ' '),
                     w -> len(w) > 0) AS tk
  FROM documents
), occ AS (
  SELECT doc_id, lang, unnest(tk) AS w FROM toks
), counts AS (
  SELECT lang, w, count(*)::DOUBLE AS c FROM occ GROUP BY lang, w
), per_class AS (
  SELECT lang, count(*)::DOUBLE AS nt FROM occ GROUP BY lang
), v AS (SELECT count(DISTINCT w)::DOUBLE AS v FROM occ),
nd AS (SELECT count(*)::DOUBLE AS n FROM toks),
priors AS (SELECT lang, count(*)::DOUBLE AS ndc FROM toks GROUP BY lang),
classes AS (
  SELECT p.lang,
         floor(ln(p.ndc / nd.n) * 1000000 + 0.5)::BIGINT AS prior,
         floor(ln(1.0 / (coalesce(pc.nt, 0) + 1.0 * v.v)) * 1000000 + 0.5)::BIGINT AS dflt,
         coalesce(pc.nt, 0) AS nt
  FROM priors p LEFT JOIN per_class pc USING (lang) CROSS JOIN v CROSS JOIN nd
), dense AS (
  SELECT vo.w, c2.lang,
         floor(ln((coalesce(cn.c, 0) + 1.0) / (c2.nt + 1.0 * v.v)) * 1000000 + 0.5)::BIGINT AS llh
  FROM (SELECT DISTINCT w FROM occ) vo
  CROSS JOIN classes c2 CROSS JOIN v
  LEFT JOIN counts cn ON cn.w = vo.w AND cn.lang = c2.lang
), base AS (SELECT doc_id, len(tk) AS n FROM toks),
socc AS (SELECT doc_id, unnest(tk) AS w FROM toks),
seen AS (
  SELECT s.doc_id, d.lang, sum(d.llh)::BIGINT AS ssum, count(*)::BIGINT AS k
  FROM socc s JOIN dense d USING (w) GROUP BY s.doc_id, d.lang
), grid AS (
  SELECT b.doc_id, b.n, c.lang, c.prior, c.dflt FROM base b CROSS JOIN classes c
), scored AS (
  SELECT g.doc_id, g.lang,
         g.prior + coalesce(se.ssum, 0) + (g.n - coalesce(se.k, 0)) * g.dflt AS score
  FROM grid g LEFT JOIN seen se ON se.doc_id = g.doc_id AND se.lang = g.lang
), best AS (
  SELECT doc_id, lang, score,
         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang DESC) AS rn
  FROM scored
)
SELECT lang AS pred_label, count(*)::BIGINT AS n, sum(doc_id)::BIGINT AS id_sum,
       sum(score)::BIGINT AS score_sum
FROM best WHERE rn = 1 GROUP BY lang ORDER BY lang
