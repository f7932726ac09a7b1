package graft
package registry

/** Shared DuckDB-oracle SQL fragments used by the per-family
  * registries ([[RelationalRegistry]] etc.) — moved verbatim from the
  * pre-split SparkEntry so every oracle string stays byte-identical.
  * Each fragment's scaladoc documents its bit-parity contract with the
  * engine kernel it restates. */
private[graft] object OracleFragments {

  /** DuckDB squared-L2 over two float-list columns (computed in double,
    * sequential accumulation — bitwise-matches the engine's kernel). */
  def sqlL2sq(a: String, b: String): String =
    s"list_sum(list_transform(range(1, len($a)+1), i -> " +
      s"(CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE)) * (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE))))"

  def sqlDot(a: String, b: String): String =
    s"list_sum(list_transform(range(1, len($a)+1), i -> " +
      s"CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"

  /** Trained-SQ8 (QT_8bit) shared oracle fragments: the clamped
    * floor(r+0.5) code and the decode error vs the query — spelled as
    * the IDENTICAL binary float ops the engine executes (no round()
    * dialect seam). Expect tables aliased e (embeddings), m (model),
    * q (qv) and lambda variable i. */
  val sq8tCode: String =
    "(CASE WHEN m.vd[i] = 0 THEN 0.0 ELSE " +
      "least(greatest(floor(255.0 * (CAST(e.embedding[i] AS DOUBLE) - m.vm[i]) " +
      "/ m.vd[i] + 0.5), 0.0), 255.0) END)"

  val sq8tErr: String =
    s"(m.vm[i] + ($sq8tCode / 255.0) * m.vd[i] - CAST(q.qe[i] AS DOUBLE))"

  /** Shared oracle CTE: 64-bit sign-bit signatures over the embeddings
    * table (bit b = 1 iff embedding[b] > 0; dim is 64 at every oracle
    * scale). Packing mirrors dedup_simhash's: HUGEINT accumulation,
    * then two's-complement conversion to a signed BIGINT so
    * bit_count(xor(...)) runs on the same 64-bit lanes as the engine. */
  val sqlBinarySig: String =
    """usig AS (
      |  SELECT vec_id,
      |    list_reduce(list_prepend(0::HUGEINT, list_transform(range(0, 64), b ->
      |      CASE WHEN embedding[b+1] > 0 THEN (1::HUGEINT << b) ELSE 0::HUGEINT END)),
      |      (a, x) -> a + x) AS u
      |  FROM embeddings),
      |bsig AS (
      |  SELECT vec_id, CAST(CASE WHEN u >= 9223372036854775808::HUGEINT
      |       THEN u - 18446744073709551616::HUGEINT ELSE u END AS BIGINT) AS sig
      |  FROM usig)""".stripMargin

  /** Shared oracle CTE: the tokenized corpus — mirrors
    * Ingest.corpusFromDocuments + TextAnalytics.tokens exactly. */
  val sqlCorpusToks: String =
    """corpus AS (
      |  SELECT doc_id AS id, trim(text) AS sentence,
      |    list_filter(regexp_split_to_array(lower(trim(text)), '[^a-z0-9]+'),
      |                t -> length(t) > 0) AS toks
      |  FROM documents WHERE length(trim(text)) > 0)""".stripMargin

  /** Shared oracle CTE chain for MinHash: shingles + salted-md5
    * signatures — mirrors Dedup.minhashSignatures exactly (md5 is the
    * hash on both sides by construction). */
  val sqlMinhashSig: String =
    sqlCorpusToks + """,
      |tokenized AS (SELECT * FROM corpus WHERE len(toks) > 0),
      |sh AS (
      |  SELECT id, toks,
      |    CASE WHEN len(toks) >= 3
      |      THEN list_transform(range(1, len(toks) - 1),
      |             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
      |      ELSE [coalesce(list_aggregate(toks, 'string_agg', ' '), '')] END AS shingles
      |  FROM tokenized),
      |sig AS (
      |  SELECT id, toks,
      |    list_transform(range(0, 8),
      |      h -> list_min(list_transform(shingles, s -> md5(h::VARCHAR || ' ' || s)))) AS sig
      |  FROM sh)""".stripMargin

  /** Unrolled exact-integer PageRank iteration CTEs for the
    * pagerank_docs oracle: rN from rN-1 via one join + one integer
    * sum, damping as the overflow-safe split (s//100)*85 +
    * ((s%100)*85)//100 — mirrors GraphRank term-for-term. */
  def sqlPagerankIters(n: Int): String =
    (1 to n).map { i =>
      s"""c$i AS (
         |  SELECT ed.dst AS id, SUM(r.rank // ed.deg) AS s
         |  FROM r${i - 1} r JOIN ed ON r.id = ed.src GROUP BY ed.dst),
         |r$i AS (
         |  SELECT n.id, CAST(150000000000 + COALESCE(
         |      (c.s // 100) * 85 + ((c.s % 100) * 85) // 100, 0) AS BIGINT) AS rank
         |  FROM nodes n LEFT JOIN c$i c ON n.id = c.id)""".stripMargin
    }.mkString(",\n")

  /** Shared oracle CTE chain for the stupid-backoff LM: exact
    * uni/bi/trigram count tables over the tokenized corpus — mirrors
    * NgramLm.train (space-joined keys, collision-free over [a-z0-9]+
    * tokens). */
  val sqlLmCounts: String =
    sqlCorpusToks + """,
      |docs AS (SELECT id, toks FROM corpus WHERE len(toks) > 0),
      |uni AS (
      |  SELECT w, count(*)::BIGINT AS c1
      |  FROM (SELECT unnest(toks) AS w FROM docs) GROUP BY w),
      |tot AS (SELECT sum(c1)::BIGINT AS n_total FROM uni),
      |bi AS (
      |  SELECT k, count(*)::BIGINT AS c2
      |  FROM (SELECT unnest(list_transform(range(1, len(toks)),
      |                i -> toks[i] || ' ' || toks[i+1])) AS k
      |        FROM docs WHERE len(toks) >= 2) GROUP BY k),
      |tri AS (
      |  SELECT k, count(*)::BIGINT AS c3
      |  FROM (SELECT unnest(list_transform(range(1, len(toks) - 1),
      |                i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS k
      |        FROM docs WHERE len(toks) >= 3) GROUP BY k)""".stripMargin

  /** sqlLmCounts + per-token stupid-backoff scoring (`sc`: one rounded
    * DECIMAL log10 score per token position) — mirrors NgramLm.score's
    * longest-available-context branch selection and α factors. */
  val sqlLmScored: String =
    sqlLmCounts + """,
      |pos AS (
      |  SELECT id, i, toks[i] AS w,
      |    CASE WHEN i >= 2 THEN toks[i-1] END AS u,
      |    CASE WHEN i >= 3 THEN toks[i-2] END AS v
      |  FROM (SELECT id, toks, unnest(range(1, len(toks) + 1)) AS i FROM docs)),
      |keyed AS (
      |  SELECT id, w, u, v,
      |    CASE WHEN v IS NOT NULL THEN v || ' ' || u || ' ' || w END AS k3,
      |    CASE WHEN v IS NOT NULL THEN v || ' ' || u END AS kc2,
      |    CASE WHEN u IS NOT NULL THEN u || ' ' || w END AS k2
      |  FROM pos),
      |sc AS (
      |  SELECT kd.id,
      |    CAST(round(log10(CASE
      |      WHEN kd.v IS NOT NULL AND t3.c3 IS NOT NULL
      |        THEN t3.c3::DOUBLE / bc.c2::DOUBLE
      |      WHEN kd.u IS NOT NULL AND b2.c2 IS NOT NULL
      |        THEN (CASE WHEN kd.v IS NOT NULL THEN 0.4::DOUBLE ELSE 1.0::DOUBLE END)
      |             * b2.c2::DOUBLE / uc.c1::DOUBLE
      |      ELSE (CASE WHEN kd.v IS NOT NULL THEN 0.4::DOUBLE * 0.4::DOUBLE
      |                 WHEN kd.u IS NOT NULL THEN 0.4::DOUBLE ELSE 1.0::DOUBLE END)
      |           * uw.c1::DOUBLE / tot.n_total::DOUBLE END), 6) AS DECIMAL(18,6)) AS lp
      |  FROM keyed kd
      |  LEFT JOIN tri t3 ON kd.k3 = t3.k
      |  LEFT JOIN bi bc ON kd.kc2 = bc.k
      |  LEFT JOIN bi b2 ON kd.k2 = b2.k
      |  LEFT JOIN uni uc ON kd.u = uc.w
      |  LEFT JOIN uni uw ON kd.w = uw.w
      |  CROSS JOIN tot)""".stripMargin

  /** BM25 oracle, shared by the ad-hoc and persisted-index queries
    * (identical ranking by construction). Every floating-point step
    * mirrors the Spark expression tree op-for-op — decimal literals
    * forced to DOUBLE so DuckDB doesn't fall into decimal arithmetic;
    * the per-term pivot fixes the score summation order; round(6)
    * absorbs ln() ulps. */
  val sqlBm25: String =
    s"""WITH $sqlCorpusToks,
       |docs AS (SELECT id, toks, len(toks)::BIGINT AS dl FROM corpus),
       |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM docs),
       |tf AS (
       |  SELECT id, dl, term, count(*)::BIGINT AS tf
       |  FROM (SELECT id, dl, unnest(toks) AS term FROM docs)
       |  WHERE term IN ('hash', 'join', 'window')
       |  GROUP BY id, dl, term),
       |dfreq AS (SELECT term, count(DISTINCT id) AS df FROM tf GROUP BY term),
       |contrib AS (
       |  SELECT tf.id, tf.term,
       |    (ln(((s.n_docs - d.df)::DOUBLE + 0.5::DOUBLE) / (d.df::DOUBLE + 0.5::DOUBLE)
       |        + 1.0::DOUBLE)
       |     * (tf.tf::DOUBLE * (1.2::DOUBLE + 1.0::DOUBLE)))
       |    / (tf.tf::DOUBLE + 1.2::DOUBLE *
       |       (1.0::DOUBLE - 0.75::DOUBLE + 0.75::DOUBLE * tf.dl::DOUBLE / s.avgdl)) AS c
       |  FROM tf JOIN dfreq d ON tf.term = d.term CROSS JOIN stats s),
       |pv AS (
       |  SELECT id,
       |    max(CASE WHEN term = 'hash' THEN c END) AS c1,
       |    max(CASE WHEN term = 'join' THEN c END) AS c2,
       |    max(CASE WHEN term = 'window' THEN c END) AS c3
       |  FROM contrib GROUP BY id)
       |SELECT id,
       |  round(coalesce(c1, 0.0::DOUBLE) + coalesce(c2, 0.0::DOUBLE)
       |        + coalesce(c3, 0.0::DOUBLE), 6) AS score
       |FROM pv ORDER BY score DESC, id LIMIT 10""".stripMargin

  /** One entry per implemented operator from SURVEY.md §2. */

  /** Batch curation-scorecard CTE chain (LM + NB + span-dup +
    * quality/canonical), optionally filtered on the verdict rows —
    * the wave surface reuses the IDENTICAL chain with a wave
    * predicate, which is exactly what makes `scorecard_wave`
    * hash-exact against incremental scoring. */
  def scorecardSql(filter: String): String =
    s"""WITH $sqlLmScored,
         |agg AS (
         |  SELECT id, count(lp)::BIGINT AS n_scored, CAST(sum(lp) AS DOUBLE) AS lsum
         |  FROM sc GROUP BY id),
         |lmq AS (SELECT id, round(pow(10.0::DOUBLE, -lsum / n_scored), 6) AS ppl FROM agg),
         |lmb AS (SELECT id, ppl, ntile(3) OVER (ORDER BY ppl, id) AS ppl_bucket FROM lmq),
         |qual AS (
         |  SELECT id,
         |    (length(regexp_replace(sentence, '[^A-Za-z]', '', 'g'))::DOUBLE / length(sentence) > 0.5
         |     AND len(toks) >= 5 AND len(toks) <= 100000
         |     AND len(list_filter(toks, t -> t IN ('the','a','an','of','to','and','in','is','it','that')))::DOUBLE
         |         / greatest(len(toks), 1) > 0.0) AS keep_quality,
         |    id = min(id) OVER (PARTITION BY sentence) AS dedup_kept
         |  FROM corpus),
         |lab AS (
         |  SELECT id, toks,
         |    (length(regexp_replace(sentence, '[^A-Za-z]', '', 'g'))::DOUBLE / length(sentence) > 0.5
         |     AND len(toks) >= 5 AND len(toks) <= 100000
         |     AND len(list_filter(toks, t -> t IN ('the','a','an','of','to','and','in','is','it','that')))::DOUBLE
         |         / greatest(len(toks), 1) > 0.0) AS label
         |  FROM corpus),
         |ex AS (SELECT id, label, unnest(toks) AS w FROM lab),
         |voc AS (
         |  SELECT w,
         |    sum(CASE WHEN label THEN 1 ELSE 0 END)::BIGINT AS cpos,
         |    sum(CASE WHEN label THEN 0 ELSE 1 END)::BIGINT AS cneg
         |  FROM ex GROUP BY w),
         |nbtot AS (SELECT sum(cpos)::BIGINT AS npos, sum(cneg)::BIGINT AS nneg,
         |                 count(*)::BIGINT AS v FROM voc),
         |wt AS (
         |  SELECT w,
         |    CAST(round(log10((cpos + 1)::DOUBLE / (npos + v)::DOUBLE)
         |             - log10((cneg + 1)::DOUBLE / (nneg + v)::DOUBLE), 6)
         |         AS DECIMAL(18,6)) AS wgt
         |  FROM voc CROSS JOIN nbtot),
         |pri AS (
         |  SELECT CAST(round(log10(
         |      sum(CASE WHEN label THEN 1 ELSE 0 END)::DOUBLE /
         |      sum(CASE WHEN label THEN 0 ELSE 1 END)::DOUBLE), 6)
         |    AS DECIMAL(18,6)) AS prior
         |  FROM lab),
         |tf AS (SELECT id, w, count(*)::BIGINT AS tf FROM ex GROUP BY id, w),
         |docsum AS (
         |  SELECT tf.id, sum(tf.tf * wt.wgt) AS s
         |  FROM tf JOIN wt USING (w) GROUP BY tf.id),
         |nbq AS (
         |  SELECT l.id, (coalesce(d.s, 0) + p.prior) > 0 AS nb_keep
         |  FROM lab l LEFT JOIN docsum d ON l.id = d.id CROSS JOIN pri p),
         |stok AS (SELECT id, toks FROM corpus WHERE len(toks) >= 8),
         |swin AS (
         |  SELECT id, p - 1 AS pos,
         |    array_to_string(list_slice(toks, p, p + 7), chr(1)) AS wtext
         |  FROM stok, unnest(range(1, len(toks) - 6)) AS u(p)),
         |sdup AS (SELECT wtext FROM swin GROUP BY wtext HAVING count(*) >= 2),
         |smarked AS (SELECT w.id, w.pos FROM swin w JOIN sdup USING (wtext)),
         |sisl AS (
         |  SELECT id, pos,
         |    CASE WHEN pos > coalesce(max(pos + 8) OVER
         |      (PARTITION BY id ORDER BY pos
         |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
         |      THEN 1 ELSE 0 END AS new_island
         |  FROM smarked),
         |sisl2 AS (SELECT id, pos,
         |    sum(new_island) OVER (PARTITION BY id ORDER BY pos) AS island
         |  FROM sisl),
         |sst AS (
         |  SELECT id, sum(mx - mn + 8) AS dup_tokens
         |  FROM (SELECT id, island, min(pos) AS mn, max(pos) AS mx
         |        FROM sisl2 GROUP BY id, island) GROUP BY id),
         |spanq AS (
         |  SELECT c.id,
         |    CASE WHEN len(c.toks) = 0 THEN 0.0
         |         ELSE coalesce(sst.dup_tokens, 0) / len(c.toks) END AS dup_fraction
         |  FROM corpus c LEFT JOIN sst ON c.id = sst.id)
         |SELECT q.id, q.keep_quality, n.nb_keep, q.dedup_kept,
         |  b.ppl, b.ppl_bucket::BIGINT AS ppl_bucket, s.dup_fraction,
         |  (q.keep_quality AND n.nb_keep AND q.dedup_kept
         |   AND s.dup_fraction < 1.0/3.0
         |   AND coalesce(b.ppl_bucket < 3, FALSE)) AS final_keep
         |FROM qual q
         |JOIN nbq n ON q.id = n.id
         |LEFT JOIN lmb b ON q.id = b.id
         |JOIN spanq s ON q.id = s.id
         |${filter}ORDER BY q.id""".stripMargin
}
