package graft
package registry

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._
import OracleFragments._

/** Text analytics and corpus prep (north star): stats, quality, lang-id, LM scoring, scrubbing, BPE, scorecards.
  *
  * One slice of the driver registry (see [[graft.SparkEntry]], which
  * composes all slices): entry text is verbatim from the pre-split
  * SparkEntry, so the oracle gate's evidence carries over unchanged.
  */
private[graft] object TextRegistry {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // --- text analytics (north star; BASELINE.json) ---
    "text_stats" -> ((s, d) => TextAnalytics.textStats(s, d)),
    "pii_scrub" -> ((s, d) => TextAnalytics.piiScrub(s, d)),
    // C4/CCNet boilerplate-line removal over the derived corpus (see
    // TextAnalytics.scrubBoilerplate — df-based line drop, order kept)
    "boilerplate_scrub" -> ((s, d) => TextAnalytics.boilerplateLines(s, d)),
    "text_quality" -> ((s, d) => TextAnalytics.textQuality(s, d)),
    // fixed-width alpha-ratio histogram: exact integer counts +
    // cumulative, the one-pass scale path for quantile questions
    "quality_hist" -> ((s, d) => ScoreHistogram.qualityHist(s, d)),
    // tercile cut estimates from the histogram with the rank-error
    // bound MEASURED against a direct second-path recount (flags)
    "hist_cuts" -> ((s, d) => ScoreHistogram.histCuts(s, d)),
    "lang_id" -> ((s, d) => TextAnalytics.langId(s, d)),
    "lang_confusion" -> ((s, d) => TextAnalytics.langConfusion(s, d)),
    "token_counts" -> ((s, d) => TextAnalytics.tokenCounts(s, d)),
    // the per-sequence view of pack_sequences: docs contributing per
    // fixed-length training sequence, boundary cuts, exact fill
    "pack_chunks" -> ((s, d) => CorpusPrep.packChunks(s, d)),
    "doc_fingerprint" -> ((s, d) => TextAnalytics.docFingerprint(s, d)),
    "repetition_stats" -> ((s, d) => TextAnalytics.repetitionStats(s, d)),
    "tfidf_keywords" -> ((s, d) => TextAnalytics.tfidfKeywords(s, d)),
    "token_vocab" -> ((s, d) => TextAnalytics.tokenVocab(s, d)),
    // CMS sketch estimates aren't SQL-expressible; the n_exact column
    // and the over-count bound are test-pinned
    // projected to (term, n_exact, cms_in_bound): the exact head
    // hash-checks against DuckDB and the (seeded, reproducible) CMS
    // bound is oracle-asserted as a literal; the raw estimate stays on
    // the API/test surface
    "vocab_cms" -> ((s, d) => TextAnalytics.vocabCms(s, d).drop("n_cms")),
    "corpus_datacard" -> ((s, d) => TextAnalytics.corpusDatacard(s, d)),
    "bm25_search" -> ((s, d) => TextSearch.bm25Search(s, d)),
    // same scores through the persisted bucket-partitioned inverted
    // index — the scan is partition-pruned to the query terms' buckets
    "bm25_persisted" -> ((s, d) => TextSearch.bm25Persisted(s, d)),
    // hybrid retrieval: BM25 top-10 + cosine top-10 fused by
    // reciprocal-rank fusion (rank-only, score-scale-free)
    "hybrid_search_rrf" -> ((s, d) => HybridSearch.hybridSearchRrf(s, d)),
    // --- corpus prep (north star): PII scrubbing + context-window
    // chunking ---
    "pii_redact" -> ((s, d) => CorpusPrep.piiRedact(s, d)),
    "doc_chunks" -> ((s, d) => CorpusPrep.docChunks(s, d)),
    "mixture_sample" -> ((s, d) => Sampling.mixtureSample(s, d)),
    // weight-proportional sampling without replacement (Efraimidis-
    // Spirakis top-k on u^(1/w)); LCG uniforms + rounded-key rank so
    // the oracle replays the selection exactly
    "weighted_sample" -> ((s, d) => Sampling.weightedSample(s, d)),
    // exact per-stratum counts in a reproducible md5 order; the
    // thresholded 100 TB variant is test-pinned equal (SamplingSpec)
    "stratified_sample" -> ((s, d) => Sampling.stratifiedSample(s, d)),
    // the registered 100 TB path: per-stratum hash-threshold pre-filter
    // (window sort touches O(margin·k·strata) rows), EXACTLY equal to
    // the exact sampler whenever the threshold retains >= perStratum
    // rows (guaranteed for small strata, 10-sigma at margin 4 for
    // large) — so the oracle is the exact sampler's SQL verbatim
    "stratified_sample_t" -> ((s, d) => Sampling.stratifiedSampleThresholded(s, d)),
    // keyed CDC upsert into bucket-partitioned parquet: update/insert/
    // tombstone delta applied by rewriting ONLY the touched buckets;
    // the final table is read back and hash-checked against the
    // merge restated in SQL
    // the write-base → delta-merge lifecycle is memoized per session
    // (Upsert.upsertTableFor — the appendHalfStats discipline: Verify +
    // the bench's three reps share one generation, and the build cost
    // is individually timed as the `upsert_table` warm entry)
    "corpus_upsert" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      Upsert.read(s, Upsert.upsertTableFor(s, d)).orderBy(col("id").asc)
    }),
    "pack_sequences" -> ((s, d) => CorpusPrep.packSequences(s, d)),
    // composed end-to-end curation decision table (quality × dedup ×
    // split × mixture, one boolean per stage)
    "curation_decisions" -> ((s, d) => CorpusPrep.curationDecisions(s, d)),
    "profile_lineitem" -> ((s, d) => Profiling.profileLineitem(s, d)),
    // HLL twin's bound audit: exact profile columns next to the sketch,
    // hll_in_bound oracle-stated TRUE (HLL is deterministic per value
    // set). Profiling.profileLineitemApprox remains the PRODUCTION
    // no-Expand path, plan- and accuracy-pinned in ProfilingSpec
    "profile_lineitem_approx" -> ((s, d) =>
      Profiling.profileLineitemAudit(s, d).drop("n_hll")),
    "zorder_layout" -> ((s, d) => ZOrder.zorderLayout(s, d)),
  )

  val oracles: Map[String, String] = Map(

    // PII scrub: same injected-PII derivation, same regexes (restated
    // from TextAnalytics.EmailRe/PhoneRe/Ipv4Re), same email → phone →
    // IP pass order with counts on the previous pass's output
    "pii_scrub" ->
      s"""WITH p AS (
         |  SELECT doc_id,
         |    text ||
         |    CASE WHEN doc_id % 3 = 0 THEN ' reach user' || doc_id::VARCHAR
         |      || '@mail' || (doc_id % 7)::VARCHAR || '.example.com' ELSE '' END ||
         |    CASE WHEN doc_id % 4 = 0 THEN ' call ' || lpad((doc_id % 1000)::VARCHAR, 3, '0')
         |      || '-555-' || lpad((doc_id % 10000)::VARCHAR, 4, '0') ELSE '' END ||
         |    CASE WHEN doc_id % 5 = 0 THEN ' from 10.0.' || (doc_id % 256)::VARCHAR
         |      || '.' || ((doc_id * 7) % 256)::VARCHAR ELSE '' END AS text
         |  FROM documents),
         |s1 AS (SELECT doc_id, text,
         |  regexp_replace(text, '${TextAnalytics.EmailRe}', '<EMAIL>', 'g') AS t1 FROM p),
         |s2 AS (SELECT doc_id, text, t1,
         |  regexp_replace(t1, '${TextAnalytics.PhoneRe}', '<PHONE>', 'g') AS t2 FROM s1)
         |SELECT doc_id,
         |  len(regexp_extract_all(text, '${TextAnalytics.EmailRe}'))::BIGINT AS n_emails,
         |  len(regexp_extract_all(t1, '${TextAnalytics.PhoneRe}'))::BIGINT AS n_phones,
         |  len(regexp_extract_all(t2, '${TextAnalytics.Ipv4Re}'))::BIGINT AS n_ips,
         |  regexp_replace(t2, '${TextAnalytics.Ipv4Re}', '<IP>', 'g') AS clean
         |FROM s2 ORDER BY doc_id""".stripMargin,
    // boilerplate-line removal: df >= 5 lines dropped, order kept
    "boilerplate_scrub" ->
      """WITH corpus AS (
        |  SELECT doc_id,
        |    ['SUBSCRIBE TO OUR NEWSLETTER','Accept all cookies to continue',
        |     'Share this article on social media','Copyright 2024 Example Corp',
        |     'Click here to read more'][CAST(doc_id % 5 AS INT) + 1]
        |    || chr(10) || text || chr(10) ||
        |    ['All rights reserved','Terms of service apply',
        |     'Powered by Example CMS'][CAST(doc_id % 3 AS INT) + 1]
        |    || (CASE WHEN doc_id % 50 = 0
        |         THEN chr(10) || 'Limited time offer - subscribe today' ELSE '' END)
        |      AS text
        |  FROM documents),
        |parts AS (SELECT doc_id, string_split(text, chr(10)) AS p FROM corpus),
        |lines AS (
        |  SELECT doc_id, u.i - 1 AS pos, trim(p[u.i]) AS line
        |  FROM parts, LATERAL (SELECT unnest(range(1, len(p) + 1)) AS i) u),
        |dfc AS (SELECT line, count(DISTINCT doc_id) AS df FROM lines GROUP BY line),
        |kept AS (SELECT l.doc_id, l.pos, l.line
        |  FROM lines l JOIN dfc USING (line) WHERE df < 5),
        |nl AS (SELECT doc_id, count(*) AS n_lines FROM lines GROUP BY doc_id),
        |ka AS (SELECT doc_id, count(*) AS n_kept,
        |  string_agg(line, chr(10) ORDER BY pos) AS clean_text
        |  FROM kept GROUP BY doc_id)
        |SELECT nl.doc_id, nl.n_lines,
        |  coalesce(ka.n_kept, 0) AS n_kept,
        |  coalesce(ka.clean_text, '') AS clean_text
        |FROM nl LEFT JOIN ka USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "text_stats" ->
      s"""WITH $sqlCorpusToks
         |SELECT id, length(sentence) AS n_chars, len(toks) AS n_tokens,
         |  len(list_distinct(toks)) AS n_distinct_tokens,
         |  coalesce(list_max(list_transform(toks, t -> length(t))), 0) AS max_token_len
         |FROM corpus ORDER BY id""".stripMargin,
    "text_quality" ->
      s"""WITH $sqlCorpusToks
         |SELECT id,
         |  length(regexp_replace(sentence, '[^A-Za-z]', '', 'g'))::DOUBLE / length(sentence) AS alpha_ratio,
         |  length(regexp_replace(sentence, '[^0-9]', '', 'g'))::DOUBLE / length(sentence) AS digit_ratio,
         |  length(regexp_replace(sentence, '[^ ]', '', 'g'))::DOUBLE / length(sentence) AS space_ratio,
         |  len(list_filter(toks, t -> t IN ('the','a','an','of','to','and','in','is','it','that')))::DOUBLE
         |    / greatest(len(toks), 1) AS stopword_ratio,
         |  (length(regexp_replace(sentence, '[^A-Za-z]', '', 'g'))::DOUBLE / length(sentence) > 0.5
         |   AND len(toks) >= 5 AND len(toks) <= 100000
         |   AND len(list_filter(toks, t -> t IN ('the','a','an','of','to','and','in','is','it','that')))::DOUBLE
         |       / greatest(len(toks), 1) > 0.0) AS keep
         |FROM corpus ORDER BY id""".stripMargin,
    // fixed-width alpha-ratio histogram: bin = least(floor(score*20), 19)
    // rounds the same IEEE double once on both sides; counts and the
    // cumulative are exact integers — hash-exact
    "quality_hist" ->
      s"""WITH $sqlCorpusToks,
         |s AS (
         |  SELECT LEAST(FLOOR((length(regexp_replace(sentence, '[^A-Za-z]', '', 'g'))::DOUBLE
         |    / length(sentence)) * 20), 19)::INT AS bin
         |  FROM corpus),
         |hist AS (SELECT bin, count(*)::BIGINT AS n FROM s GROUP BY bin)
         |SELECT bin, n, SUM(n) OVER (ORDER BY bin)::BIGINT AS cum
         |FROM hist ORDER BY bin""".stripMargin,
    // tercile cuts from the histogram, flags recomputed end-to-end:
    // target ranks floor(n/3) / floor(2n/3), cut bin = first bin whose
    // cumulative reaches the target, estimate = its upper edge, and
    // the direct second-path recount with the bin-population rank
    // bound — every value and flag derived identically in both engines
    "hist_cuts" ->
      s"""WITH $sqlCorpusToks,
         |s AS (
         |  SELECT LEAST(FLOOR((length(regexp_replace(sentence, '[^A-Za-z]', '', 'g'))::DOUBLE
         |    / length(sentence)) * 20), 19)::INT AS bin
         |  FROM corpus),
         |hist AS (SELECT bin, count(*)::BIGINT AS n FROM s GROUP BY bin),
         |h AS (SELECT bin, n, SUM(n) OVER (ORDER BY bin)::BIGINT AS cum FROM hist),
         |t AS (SELECT MAX(cum) AS nd, MAX(cum) // 3 AS t1, 2 * MAX(cum) // 3 AS t2 FROM h),
         |c1 AS (SELECT MIN(bin) AS b FROM h, t WHERE cum >= t1),
         |c2 AS (SELECT MIN(bin) AS b FROM h, t WHERE cum >= t2),
         |k1 AS (SELECT h.bin, h.n, h.cum FROM h, c1 WHERE h.bin = c1.b),
         |k2 AS (SELECT h.bin, h.n, h.cum FROM h, c2 WHERE h.bin = c2.b),
         |d AS (
         |  SELECT SUM(CASE WHEN s.bin <= c1.b THEN 1 ELSE 0 END)::BIGINT AS le1,
         |         SUM(CASE WHEN s.bin <= c2.b THEN 1 ELSE 0 END)::BIGINT AS le2
         |  FROM s, c1, c2)
         |SELECT t.nd AS n_docs, t.t1, t.t2,
         |  (k1.bin + 1)::DOUBLE / 20 AS c1_est,
         |  (k2.bin + 1)::DOUBLE / 20 AS c2_est,
         |  (d.le1 = k1.cum AND d.le2 = k2.cum) AS faithful_ok,
         |  (d.le1 >= t.t1 AND d.le1 - t.t1 <= k1.n) AS rank1_bound_ok,
         |  (d.le2 >= t.t2 AND d.le2 - t.t2 <= k2.n) AS rank2_bound_ok,
         |  ((k1.bin + 1)::DOUBLE / 20 <= (k2.bin + 1)::DOUBLE / 20) AS monotone_ok
         |FROM t, c1, c2, k1, k2, d""".stripMargin,
    "lang_id" ->
      s"""WITH $sqlCorpusToks,
         |hits AS (
         |  SELECT id,
         |    len(list_filter(toks, t -> t IN ('the','a','of','to','and','in','is','that','it','for'))) AS en_hits,
         |    len(list_filter(toks, t -> t IN ('der','die','das','und','ist','nicht','ein','zu','mit','auf'))) AS de_hits,
         |    len(list_filter(toks, t -> t IN ('el','la','de','que','y','los','las','un','una','por'))) AS es_hits,
         |    len(list_filter(toks, t -> t IN ('le','la','les','et','est','une','dans','pour','que','pas'))) AS fr_hits
         |  FROM corpus)
         |SELECT id, en_hits, de_hits, es_hits, fr_hits,
         |  CASE WHEN greatest(en_hits, de_hits, es_hits, fr_hits) = 0 THEN 'und'
         |       WHEN en_hits = greatest(en_hits, de_hits, es_hits, fr_hits) THEN 'en'
         |       WHEN de_hits = greatest(en_hits, de_hits, es_hits, fr_hits) THEN 'de'
         |       WHEN es_hits = greatest(en_hits, de_hits, es_hits, fr_hits) THEN 'es'
         |       ELSE 'fr' END AS lang_pred
         |FROM hits ORDER BY id""".stripMargin,
    "lang_confusion" ->
      s"""WITH $sqlCorpusToks,
         |hits AS (
         |  SELECT id,
         |    len(list_filter(toks, t -> t IN ('the','a','of','to','and','in','is','that','it','for'))) AS en_hits,
         |    len(list_filter(toks, t -> t IN ('der','die','das','und','ist','nicht','ein','zu','mit','auf'))) AS de_hits,
         |    len(list_filter(toks, t -> t IN ('el','la','de','que','y','los','las','un','una','por'))) AS es_hits,
         |    len(list_filter(toks, t -> t IN ('le','la','les','et','est','une','dans','pour','que','pas'))) AS fr_hits
         |  FROM corpus),
         |pred AS (
         |  SELECT id,
         |    CASE WHEN greatest(en_hits, de_hits, es_hits, fr_hits) = 0 THEN 'und'
         |         WHEN en_hits = greatest(en_hits, de_hits, es_hits, fr_hits) THEN 'en'
         |         WHEN de_hits = greatest(en_hits, de_hits, es_hits, fr_hits) THEN 'de'
         |         WHEN es_hits = greatest(en_hits, de_hits, es_hits, fr_hits) THEN 'es'
         |         ELSE 'fr' END AS lang_pred
         |  FROM hits)
         |SELECT d.lang, p.lang_pred, count(*)::BIGINT AS n
         |FROM documents d JOIN pred p ON d.doc_id = p.id
         |WHERE length(trim(d.text)) > 0
         |GROUP BY d.lang, p.lang_pred
         |ORDER BY d.lang, p.lang_pred""".stripMargin,
    // per-sequence packing view: offsets restated as the plain
    // cumulative window (exactly what the blocked prefix sum avoids
    // at scale), then the lateral chunk expansion — exact integers
    // throughout, hash-exact. Zero-token docs excluded on both sides
    // (they occupy no space; their absence moves no offset).
    "pack_chunks" ->
      s"""WITH $sqlCorpusToks,
         |d AS (SELECT id, len(toks)::BIGINT AS n_tokens FROM corpus WHERE len(toks) > 0),
         |c AS (
         |  SELECT id, n_tokens,
         |    coalesce(sum(n_tokens) OVER (ORDER BY id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
         |      AS start_offset
         |  FROM d),
         |e AS (
         |  SELECT c.id, c.n_tokens, c.start_offset, t.ch AS chunk_id
         |  FROM c, LATERAL unnest(generate_series(c.start_offset // 512,
         |    (c.start_offset + c.n_tokens - 1) // 512)) t(ch))
         |SELECT chunk_id::BIGINT AS chunk_id, count(*)::BIGINT AS n_docs,
         |  SUM(CASE WHEN start_offset < chunk_id * 512
         |        OR start_offset + n_tokens > (chunk_id + 1) * 512 THEN 1 ELSE 0 END)::BIGINT AS n_cut_docs,
         |  SUM(LEAST(start_offset + n_tokens, (chunk_id + 1) * 512)
         |    - GREATEST(start_offset, chunk_id * 512))::BIGINT AS n_tokens_filled
         |FROM e GROUP BY chunk_id ORDER BY chunk_id""".stripMargin,
    "token_counts" ->
      """SELECT doc_id AS id,
        |  len(list_filter(regexp_split_to_array(trim(text), '\s+'), t -> length(t) > 0)) AS ws_tokens,
        |  len(regexp_extract_all(trim(text), '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+')) AS bpe_tokens
        |FROM documents WHERE length(trim(text)) > 0
        |ORDER BY id""".stripMargin,
    "doc_fingerprint" ->
      s"""WITH $sqlCorpusToks
         |SELECT id,
         |  md5(coalesce(list_aggregate(toks, 'string_agg', ' '), '')) AS md5_norm,
         |  CASE WHEN len(toks) >= 3
         |    THEN list_min(list_transform(range(1, len(toks) - 1),
         |           i -> md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])))
         |    ELSE md5(coalesce(list_aggregate(toks, 'string_agg', ' '), '')) END AS min_shingle_md5
         |FROM corpus ORDER BY id""".stripMargin,
    // token/bigram repetition: unnest + group mirrors the Spark
    // explode/lead construction; ratios are single double divisions
    "repetition_stats" ->
      s"""WITH $sqlCorpusToks,
         |tokc AS (
         |  SELECT id, tk, count(*) AS c
         |  FROM (SELECT id, unnest(toks) AS tk FROM corpus) GROUP BY id, tk),
         |tok_agg AS (
         |  SELECT id, sum(c) AS n_tokens, max(c) AS top_tok FROM tokc GROUP BY id),
         |bgc AS (
         |  SELECT id, bg, count(*) AS c
         |  FROM (SELECT id, unnest(list_transform(range(1, len(toks)),
         |                 i -> toks[i] || ' ' || toks[i+1])) AS bg
         |        FROM corpus) GROUP BY id, bg),
         |bg_agg AS (
         |  SELECT id, sum(c) AS n_bigrams, count(*) AS n_distinct_bg,
         |    max(c) AS top_bg FROM bgc GROUP BY id)
         |SELECT t.id, t.n_tokens::BIGINT AS n_tokens,
         |  t.top_tok::DOUBLE / t.n_tokens::DOUBLE AS top_token_frac,
         |  coalesce(b.n_bigrams, 0)::BIGINT AS n_bigrams,
         |  coalesce(1.0::DOUBLE - b.n_distinct_bg::DOUBLE / b.n_bigrams::DOUBLE,
         |    0.0::DOUBLE) AS dup_bigram_frac,
         |  coalesce(b.top_bg::DOUBLE / b.n_bigrams::DOUBLE, 0.0::DOUBLE) AS top_bigram_frac
         |FROM tok_agg t LEFT JOIN bg_agg b USING (id) ORDER BY id""".stripMargin,
    // tf-idf scores rounded to 6 decimals BEFORE the rank window on
    // both sides, so rank order is decided on engine-identical values
    "tfidf_keywords" ->
      s"""WITH $sqlCorpusToks,
         |nd AS (SELECT count(*) AS n_docs FROM corpus),
         |tf AS (
         |  SELECT id, term, count(*)::BIGINT AS tf
         |  FROM (SELECT id, unnest(toks) AS term FROM corpus)
         |  GROUP BY id, term),
         |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         |scored AS (
         |  SELECT tf.id, tf.term,
         |    round(tf.tf * ln(nd.n_docs::DOUBLE / d.df), 6) AS tfidf
         |  FROM tf JOIN dfreq d ON tf.term = d.term CROSS JOIN nd),
         |ranked AS (
         |  SELECT id, term, tfidf,
         |    row_number() OVER (PARTITION BY id ORDER BY tfidf DESC, term ASC) AS rank
         |  FROM scored)
         |SELECT id, rank::BIGINT AS rank, term, tfidf FROM ranked
         |WHERE rank <= 3 ORDER BY id, rank""".stripMargin,
    "token_vocab" ->
      s"""WITH $sqlCorpusToks
         |SELECT term, count(*)::BIGINT AS n_occurrences,
         |  count(DISTINCT id)::BIGINT AS n_docs
         |FROM (SELECT id, unnest(toks) AS term FROM corpus)
         |GROUP BY term ORDER BY n_occurrences DESC, term LIMIT 25""".stripMargin,
    // the exact head hash-checks; the CMS bound (never-under, over by
    // <= 5·eps·N — seeded, reproducible) is asserted as a literal
    "vocab_cms" ->
      s"""WITH $sqlCorpusToks
         |SELECT term, count(*)::BIGINT AS n_exact, TRUE AS cms_in_bound
         |FROM (SELECT id, unnest(toks) AS term FROM corpus)
         |GROUP BY term ORDER BY n_exact DESC, term LIMIT 25""".stripMargin,
    "corpus_datacard" ->
      """WITH docs AS (
        |  SELECT lang, source,
        |    len(list_filter(regexp_split_to_array(lower(trim(text)), '[^a-z0-9]+'),
        |        t -> length(t) > 0))::BIGINT AS n_tokens
        |  FROM documents WHERE length(trim(text)) > 0),
        |g AS (
        |  SELECT lang, source, count(*) AS n_docs,
        |    sum(n_tokens) AS total_tokens, avg(n_tokens) AS avg_tokens
        |  FROM docs GROUP BY lang, source),
        |t AS (SELECT sum(n_docs) AS corpus_docs FROM g)
        |SELECT lang, source, n_docs::BIGINT AS n_docs,
        |  n_docs::DOUBLE / corpus_docs::DOUBLE AS doc_share,
        |  total_tokens::BIGINT AS total_tokens, avg_tokens
        |FROM g CROSS JOIN t ORDER BY lang, source""".stripMargin,
    "bm25_search" -> sqlBm25,
    // RRF fusion of the two oracle-exact hit lists: ranks from their
    // total orders, fused score = two exact-integer reciprocals
    "hybrid_search_rrf" ->
      s"""WITH lex AS (
         |  SELECT id, row_number() OVER (ORDER BY score DESC, id ASC) AS lex_rank
         |  FROM ($sqlBm25)),
         |sem AS (
         |  SELECT vec_id AS id,
         |    row_number() OVER (ORDER BY sim DESC, vec_id ASC) AS sem_rank
         |  FROM (
         |    SELECT vec_id, s AS sim FROM (
         |      SELECT b.vec_id AS vec_id,
         |        ${sqlDot("a.embedding", "b.embedding")} /
         |          (sqrt(${sqlDot("a.embedding", "a.embedding")}) * sqrt(${sqlDot("b.embedding", "b.embedding")})) AS s
         |      FROM embeddings a, embeddings b
         |      WHERE a.vec_id = 0 AND b.vec_id <> 0) t
         |    ORDER BY s DESC, vec_id ASC LIMIT 10))
         |SELECT coalesce(l.id, m.id) AS id,
         |  l.lex_rank::BIGINT AS lex_rank, m.sem_rank::BIGINT AS sem_rank,
         |  coalesce(1.0::DOUBLE / (60 + l.lex_rank), 0.0::DOUBLE)
         |    + coalesce(1.0::DOUBLE / (60 + m.sem_rank), 0.0::DOUBLE) AS rrf
         |FROM lex l FULL OUTER JOIN sem m ON l.id = m.id
         |ORDER BY rrf DESC, id ASC""".stripMargin,
    // the persisted-index path must produce the IDENTICAL ranking —
    // same tf/df/stats, same arithmetic, different scan
    "bm25_persisted" -> sqlBm25,
    // PII scrubbing: identical patterns (common Java-regex/RE2 subset),
    // counts over the raw text, replacement order email -> SSN -> IP
    "pii_redact" ->
      """SELECT doc_id AS id,
        |  len(regexp_extract_all(trim(text), '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::BIGINT AS n_emails,
        |  len(regexp_extract_all(trim(text), '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b'))::BIGINT AS n_ssns,
        |  len(regexp_extract_all(trim(text), '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b'))::BIGINT AS n_ips,
        |  regexp_replace(regexp_replace(regexp_replace(trim(text),
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b', '<SSN>', 'g'),
        |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g') AS clean_text
        |FROM documents WHERE length(trim(text)) > 0
        |ORDER BY id""".stripMargin,
    // fixed 32-token windows; list_slice is 1-based inclusive, same
    // clipping as Spark's slice(start, length)
    "doc_chunks" ->
      s"""WITH $sqlCorpusToks,
         |docs AS (
         |  SELECT id, toks, len(toks)::BIGINT AS n_tokens
         |  FROM corpus WHERE len(toks) > 0),
         |ch AS (
         |  SELECT id, n_tokens, toks,
         |    unnest(range(0, (n_tokens + 31) // 32)) AS chunk_idx
         |  FROM docs)
         |SELECT id, chunk_idx::BIGINT AS chunk_idx,
         |  least(32, n_tokens - chunk_idx * 32)::BIGINT AS n_chunk_tokens,
         |  array_to_string(list_slice(toks, (chunk_idx * 32 + 1)::BIGINT,
         |    (chunk_idx * 32 + 32)::BIGINT), ' ') AS chunk_text
         |FROM ch ORDER BY id, chunk_idx""".stripMargin,
    // exact stratified sample: the md5 rank order is engine-identical,
    // so DuckDB replays the per-stratum selection row-for-row
    "stratified_sample" ->
      """SELECT id, lang, rank_in_stratum FROM (
        |  SELECT doc_id AS id, lang,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5('strat' || doc_id::VARCHAR), doc_id)
        |      AS rank_in_stratum
        |  FROM documents) t
        |WHERE rank_in_stratum <= 50
        |ORDER BY lang, rank_in_stratum""".stripMargin,
    // thresholded scale twin: exactly equal to the exact sampler by
    // the margin-covers contract (SamplingSpec pins it; the threshold
    // keeps the lowest hashes, the rank order is the same hash
    // ascending) — the exact sampler's oracle applies verbatim
    "stratified_sample_t" ->
      """SELECT id, lang, rank_in_stratum FROM (
        |  SELECT doc_id AS id, lang,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5('strat' || doc_id::VARCHAR), doc_id)
        |      AS rank_in_stratum
        |  FROM documents) t
        |WHERE rank_in_stratum <= 50
        |ORDER BY lang, rank_in_stratum""".stripMargin,
    // keyed upsert: the merge semantics restated declaratively —
    // surviving base rows (key not replaced), updates win per key,
    // inserts append, tombstoned keys vanish
    "corpus_upsert" ->
      """WITH corpus AS (
        |  SELECT doc_id AS id, trim(text) AS sentence FROM documents
        |  WHERE length(trim(text)) > 0),
        |kept AS (
        |  SELECT id,
        |    CASE WHEN id % 7 = 0 AND id % 13 <> 0
        |         THEN sentence || ' [rev2]' ELSE sentence END AS sentence
        |  FROM corpus WHERE id % 13 <> 0),
        |ins AS (
        |  SELECT id + 1000000 AS id,
        |    'appended doc ' || id::VARCHAR AS sentence
        |  FROM corpus WHERE id % 11 = 0)
        |SELECT id, sentence FROM kept
        |UNION ALL SELECT id, sentence FROM ins
        |ORDER BY id""".stripMargin,
    // the composed curation table: every stage's predicate is the
    // same SQL its standalone query uses
    "curation_decisions" ->
      """WITH docs AS (
        |  SELECT doc_id AS id, trim(text) AS sentence, source,
        |    list_filter(regexp_split_to_array(lower(trim(text)), '[^a-z0-9]+'),
        |                t -> length(t) > 0) AS toks
        |  FROM documents WHERE length(trim(text)) > 0),
        |d AS (
        |  SELECT id,
        |    (length(regexp_replace(sentence, '[^A-Za-z]', '', 'g'))::DOUBLE / length(sentence) > 0.5
        |     AND len(toks) >= 5 AND len(toks) <= 100000
        |     AND len(list_filter(toks, t -> t IN ('the','a','an','of','to','and','in','is','it','that')))::DOUBLE
        |         / greatest(len(toks), 1) > 0.0) AS keep_quality,
        |    id = min(id) OVER (PARTITION BY sentence) AS dedup_kept,
        |    CASE WHEN substr(md5('graft' || id::VARCHAR), 1, 2) < 'cd' THEN 'train'
        |         WHEN substr(md5('graft' || id::VARCHAR), 1, 2) < 'e7' THEN 'val'
        |         ELSE 'test' END AS split,
        |    substr(md5('mix' || id::VARCHAR), 1, 2) <
        |      (CASE WHEN source = 'src0' THEN 'cd'
        |            WHEN source = 'src1' THEN '80'
        |            WHEN source = 'src2' THEN '40'
        |            ELSE '1a' END) AS mix_keep
        |  FROM docs)
        |SELECT id, keep_quality, dedup_kept, split, mix_keep,
        |  (keep_quality AND dedup_kept AND mix_keep) AS final_keep
        |FROM d ORDER BY id""".stripMargin,
    // one wide aggregate unpivoted to rows; timestamps profile as
    // epoch micros so min/max stay double-typed
    "profile_lineitem" ->
      """WITH a AS (SELECT
        |  count(*) AS n_rows,
        |  count(l_orderkey) c1, count(DISTINCT l_orderkey) d1,
        |    min(l_orderkey)::DOUBLE mn1, max(l_orderkey)::DOUBLE mx1,
        |  count(l_quantity) c2, count(DISTINCT l_quantity) d2,
        |    min(l_quantity)::DOUBLE mn2, max(l_quantity)::DOUBLE mx2,
        |  count(l_extendedprice) c3, count(DISTINCT l_extendedprice) d3,
        |    min(l_extendedprice)::DOUBLE mn3, max(l_extendedprice)::DOUBLE mx3,
        |  count(l_discount) c4, count(DISTINCT l_discount) d4,
        |    min(l_discount)::DOUBLE mn4, max(l_discount)::DOUBLE mx4,
        |  count(l_shipdate) c5, count(DISTINCT l_shipdate) d5,
        |    epoch_us(min(l_shipdate))::DOUBLE mn5, epoch_us(max(l_shipdate))::DOUBLE mx5,
        |  count(l_returnflag) c6, count(DISTINCT l_returnflag) d6
        |  FROM lineitem)
        |SELECT col_name, n_null::BIGINT AS n_null, n_distinct::BIGINT AS n_distinct,
        |  min_num, max_num FROM (
        |  SELECT 'l_orderkey' AS col_name, n_rows - c1 AS n_null, d1 AS n_distinct, mn1 AS min_num, mx1 AS max_num FROM a
        |  UNION ALL SELECT 'l_quantity', n_rows - c2, d2, mn2, mx2 FROM a
        |  UNION ALL SELECT 'l_extendedprice', n_rows - c3, d3, mn3, mx3 FROM a
        |  UNION ALL SELECT 'l_discount', n_rows - c4, d4, mn4, mx4 FROM a
        |  UNION ALL SELECT 'l_shipdate', n_rows - c5, d5, mn5, mx5 FROM a
        |  UNION ALL SELECT 'l_returnflag', n_rows - c6, d6, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE) FROM a)
        |ORDER BY col_name""".stripMargin,
    // the HLL audit keeps the exact profile columns (same SQL) and the
    // sketch bound collapses to a literal: HLL++ is a deterministic
    // function of the value set, so in-bound at this data is in-bound
    // every run
    "profile_lineitem_approx" ->
      """WITH a AS (SELECT
        |  count(*) AS n_rows,
        |  count(l_orderkey) c1, count(DISTINCT l_orderkey) d1,
        |    min(l_orderkey)::DOUBLE mn1, max(l_orderkey)::DOUBLE mx1,
        |  count(l_quantity) c2, count(DISTINCT l_quantity) d2,
        |    min(l_quantity)::DOUBLE mn2, max(l_quantity)::DOUBLE mx2,
        |  count(l_extendedprice) c3, count(DISTINCT l_extendedprice) d3,
        |    min(l_extendedprice)::DOUBLE mn3, max(l_extendedprice)::DOUBLE mx3,
        |  count(l_discount) c4, count(DISTINCT l_discount) d4,
        |    min(l_discount)::DOUBLE mn4, max(l_discount)::DOUBLE mx4,
        |  count(l_shipdate) c5, count(DISTINCT l_shipdate) d5,
        |    epoch_us(min(l_shipdate))::DOUBLE mn5, epoch_us(max(l_shipdate))::DOUBLE mx5,
        |  count(l_returnflag) c6, count(DISTINCT l_returnflag) d6
        |  FROM lineitem)
        |SELECT col_name, n_null::BIGINT AS n_null, n_distinct::BIGINT AS n_distinct,
        |  min_num, max_num, TRUE AS hll_in_bound FROM (
        |  SELECT 'l_orderkey' AS col_name, n_rows - c1 AS n_null, d1 AS n_distinct, mn1 AS min_num, mx1 AS max_num FROM a
        |  UNION ALL SELECT 'l_quantity', n_rows - c2, d2, mn2, mx2 FROM a
        |  UNION ALL SELECT 'l_extendedprice', n_rows - c3, d3, mn3, mx3 FROM a
        |  UNION ALL SELECT 'l_discount', n_rows - c4, d4, mn4, mx4 FROM a
        |  UNION ALL SELECT 'l_shipdate', n_rows - c5, d5, mn5, mx5 FROM a
        |  UNION ALL SELECT 'l_returnflag', n_rows - c6, d6, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE) FROM a)
        |ORDER BY col_name""".stripMargin,
    // Morton code mirrored term-for-term (pure integer bit ops)
    "zorder_layout" ->
      s"""SELECT l_orderkey, l_linenumber,
         |  ${operators.ZOrder.zValueSql("(l_orderkey % 65536)", "(l_partkey % 65536)")} AS z
         |FROM lineitem
         |ORDER BY z, l_orderkey, l_linenumber LIMIT 100""".stripMargin,
    // packing offsets: DuckDB's single global running sum is the
    // semantic spec; the engine computes it as a two-phase parallel
    // prefix sum (no global row window)
    "pack_sequences" ->
      s"""WITH $sqlCorpusToks,
         |d AS (SELECT id, len(toks)::BIGINT AS n_tokens FROM corpus),
         |c AS (
         |  SELECT id, n_tokens,
         |    coalesce(sum(n_tokens) OVER (ORDER BY id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
         |      AS start_offset
         |  FROM d)
         |SELECT id, n_tokens, start_offset, start_offset // 512 AS seq_id
         |FROM c ORDER BY id""".stripMargin,
    // per-source mixture downsampling audit: same md5 hex-threshold
    // mechanism as sample_split, thresholds varying by source
    "mixture_sample" ->
      """SELECT source, count(*)::BIGINT AS n_total,
        |  sum(CASE WHEN substr(md5('mix' || doc_id::VARCHAR), 1, 2) <
        |    (CASE WHEN source = 'src0' THEN 'cd'
        |          WHEN source = 'src1' THEN '80'
        |          WHEN source = 'src2' THEN '40'
        |          ELSE '1a' END)
        |    THEN 1 ELSE 0 END)::BIGINT AS n_kept
        |FROM documents GROUP BY source
        |ORDER BY source""".stripMargin,
    // Efraimidis-Spirakis weighted sampling without replacement:
    // deterministic two-round multiplicative-hash uniforms (pure
    // BIGINT, overflow-free at any id — round 2 folds in
    // doc_id div 2^31-1 so same-residue ids decorrelate), key =
    // ln(u)/w rounded to 9 places (absorbing ln ulps) with a doc_id
    // tiebreak; the output carries membership only
    "weighted_sample" ->
      """WITH keyed AS (
        |  SELECT doc_id, source, n_chars,
        |    round(ln((((doc_id // 2147483647
        |                + (doc_id % 2147483647) * 2654435761 % 2147483647)
        |               % 2147483647) * 2246822519 % 2147483647 + 1)::DOUBLE
        |             / 2147483648.0)
        |          / greatest(n_chars, 1)::DOUBLE, 9) AS es_key
        |  FROM documents),
        |top AS (
        |  SELECT doc_id, source, n_chars FROM keyed
        |  ORDER BY es_key DESC, doc_id ASC LIMIT 200)
        |SELECT doc_id, source, n_chars FROM top ORDER BY doc_id""".stripMargin,
  )
}
