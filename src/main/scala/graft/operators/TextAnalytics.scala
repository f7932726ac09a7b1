package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Ingest

/** Text-analysis operators over the `documents` corpus — the
  * LLM-data-pipeline extension surface (BASELINE.json north star;
  * absent from the reference, whose only text processing is
  * trim/split ingest, app.py:199-223). Everything here is a pure
  * narrow map over the corpus — no shuffle, embarrassingly parallel
  * at any scale — built from codegen'd built-ins (no UDFs).
  *
  * Tokenization matches the engine's embedder (Embedder.scala):
  * lowercase, split on non-[a-z0-9] runs — one definition everywhere
  * so token counts, fingerprints, minhash and embeddings agree.
  */
object TextAnalytics {

  /** Lowercased [a-z0-9]+ tokens of a text column (empties removed).
    *
    * `array_remove(_, "")` rather than `filter(_, length > 0)`: the
    * two are equivalent here (splitting on separator RUNS can only
    * produce empty strings, never nulls or whitespace tokens), and
    * array_remove is a codegen'd built-in while filter is an
    * interpreted higher-order function — this column feeds every text
    * operator plus the MinHash pipeline, so it stays on the codegen
    * path. */
  def tokens(text: Column): Column =
    array_remove(split(lower(text), "[^a-z0-9]+"), "")

  /** Per-document surface statistics: chars, tokens, distinct tokens,
    * longest token. */
  def textStats(spark: SparkSession, sfDir: String): DataFrame = {
    Ingest.corpusFromDocuments(spark, sfDir)
      .withColumn("toks", tokens(col("sentence")))
      .select(
        col("id"),
        length(col("sentence")).cast("long").as("n_chars"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(array_distinct(col("toks"))).cast("long").as("n_distinct_tokens"),
        coalesce(array_max(transform(col("toks"), t => length(t))), lit(0))
          .cast("long").as("max_token_len"))
      .orderBy(col("id").asc)
  }

  /** The stopword list the quality verdict counts against (tiny and
    * hard-coded so the DuckDB oracle mirrors it verbatim). */
  val QualityStopwords: Seq[String] =
    Seq("the", "a", "an", "of", "to", "and", "in", "is", "it", "that")

  /** The engine's single keep/drop quality predicate over a trimmed
    * non-empty text column — shared by `text_quality`,
    * `curation_decisions`, and the streaming curation pipeline so the
    * three can never drift apart. */
  def qualityKeep(sentence: Column): Column = {
    val toks = tokens(sentence)
    val alphaRatio =
      length(regexp_replace(sentence, "[^A-Za-z]", "")).cast("double") /
        length(sentence)
    val stopwordRatio =
      size(filter(toks, t => t.isin(QualityStopwords: _*))).cast("double") /
        greatest(size(toks), lit(1))
    alphaRatio > 0.5 && size(toks) >= 5 && size(toks) <= 100000 &&
      stopwordRatio > 0.0
  }

  /** Per-document quality signals (the length/punctuation/stopword
    * heuristics a pretraining filter runs): character-class ratios and
    * a boolean keep/drop verdict. Ratios are exact integer-count /
    * length divisions, so the DuckDB oracle reproduces them bit-for-bit. */
  def textQuality(spark: SparkSession, sfDir: String): DataFrame = {
    val stopwords = QualityStopwords
    Ingest.corpusFromDocuments(spark, sfDir)
      .withColumn("toks", tokens(col("sentence")))
      .select(
        col("id"),
        (length(regexp_replace(col("sentence"), "[^A-Za-z]", "")).cast("double") /
          length(col("sentence"))).as("alpha_ratio"),
        (length(regexp_replace(col("sentence"), "[^0-9]", "")).cast("double") /
          length(col("sentence"))).as("digit_ratio"),
        (length(regexp_replace(col("sentence"), "[^ ]", "")).cast("double") /
          length(col("sentence"))).as("space_ratio"),
        (size(filter(col("toks"), t => t.isin(stopwords: _*))).cast("double") /
          greatest(size(col("toks")), lit(1))).as("stopword_ratio"),
        col("toks"))
      .withColumn("keep",
        col("alpha_ratio") > 0.5 && size(col("toks")) >= 5 &&
          size(col("toks")) <= 100000 && col("stopword_ratio") > 0.0)
      .drop("toks")
      .orderBy(col("id").asc)
  }

  /** Stopword lists for the language-ID heuristic; kept tiny and
    * hard-coded so the DuckDB oracle can mirror them verbatim. */
  val LangStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "to", "and", "in", "is", "that", "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "auf"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "las", "un", "una", "por"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "dans", "pour", "que", "pas"))

  /** Language identification by stopword-hit counting (the classic
    * n-gram/stopword heuristic; a real model is out of scope in a
    * zero-egress JVM). Deterministic arg-max with first-listed-wins
    * tie-break; zero hits anywhere → 'und' (undetermined). */
  def langId(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Ingest.corpusFromDocuments(spark, sfDir)
      .withColumn("toks", tokens(col("sentence")))
    val withHits = LangStopwords.foldLeft(base) { case (df, (lang, words)) =>
      df.withColumn(s"${lang}_hits",
        size(filter(col("toks"), t => t.isin(words: _*))).cast("long"))
    }
    val hitCols = LangStopwords.map { case (l, _) => col(s"${l}_hits") }
    val best = LangStopwords.map { case (lang, _) =>
      (col(s"${lang}_hits") === greatest(hitCols: _*)) -> lit(lang)
    }
    val pred = best.foldRight(lit("und")) { case ((cond, lang), els) =>
      when(cond, lang).otherwise(els)
    }
    withHits
      .withColumn("lang_pred",
        when(greatest(hitCols: _*) === 0, lit("und")).otherwise(pred))
      .select(col("id") +: hitCols :+ col("lang_pred"): _*)
      .orderBy(col("id").asc)
  }

  /** Language-ID confusion matrix: declared `lang` column vs the
    * heuristic's prediction, with group counts — the audit a pipeline
    * runs to decide whether to trust source-declared language tags.
    * One narrow prediction pass + one groupBy shuffle on the tiny
    * (lang, lang_pred) key space. */
  def langConfusion(spark: SparkSession, sfDir: String): DataFrame = {
    val pred = langId(spark, sfDir).select(col("id"), col("lang_pred"))
    graft.Tables.documents(spark, sfDir)
      .where(length(trim(col("text"))) > 0)
      .select(col("doc_id").as("id"), col("lang"))
      .join(pred, "id")
      .groupBy(col("lang"), col("lang_pred"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang").asc, col("lang_pred").asc)
  }

  /** Token counting two ways: whitespace words and a BPE-ish
    * pre-tokenizer regex (letter runs | digit runs | symbol runs —
    * the shape GPT-style byte-pair pre-tokenizers use). */
  def tokenCounts(spark: SparkSession, sfDir: String): DataFrame = {
    Ingest.corpusFromDocuments(spark, sfDir)
      .select(
        col("id"),
        size(filter(split(col("sentence"), "\\s+"), t => length(t) > 0))
          .cast("long").as("ws_tokens"),
        size(regexp_extract_all(col("sentence"),
          lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+"), lit(0)))
          .cast("long").as("bpe_tokens"))
      .orderBy(col("id").asc)
  }

  /** Gopher/C4-style repetition signals: the fraction of mass in the
    * single most frequent token, and duplicate / most-frequent-bigram
    * fractions — the "is this boilerplate or a word loop?" filters a
    * pretraining pipeline runs after the surface-quality pass.
    *
    * Shape: one explode to token rows, bigrams built relationally with
    * a lead() window over (id, pos) — NOT a `transform(sequence, slice)`
    * HOF, which is CodegenFallback and measured 5× slower on the same
    * shingle workload (Dedup.shingleRows postmortem) — then two narrow
    * per-id aggregations. Everything partitions by doc id; no
    * cross-document traffic at any scale. Ratios are single double
    * divisions, reproduced bit-for-bit by the DuckDB oracle. */
  def repetitionStats(spark: SparkSession, sfDir: String): DataFrame =
    repetitionStatsCorpus(Ingest.corpusFromDocuments(spark, sfDir))

  def repetitionStatsCorpus(corpus: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tokRows = corpus
      .withColumn("toks", tokens(col("sentence")))
      .select(col("id"), posexplode(col("toks")).as(Seq("pos", "tk")))
    val wPos = Window.partitionBy(col("id")).orderBy(col("pos"))
    // token-level: total, distinct, max single-token count
    val tokStats = tokRows
      .groupBy(col("id"), col("tk")).agg(count(lit(1)).as("c"))
      .groupBy(col("id")).agg(
        sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        max(col("c")).as("top_tok"))
    // bigram-level: same aggregates over adjacent-token pairs
    val bigramStats = tokRows
      .withColumn("nxt", lead(col("tk"), 1).over(wPos))
      .where(col("nxt").isNotNull)
      .select(col("id"), concat_ws(" ", col("tk"), col("nxt")).as("bg"))
      .groupBy(col("id"), col("bg")).agg(count(lit(1)).as("c"))
      .groupBy(col("id")).agg(
        sum(col("c")).as("n_bigrams"),
        count(lit(1)).as("n_distinct_bg"),
        max(col("c")).as("top_bg"))
    tokStats
      .join(bigramStats, Seq("id"), "left")
      .select(
        col("id"),
        col("n_tokens").cast("long").as("n_tokens"),
        (col("top_tok").cast("double") / col("n_tokens")).as("top_token_frac"),
        coalesce(col("n_bigrams"), lit(0L)).cast("long").as("n_bigrams"),
        coalesce(lit(1.0) - col("n_distinct_bg").cast("double") / col("n_bigrams"),
          lit(0.0)).as("dup_bigram_frac"),
        coalesce(col("top_bg").cast("double") / col("n_bigrams"), lit(0.0))
          .as("top_bigram_frac"))
      .orderBy(col("id").asc)
  }

  /** Top-3 TF-IDF keywords per document — the per-doc topical summary
    * a curation UI shows and a tagging pass joins on. Relational
    * shape: one explode → (id, term) counts → broadcast df join →
    * per-doc rank window partitioned by id (never global). Scores are
    * rounded to 6 decimals BEFORE ranking so the (score desc, term
    * asc) order the oracle replays is decided on engine-identical
    * values (ln() may differ in the last ulp between libms). */
  def tfidfKeywords(spark: SparkSession, sfDir: String,
                    topK: Int = 3): DataFrame =
    tfidfKeywordsCorpus(Ingest.corpusFromDocuments(spark, sfDir), topK)

  def tfidfKeywordsCorpus(corpus: DataFrame, topK: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = corpus.withColumn("toks", tokens(col("sentence")))
      .select(col("id"), col("toks"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val tf = docs
      .select(col("id"), explode(col("toks")).as("term"))
      .groupBy(col("id"), col("term"))
      .agg(count(lit(1)).cast("long").as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("id"))
      .orderBy(col("tfidf").desc, col("term").asc)
    tf.join(dfreq, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("id"), col("rank").cast("long").as("rank"),
        col("term"), col("tfidf"))
      .orderBy(col("id").asc, col("rank").asc)
  }

  /** Vocabulary head: the corpus's most frequent tokens with their
    * document frequencies — the boilerplate/stopword discovery query a
    * pipeline runs before tuning its filters. Global top-k over a
    * grouped count (plans as TakeOrderedAndProject, not a full sort). */
  def tokenVocab(spark: SparkSession, sfDir: String, topK: Int = 25): DataFrame =
    Ingest.corpusFromDocuments(spark, sfDir)
      .withColumn("toks", tokens(col("sentence")))
      .select(col("id"), explode(col("toks")).as("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("id")).as("n_docs"))
      .orderBy(col("n_occurrences").desc, col("term").asc)
      .limit(topK)

  /** Count-min-sketch heavy-hitter audit — the third member of the
    * sketch family (HLL cardinality, GK percentiles, CMS frequencies).
    * The sketch is built distributed (one pass, mergeable per-partition
    * sketches — at 100 TB this replaces the full (term → count) shuffle
    * with a fixed eps×confidence-sized table per partition); the exact
    * head counts come from the same aggregation [[tokenVocab]] runs,
    * and the output row compares them: CMS never under-counts, and
    * over-counts by at most eps·N with the configured confidence
    * (test-pinned). Seeded, so estimates are reproducible.
    *
    * The `cms_in_bound` flag folds both guarantees (never-under, over
    * by ≤ 5·eps·N — the test's hard cap) into one column a DuckDB
    * oracle can state as a literal TRUE: the registered query projects
    * (term, n_exact, cms_in_bound), so the exact head is hash-checked
    * AND the sketch bound is oracle-asserted; the raw `n_cms` estimate
    * stays in this frame for the audit/tests.
    *
    * The exact head stays DISTRIBUTED end-to-end: the driver-built
    * sketch (stat.countMinSketch returns a driver-side mergeable
    * sketch either way) is broadcast back out and probed by a typed
    * map over the topK-row head — a bounded external-structure
    * boundary, the same class as the multimodal codec map, not a
    * hot-path UDF. No `.collect()` anywhere in the operator body. */
  def vocabCms(spark: SparkSession, sfDir: String, topK: Int = 25,
               eps: Double = 0.0005, confidence: Double = 0.99): DataFrame = {
    import spark.implicits._
    val toks = Ingest.corpusFromDocuments(spark, sfDir)
      .select(explode(tokens(col("sentence"))).as("term"))
    val sketch = toks.stat.countMinSketch(col("term"), eps, confidence, seed = 42)
    // totalCount comes off the sketch — no third corpus pass
    val bound = math.max(1L, math.ceil(eps * sketch.totalCount).toLong)
    val bc = spark.sparkContext.broadcast(sketch)
    toks.groupBy(col("term"))
      .agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("term").asc)
      .limit(topK)
      .as[(String, Long)]
      .mapPartitions { it =>
        val sk = bc.value
        it.map { case (t, n) =>
          val est = sk.estimateCount(t)
          (t, n, est, est >= n && est - n <= 5 * bound)
        }
      }
      .toDF("term", "n_exact", "n_cms", "cms_in_bound")
      .orderBy(col("n_exact").desc, col("term").asc)
  }

  /** The PRODUCTION sketch path that [[vocabCms]] audits (the audit
    * deliberately runs the exact twin next to the sketch; this path
    * does not): ONE pass builds the CMS, and the caller's watchlist —
    * terms whose frequencies the pipeline tracks (banned phrases,
    * contamination markers, template boilerplate) — is estimated off
    * the sketch with no exact aggregation and no second corpus pass.
    * Estimates carry CMS semantics: never under the true count, over
    * by ≤ eps·N with the configured confidence; seeded, reproducible.
    * At 100 TB the sketch is built from mergeable per-partition state
    * (fixed eps×confidence size), never a (term → count) shuffle. */
  def termFrequencySketch(spark: SparkSession, sfDir: String,
                          watchlist: Seq[String],
                          eps: Double = 0.0005,
                          confidence: Double = 0.99): DataFrame = {
    import spark.implicits._
    require(watchlist.nonEmpty, "termFrequencySketch: empty watchlist")
    val toks = Ingest.corpusFromDocuments(spark, sfDir)
      .select(explode(tokens(col("sentence"))).as("term"))
    val sketch = toks.stat.countMinSketch(col("term"), eps, confidence, seed = 42)
    watchlist.distinct.map(t => (t, sketch.estimateCount(t)))
      .toDF("term", "n_est")
      .orderBy(col("term").asc)
  }

  /** Per-(lang, source) dataset card: document counts, token mass,
    * corpus share, mean document length — the stratified audit table a
    * dataset release ships. One shuffle on the (lang, source) group
    * key; the corpus total rides in as a broadcast single-row
    * aggregate (never a global window). */
  def corpusDatacard(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = graft.Tables.documents(spark, sfDir)
      .where(length(trim(col("text"))) > 0)
      .select(col("lang"), col("source"),
        size(tokens(trim(col("text")))).cast("long").as("n_tokens"))
    val grouped = docs.groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        avg(col("n_tokens")).as("avg_tokens"))
    grouped
      .crossJoin(broadcast(grouped.agg(sum(col("n_docs")).as("corpus_docs"))))
      .select(col("lang"), col("source"), col("n_docs"),
        (col("n_docs").cast("double") / col("corpus_docs")).as("doc_share"),
        col("total_tokens"), col("avg_tokens"))
      .orderBy(col("lang").asc, col("source").asc)
  }

  /** The scrub patterns — anchored, class-based regexes with no
    * lookaround, so the Java (Spark) and RE2 (DuckDB oracle) dialects
    * agree match-for-match. Kept `val`s so the oracle SQL restates the
    * exact same strings. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** PII scrubbing — the redaction pass a training-data pipeline runs
    * before packing: emails, NANP-shaped phone numbers, and IPv4
    * addresses replaced by typed placeholder tokens, with per-document
    * match counts for the datacard. One narrow codegen'd map
    * (`regexp_count` + chained `regexp_replace`), no shuffle, no UDF —
    * scales with the scan. Replacement order matters and is part of
    * the contract: emails first (an all-digit mail host must not be
    * half-eaten by the IPv4 pass), then phones, then IPs, each
    * counting on the PREVIOUS pass's output so nothing double-counts.
    */
  def scrubPii(corpus: DataFrame, textCol: String): DataFrame = {
    val noEmail = regexp_replace(col(textCol), EmailRe, "<EMAIL>")
    val noPhone = regexp_replace(noEmail, PhoneRe, "<PHONE>")
    corpus
      .withColumn("n_emails", regexp_count(col(textCol), lit(EmailRe)))
      .withColumn("n_phones", regexp_count(noEmail, lit(PhoneRe)))
      .withColumn("n_ips", regexp_count(noPhone, lit(Ipv4Re)))
      .withColumn("clean", regexp_replace(noPhone, Ipv4Re, "<IP>"))
  }

  /** Registered-query surface for [[scrubPii]]. The sf corpus is
    * synthetic and clean, so the query first materializes a
    * deterministic PII-bearing variant from doc_id (emails on ids ≡ 0
    * mod 3, phones ≡ 0 mod 4, IPv4 ≡ 0 mod 5 — both engines derive the
    * SAME text from the same parquet, so the scrub is exercised on
    * real matches and real non-matches, not no-ops). */
  /** C4/CCNet-style boilerplate-line removal: a line whose DOCUMENT
    * frequency (distinct docs containing the trimmed line) reaches
    * `minDf` is boilerplate — navigation chrome, cookie banners,
    * copyright footers — and is dropped from every document; unique
    * content lines survive with their order intact. This is the
    * cross-document twin of the within-corpus span dedup
    * ([[SpanDedup]]): the unit is the LINE, the signal is document
    * frequency, and removal is total (boilerplate carries no
    * training value, unlike a first-occurrence span which is kept).
    *
    * The synthetic docs are single-line and globally distinct, so
    * (the [[piiScrub]] discipline) the registered query derives a
    * boilerplated corpus IDENTICALLY in engine and oracle: a header
    * pool of 5, a footer pool of 3 (df ≈ n/5, n/3 — far above any
    * sensible threshold), and a promo line on every 50th doc (df =
    * n/50 = 10 at the 500-doc test corpora — above `minDf`, removed).
    * A df below the threshold keeps the line; that path is pinned by
    * the spec on a corpus where the promo is genuinely rare. Both
    * engines agree at every scale because df is COMPUTED, not assumed.
    *
    * Scale: explode → per-line partial-aggregated distinct-doc count
    * (one shuffle on the line key) → anti-join (boilerplate lines are
    * few but unbounded, so an equi-join, not a broadcast assumption) →
    * per-doc ordered reassembly via sort_array(collect_list(struct)) —
    * grouped, never a global window. */
  def scrubBoilerplate(corpus: DataFrame, minDf: Long): DataFrame = {
    val lines = corpus
      .select(col("doc_id"), posexplode(split(col("text"), "\n")))
      .select(col("doc_id"), col("pos"), trim(col("col")).as("line"))
    val boiler = lines.groupBy(col("line"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= minDf)
      .select(col("line"))
    val kept = lines.join(boiler, Seq("line"), "left_anti")
    val nl = lines.groupBy(col("doc_id")).agg(count(lit(1)).as("n_lines"))
    val keptAgg = kept.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("line")))),
            s => s.getField("line")), "\n").as("clean_text"))
    // Left-join from the per-doc line counts so a document whose EVERY
    // line is boilerplate still surfaces as (n_kept = 0, clean_text = '')
    // instead of vanishing from the datacard view.
    nl.join(keptAgg, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
      .orderBy(col("doc_id").asc)
  }

  /** The registered derived-corpus form of [[scrubBoilerplate]] (see
    * that scaladoc for semantics and the injection recipe). */
  def boilerplateLines(spark: SparkSession, sfDir: String,
                       minDf: Long = 5L): DataFrame = {
    val docs = graft.Tables.documents(spark, sfDir)
    val headers = array(
      lit("SUBSCRIBE TO OUR NEWSLETTER"),
      lit("Accept all cookies to continue"),
      lit("Share this article on social media"),
      lit("Copyright 2024 Example Corp"),
      lit("Click here to read more"))
    val footers = array(
      lit("All rights reserved"),
      lit("Terms of service apply"),
      lit("Powered by Example CMS"))
    val corpus = docs.select(col("doc_id"),
      concat(
        element_at(headers, (pmod(col("doc_id"), lit(5)) + 1).cast("int")),
        lit("\n"), col("text"), lit("\n"),
        element_at(footers, (pmod(col("doc_id"), lit(3)) + 1).cast("int")),
        when(pmod(col("doc_id"), lit(50)) === 0,
          lit("\nLimited time offer - subscribe today"))
          .otherwise(lit(""))).as("text"))
    scrubBoilerplate(corpus, minDf)
  }

  def piiScrub(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = graft.Tables.documents(spark, sfDir)
    val withPii = docs.select(col("doc_id"),
      concat(
        col("text"),
        when(col("doc_id") % 3 === 0,
          concat(lit(" reach user"), col("doc_id").cast("string"),
            lit("@mail"), (col("doc_id") % 7).cast("string"), lit(".example.com")))
          .otherwise(lit("")),
        when(col("doc_id") % 4 === 0,
          concat(lit(" call "), lpad((col("doc_id") % 1000).cast("string"), 3, "0"),
            lit("-555-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
          .otherwise(lit("")),
        when(col("doc_id") % 5 === 0,
          concat(lit(" from 10.0."), (col("doc_id") % 256).cast("string"),
            lit("."), ((col("doc_id") * 7) % 256).cast("string")))
          .otherwise(lit(""))).as("text"))
    scrubPii(withPii, "text")
      .select(col("doc_id"), col("n_emails").cast("long").as("n_emails"),
        col("n_phones").cast("long").as("n_phones"),
        col("n_ips").cast("long").as("n_ips"), col("clean"))
      .orderBy(col("doc_id").asc)
  }

  /** Per-document fingerprints: md5 of the token-normalized text plus
    * the minimum md5 over 3-token shingles (a 1-permutation MinHash —
    * the doc-level fingerprint a near-dup pass buckets on). Documents
    * with fewer than 3 tokens fall back to the whole normalized text
    * as their single shingle. */
  def docFingerprint(spark: SparkSession, sfDir: String): DataFrame = {
    Ingest.corpusFromDocuments(spark, sfDir)
      .withColumn("toks", tokens(col("sentence")))
      .withColumn("norm", concat_ws(" ", col("toks")))
      .select(
        col("id"),
        md5(col("norm")).as("md5_norm"),
        when(size(col("toks")) >= 3,
          array_min(transform(sequence(lit(1), size(col("toks")) - 2),
            i => md5(concat_ws(" ", slice(col("toks"), i, lit(3)))))))
          .otherwise(md5(col("norm"))).as("min_shingle_md5"))
      .orderBy(col("id").asc)
  }
}
