package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalytics

/** Text-analytics operators vs driver-side recomputation on real
  * corpus rows (the DuckDB oracle covers full-corpus parity; these
  * pin the per-row semantics independently). */
class TextAnalyticsSpec extends SparkSpec {

  private def toksRef(s: String): Seq[String] =
    s.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq

  test("scrubPii redacts emails, phones, and IPv4s with correct counts and pass order") {
    import spark.implicits._
    val rows = Seq(
      (0L, "mail bob.smith+x@corp.example.org now"),
      (1L, "dial 415-555-0142 or 415-555-0143"),
      (2L, "host 192.168.001.004 up"),
      (3L, "mixed a@b.io then 212-555-0100 at 10.0.0.1"),
      (4L, "clean text with no pii at all"),
      // a digits-only mail host has no alphabetic TLD, so the EMAIL
      // pass skips it and the IPv4 pass redacts the address part
      (5L, "edge user@1.2.3.4 case"))
      .toDF("doc_id", "text")
    val got = TextAnalytics.scrubPii(rows, "text")
      .select("doc_id", "n_emails", "n_phones", "n_ips", "clean")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3)), r.getString(4))).toMap
    assert(got(0L) == ((1, 0, 0), "mail <EMAIL> now"))
    assert(got(1L) == ((0, 2, 0), "dial <PHONE> or <PHONE>"))
    assert(got(2L) == ((0, 0, 1), "host <IP> up"))
    assert(got(3L) == ((1, 1, 1), "mixed <EMAIL> then <PHONE> at <IP>"))
    assert(got(4L) == ((0, 0, 0), "clean text with no pii at all"))
    assert(got(5L) == ((0, 0, 1), "edge user@<IP> case"))
  }

  test("textStats matches driver-side recomputation on sf0.001 rows") {
    val docs = graft.sources.Ingest.corpusFromDocuments(spark, sfSmall)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = TextAnalytics.textStats(spark, sfSmall).collect()
    assert(got.length == docs.size)
    got.take(50).foreach { r =>
      val s = docs(r.getLong(0))
      val toks = toksRef(s)
      assert(r.getLong(1) == s.length, "n_chars")
      assert(r.getLong(2) == toks.length, "n_tokens")
      assert(r.getLong(3) == toks.distinct.length, "n_distinct_tokens")
      assert(r.getLong(4) == (if (toks.isEmpty) 0 else toks.map(_.length).max), "max_token_len")
    }
  }

  test("textQuality: ratios in [0,1]; keep verdict consistent with its inputs") {
    val rows = TextAnalytics.textQuality(spark, sfSmall).collect()
    rows.foreach { r =>
      val (alpha, digit, space, stop) =
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      Seq(alpha, digit, space, stop).foreach(x => assert(x >= 0.0 && x <= 1.0))
      assert(alpha + digit + space <= 1.0 + 1e-9) // disjoint character classes
    }
  }

  test("langId: word-salad corpus with english stopwords classifies en or und; hits consistent") {
    val rows = TextAnalytics.langId(spark, sfSmall).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val hits = (1 to 4).map(r.getLong)
      val pred = r.getString(5)
      if (hits.max == 0) assert(pred == "und")
      else assert(Seq("en", "de", "es", "fr").contains(pred))
    }
    // the synthetic corpus embeds 'the'/'a' heavily: en must dominate
    val en = rows.count(_.getString(5) == "en")
    assert(en > rows.length / 2, s"expected mostly en, got $en/${rows.length}")
  }

  test("tokenCounts: ws and bpe tokenizers agree on pure-word text, diverge on punctuation") {
    import spark.implicits._
    val df = Seq((0L, "plain words only here"), (1L, "punct-uated, text; with symbols!"))
      .toDF("doc_id", "text").withColumn("lang", lit("en"))
      .withColumn("source", lit("t")).withColumn("n_chars", length(col("text")))
    val dir = tmpDir("tokcnt-")
    df.write.mode("overwrite").parquet(dir + "/documents.parquet")
    val got = TextAnalytics.tokenCounts(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(0L) == ((4L, 4L)))
    // "punct-uated, text; with symbols!" → ws: 4; bpe: punct,-,uated,",",text,";",with,symbols,"!" = 9
    assert(got(1L) == ((4L, 9L)))
  }

  test("docFingerprint: identical normalized texts share both fingerprints") {
    import spark.implicits._
    val df = Seq((0L, "Alpha, beta gamma delta!"), (1L, "alpha beta GAMMA delta"),
        (2L, "other words entirely different"))
      .toDF("doc_id", "text").withColumn("lang", lit("en"))
      .withColumn("source", lit("t")).withColumn("n_chars", length(col("text")))
    val dir = tmpDir("fp-")
    df.write.mode("overwrite").parquet(dir + "/documents.parquet")
    val got = TextAnalytics.docFingerprint(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(got(0L) == got(1L), "normalization-equal docs share fingerprints")
    assert(got(0L) != got(2L))
  }

  test("tfidfKeywords: rare terms outrank common ones within a doc") {
    import spark.implicits._
    val corpus = Seq(
      (0L, "apple apple banana"),
      (1L, "banana cherry"),
      (2L, "cherry cherry cherry dog"))
      .toDF("id", "sentence")
    val got = TextAnalytics.tfidfKeywordsCorpus(corpus)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    val byDoc = got.groupBy(_._1)
    // doc0: apple tf=2 df=1 -> 2*ln(3) beats banana 1*ln(3/2)
    assert(byDoc(0L).sortBy(_._2).map(_._3).toSeq == Seq("apple", "banana"))
    // doc2: cherry tf=3 df=2 -> 3*ln(1.5)=1.216 beats dog 1*ln(3)=1.099
    assert(byDoc(2L).sortBy(_._2).map(_._3).toSeq == Seq("cherry", "dog"))
    val d0apple = got.find(g => g._1 == 0L && g._3 == "apple").get._4
    assert(math.abs(d0apple - 2.0 * math.log(3.0)) < 1e-5)
    assert(got.forall(_._2 <= 3), "row_number cap at 3")
  }

  test("tokenVocab and corpusDatacard: consistent corpus-level accounting") {
    val vocab = TextAnalytics.tokenVocab(spark, sfSmall)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(vocab.length == 25)
    // sorted by occurrences desc; docs containing a term never exceed
    // its occurrence count, and never exceed the corpus size
    assert(vocab.sliding(2).forall(p => p(0)._2 >= p(1)._2))
    assert(vocab.forall(v => v._3 <= v._2 && v._3 <= 500))
    val card = TextAnalytics.corpusDatacard(spark, sfSmall)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getLong(4), r.getDouble(5)))
    assert(card.map(_._3).sum == 500L, "card strata cover the corpus")
    assert(math.abs(card.map(_._4).sum - 1.0) < 1e-9, "shares sum to 1")
    assert(card.forall(c => c._6 > 0 && c._5 >= c._3), "tokens per doc >= 1")
  }

  test("termFrequencySketch: one-pass watchlist estimates respect CMS bounds") {
    import org.apache.spark.sql.functions._
    val eps = 0.0005
    // watchlist: two terms known to exist plus one absent
    val exact = graft.sources.Ingest.corpusFromDocuments(spark, sfSmall)
      .select(explode(TextAnalytics.tokens(col("sentence"))).as("term"))
      .groupBy("term").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val present = exact.toSeq.sortBy(-_._2).take(2).map(_._1)
    val watch = present :+ "zzz_never_a_token_zzz"
    val got = TextAnalytics.termFrequencySketch(spark, sfSmall, watch, eps = eps)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet == watch.toSet)
    val n = exact.values.sum
    val bound = math.max(1L, math.ceil(eps * n).toLong)
    present.foreach { t =>
      assert(got(t) >= exact(t), s"'$t' under-counted: ${got(t)} < ${exact(t)}")
      assert(got(t) - exact(t) <= 5 * bound, s"'$t' far over: ${got(t)} vs ${exact(t)}")
    }
    // the absent term may collide but stays within the eps·N guarantee
    assert(got("zzz_never_a_token_zzz") <= 5 * bound)
  }

  test("vocabCms: sketch never under-counts and over-counts within eps·N") {
    import org.apache.spark.sql.functions._
    val eps = 0.0005
    val rows = TextAnalytics.vocabCms(spark, sfSmall, topK = 25, eps = eps)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 25)
    val totalTokens = graft.sources.Ingest.corpusFromDocuments(spark, sfSmall)
      .select(explode(TextAnalytics.tokens(col("sentence")))).count()
    // Never-under-count is a hard CMS guarantee; the eps·N over-count
    // bound is probabilistic (per-query confidence 1−δ), so assert the
    // FRACTION within bound plus a loose hard cap, not all 25 — a
    // dataset change can legitimately push one term past eps·N without
    // any code bug.
    val bound = math.max(1L, math.ceil(eps * totalTokens).toLong)
    rows.foreach { case (t, exact, cms) =>
      assert(cms >= exact, s"CMS under-counted '$t': $cms < $exact")
      assert(cms - exact <= 5 * bound,
        s"CMS over-count for '$t' far beyond eps*N: $cms vs $exact (N=$totalTokens)")
    }
    val within = rows.count { case (_, exact, cms) => cms - exact <= bound }
    assert(within >= 23, // 1 − δ = 0.99 per query; allow 2/25 excursions
      s"only $within/25 terms within eps*N (bound=$bound)")
    // the exact head must agree with the tokenVocab aggregation
    val vocab = TextAnalytics.tokenVocab(spark, sfSmall, topK = 25)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { case (t, exact, _) =>
      assert(vocab(t) == exact, s"head term '$t' count drift")
    }
  }

  test("repetitionStats: token and bigram fractions on planted loops") {
    import spark.implicits._
    val corpus = Seq(
      (0L, "a a a a b"),   // top token 4/5; bigrams: aa,aa,aa,ab
      (1L, "w x y z"),     // all distinct
      (2L, "solo"))        // single token -> no bigrams
      .toDF("id", "sentence")
    val got = TextAnalytics.repetitionStatsCorpus(corpus).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(got(0L) == ((5L, 0.8, 4L, 1.0 - 2.0 / 4.0, 3.0 / 4.0)))
    assert(got(1L) == ((4L, 0.25, 3L, 0.0, 1.0 / 3.0)))
    assert(got(2L) == ((1L, 1.0, 0L, 0.0, 0.0)))
  }

  test("scrubBoilerplate: df-threshold drop, order kept, rare lines survive") {
    import spark.implicits._
    // "FOOTER" in 3 docs (df=3 >= minDf=3 -> dropped everywhere);
    // "rare promo" in 2 docs (df=2 < 3 -> KEPT); bodies unique
    val corpus = Seq(
      (0L, "FOOTER\nbody zero\nrare promo"),
      (1L, "body one\nFOOTER"),
      (2L, "rare promo\nFOOTER\nbody two"),
      (3L, "only body three"))
      .toDF("doc_id", "text")
    val got = TextAnalytics.scrubBoilerplate(corpus, minDf = 3L).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(0L) == ((3L, 2L, "body zero\nrare promo")))
    assert(got(1L) == ((2L, 1L, "body one")))
    assert(got(2L) == ((3L, 2L, "rare promo\nbody two")))
    assert(got(3L) == ((1L, 1L, "only body three")))
  }

  test("scrubBoilerplate: a doc that is ALL boilerplate survives as (n_kept=0, clean_text='')") {
    import spark.implicits._
    // doc 3 is nothing but the df>=3 footer — it must still appear in
    // the datacard view with zero kept lines, not vanish from the output
    val corpus = Seq(
      (0L, "FOOTER\nbody zero"),
      (1L, "body one\nFOOTER"),
      (2L, "FOOTER\nbody two"),
      (3L, "FOOTER"))
      .toDF("doc_id", "text")
    val got = TextAnalytics.scrubBoilerplate(corpus, minDf = 3L).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got.keySet == Set(0L, 1L, 2L, 3L))
    assert(got(3L) == ((1L, 0L, "")))
    assert(got(0L) == ((2L, 1L, "body zero")))
  }

  test("boilerplate_scrub registered form: headers/footers removed, body kept, promo df computed") {
    val rows = TextAnalytics.boilerplateLines(spark, sfSmall).collect()
    val docs = Tables.documents(spark, sfSmall)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.length == docs.size)
    rows.foreach { r =>
      val (id, nLines, nKept, clean) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))
      val expectLines = if (id % 50 == 0) 4L else 3L
      assert(nLines == expectLines, s"doc $id n_lines")
      // 500-doc corpora: header df=100, footer >= 166, promo df=10 —
      // all >= 5, so exactly the body survives
      assert(nKept == 1L, s"doc $id n_kept")
      assert(clean == docs(id).trim, s"doc $id body drift")
    }
  }
}
