package graft

import org.apache.spark.sql.DataFrame
import graft.operators.NgramLm

/** Stupid-backoff trigram LM (Brants et al. 2007 — see NgramLm
  * scaladoc): count tables are exact, scoring matches a from-scratch
  * driver-side reference implementation on held-out documents through
  * every backoff branch, and self-scoring (the registered surface)
  * never needs a branch below the trigram by construction. */
class NgramLmSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(rows: (Long, String)*): DataFrame =
    rows.toDF("id", "sentence")

  private def toks(df: DataFrame): DataFrame = {
    val t = df // NgramLm.tokenized is private; restate its two steps
    t.selectExpr("id",
      "filter(split(lower(sentence), '[^a-z0-9]+'), x -> x != '') AS toks")
      .filter("size(toks) > 0")
  }

  /** From-scratch driver-side stupid backoff — the oracle for [[NgramLm.score]]. */
  private def refScore(train: Seq[Seq[String]], doc: Seq[String]): (Long, BigDecimal, Double) = {
    val uni = train.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bi = train.flatMap(_.sliding(2).filter(_.size == 2).map(_.mkString(" ")))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tri = train.flatMap(_.sliding(3).filter(_.size == 3).map(_.mkString(" ")))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = train.map(_.size).sum.toDouble
    val a = 0.4
    val lps = doc.indices.map { i =>
      val w = doc(i)
      val u = if (i >= 1) Some(doc(i - 1)) else None
      val v = if (i >= 2) Some(doc(i - 2)) else None
      val s = (v, u) match {
        case (Some(vv), Some(uu)) if tri.contains(s"$vv $uu $w") =>
          tri(s"$vv $uu $w").toDouble / bi(s"$vv $uu").toDouble
        case (vOpt, Some(uu)) if bi.contains(s"$uu $w") =>
          (if (vOpt.isDefined) a else 1.0) * bi(s"$uu $w").toDouble / uni(uu).toDouble
        case (vOpt, uOpt) =>
          (if (vOpt.isDefined) a * a else if (uOpt.isDefined) a else 1.0) *
            uni(w).toDouble / n
      }
      BigDecimal(math.log10(s)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }
    val sum = lps.sum
    val ppl = math.pow(10.0, -sum.toDouble / doc.size)
    (doc.size.toLong, sum, BigDecimal(ppl).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("count tables are exact on a tiny corpus") {
    val df = toks(corpus(0L -> "a b c a b", 1L -> "b c d"))
    val m = NgramLm.train(df)
    val uni = m.uni.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(uni == Map("a" -> 2L, "b" -> 3L, "c" -> 2L, "d" -> 1L))
    val bi = m.bi.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bi == Map("a b" -> 2L, "b c" -> 2L, "c a" -> 1L, "c d" -> 1L))
    val tri = m.tri.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tri == Map("a b c" -> 1L, "b c a" -> 1L, "c a b" -> 1L, "b c d" -> 1L))
    assert(m.total.collect().head.getLong(0) == 8L)
  }

  test("held-out scoring matches the reference through every backoff branch") {
    // train corpus has trigrams; the held-out doc is built to hit:
    //   pos 0 -> unigram (no context), pos 1 -> bigram chain,
    //   "a b c" -> trigram hit, "c a d" -> trigram miss/bigram miss
    //   (a d unseen) -> alpha^2 * unigram, "b d" -> bigram miss with
    //   v present -> alpha * ... checks factor accounting
    val train = toks(corpus(0L -> "a b c a b c", 1L -> "a d b", 2L -> "c c d"))
    val held = corpus(10L -> "a b c a d b d")
    val m = NgramLm.train(train)
    val out = NgramLm.score(m, toks(held)).collect()
    assert(out.length == 1)
    val r = out.head
    val trainToks = Seq(Seq("a", "b", "c", "a", "b", "c"), Seq("a", "d", "b"), Seq("c", "c", "d"))
    val (n, lp, ppl) = refScore(trainToks, Seq("a", "b", "c", "a", "d", "b", "d"))
    assert(r.getLong(1) == n)
    assert(r.getLong(2) == 0L) // no OOV: every held-out token is in vocab
    assert(math.abs(r.getDouble(3) - lp.toDouble) < 1e-9)
    assert(math.abs(r.getDouble(4) - ppl) < 1e-9)
  }

  test("OOV positions are excluded from the score and reported, not blended") {
    val train = toks(corpus(0L -> "a b c a b c"))
    val m = NgramLm.train(train)
    // "zzz" is out of vocabulary; "a b" scores normally
    val out = NgramLm.score(m, toks(corpus(10L -> "a b zzz"))).collect().head
    assert(out.getLong(1) == 2L) // n_scored: in-vocab positions only
    assert(out.getLong(2) == 1L) // n_oov
    val (_, lpRef, _) = refScore(Seq(Seq("a", "b", "c", "a", "b", "c")), Seq("a", "b"))
    assert(math.abs(out.getDouble(3) - lpRef.toDouble) < 1e-9)
    // all-OOV doc: row present, null score/ppl
    val allOov = NgramLm.score(m, toks(corpus(11L -> "qq ww"))).collect().head
    assert(allOov.getLong(1) == 0L && allOov.getLong(2) == 2L)
    assert(allOov.isNullAt(3) && allOov.isNullAt(4))
    // empty-toks docs produce no phantom row (sequence(1,0) trap)
    import spark.implicits._
    val empty = Seq((12L, Seq.empty[String])).toDF("id", "toks")
    assert(NgramLm.score(m, empty).count() == 0L)
  }

  test("self-scoring always has its own trigrams: branch-1 everywhere past position 1") {
    // every trigram of the scored doc came from training on it, so the
    // score of each position >= 2 is c3/c2 with no alpha factor
    val df = toks(corpus(0L -> "x y z x y"))
    val m = NgramLm.train(df)
    val r = NgramLm.score(m, df).collect().head
    val (_, lp, _) = refScore(Seq(Seq("x", "y", "z", "x", "y")), Seq("x", "y", "z", "x", "y"))
    assert(math.abs(r.getDouble(3) - lp.toDouble) < 1e-9)
  }

  test("registered surfaces: trigram head, per-doc score, ppl buckets on sf0.001") {
    val head = NgramLm.trigramHead(spark, sfSmall).collect()
    assert(head.length == 25)
    assert(head.map(_.getLong(1)).toSeq == head.map(_.getLong(1)).sortBy(-_).toSeq)

    val scored = NgramLm.scoreCorpus(spark, sfSmall)
    val rows = scored.collect()
    assert(rows.length > 0)
    assert(rows.forall(r => r.getDouble(4) > 0.0))
    assert(rows.forall(_.getLong(2) == 0L)) // self-scored: no OOV
    // ids ordered, one row per non-empty doc
    assert(rows.map(_.getLong(0)).toSeq == rows.map(_.getLong(0)).sortBy(identity).toSeq)

    val buckets = NgramLm.pplBuckets(spark, sfSmall).collect()
    assert(buckets.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    val sizes = buckets.map(_.getLong(1))
    assert(math.abs(sizes.max - sizes.min) <= 1) // NTILE balance
    // buckets are ordered by ppl: max of bucket i <= min of bucket i+1
    val mins = buckets.map(_.getDouble(2))
    val maxs = buckets.map(_.getDouble(3))
    assert(maxs(0) <= mins(1) && maxs(1) <= mins(2))
  }

  test("persisted model round-trips: loaded counts equal trained counts") {
    val df = toks(corpus(0L -> "a b c a b", 1L -> "b c d e f"))
    val m = NgramLm.train(df)
    val dir = tmpDir("lm-model")
    NgramLm.saveModel(m, dir)
    val l = NgramLm.loadModel(spark, dir)
    def m2(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m2(l.uni) == m2(m.uni))
    assert(m2(l.bi) == m2(m.bi))
    assert(m2(l.tri) == m2(m.tri))
    assert(l.total.collect().head.getLong(0) == 10L)
  }

  test("appended waves sum to a fresh rebuild over the union; scoring is identical") {
    val wave1 = toks(corpus(0L -> "a b c a b c", 1L -> "c b a"))
    val wave2 = toks(corpus(2L -> "a b c d", 3L -> "d c b a b c"))
    val dir = tmpDir("lm-model")
    NgramLm.saveModel(NgramLm.train(wave1), dir)
    assert(NgramLm.appendModel(spark, dir, wave2) == 19L) // 9 + 10 tokens
    val union = wave1.unionByName(wave2)
    val fresh = NgramLm.train(union)
    val loaded = NgramLm.loadModel(spark, dir)
    val a = NgramLm.score(fresh, union).orderBy("id").collect().toSeq
    val b = NgramLm.score(loaded, union).orderBy("id").collect().toSeq
    assert(a == b)
  }

  test("appendModelBatch replay is a no-op and counts stay exact") {
    val wave1 = toks(corpus(0L -> "a b c a b c"))
    val wave2 = toks(corpus(2L -> "a b c d"))
    val dir = tmpDir("lm-model")
    NgramLm.saveModel(NgramLm.train(wave1), dir)
    assert(NgramLm.appendModelBatch(spark, dir, wave2, 0L, "t") == 4L)
    assert(NgramLm.appendModelBatch(spark, dir, wave2, 0L, "t") == 0L) // replay
    val loaded = NgramLm.loadModel(spark, dir)
    val fresh = NgramLm.train(wave1.unionByName(wave2))
    def m2(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m2(loaded.uni) == m2(fresh.uni))
    assert(m2(loaded.bi) == m2(fresh.bi))
    assert(m2(loaded.tri) == m2(fresh.tri))
    assert(loaded.total.collect().head.getLong(0) == 10L)
  }

  test("thresholded buckets agree with exact NTILE terciles away from the cut points") {
    val docs = toks(spark.read.parquet(s"$sfSmall/documents.parquet")
      .selectExpr("doc_id AS id", "trim(text) AS sentence")
      .filter("length(trim(text)) > 0"))
    val scored = NgramLm.score(NgramLm.train(docs), docs)
    val exact = scored.withColumn("bucket",
        org.apache.spark.sql.functions.ntile(3).over(
          org.apache.spark.sql.expressions.Window.orderBy($"ppl".asc, $"id".asc)).cast("long"))
      .select("id", "bucket").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val approx = NgramLm.pplBucketsThresholded(scored).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(approx.keySet == exact.keySet)
    // sketch rank error can move a document at most one bucket
    val off = approx.count { case (id, b) => math.abs(b - exact(id)) > 1 }
    assert(off == 0)
    // and the disagreement set itself is a thin boundary band
    val disagree = approx.count { case (id, b) => b != exact(id) }
    assert(disagree <= math.max(2, exact.size / 20), s"disagree=$disagree of ${exact.size}")
  }

  test("zero-token documents are excluded from training and scoring") {
    val df = toks(corpus(0L -> "a b", 1L -> "!!!", 2L -> "   "))
    assert(df.count() == 1)
    val m = NgramLm.train(df)
    assert(m.total.collect().head.getLong(0) == 2L)
    assert(NgramLm.score(m, df).collect().map(_.getLong(0)).toSeq == Seq(0L))
  }
}
