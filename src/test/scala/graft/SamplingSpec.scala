package graft

import graft.operators.{Dedup, Sampling}

/** Pipeline hygiene operators: deterministic splits and benchmark
  * decontamination. */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("sampleSplit: deterministic, total, and roughly 80/10/10 on sf0.001") {
    val a = Sampling.sampleSplit(spark, sfSmall).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val b = Sampling.sampleSplit(spark, sfSmall).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(a.toSeq == b.toSeq, "assignment must be reproducible")
    assert(a.length == 500)
    val frac = a.groupBy(_._2).view.mapValues(_.length / 500.0).toMap
    assert(frac.keySet.subsetOf(Set("train", "val", "test")))
    assert(frac("train") > 0.7 && frac("train") < 0.9, s"train=$frac")
    assert(frac.getOrElse("val", 0.0) > 0.03 && frac.getOrElse("test", 0.0) > 0.03)
    // content-independence: the split of a given id never depends on
    // other rows (adding docs can't move existing assignments)
    val sub = Sampling.sampleSplitCorpus(
      Seq((0L, "x"), (7L, "y")).toDF("id", "sentence")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val full = a.toMap
    assert(sub(0L) == full(0L) && sub(7L) == full(7L))
  }

  test("leakageSafeSplit: near-dup pairs never straddle splits; assignment is cluster-constant") {
    val rows = Sampling.leakageSafeSplit(spark, sfSmall).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rows.length == 500, "every signature-bearing doc gets a split")
    // the leakage guarantee, definitionally: one split per cluster
    val perCluster = rows.groupBy(_._2).view.mapValues(_.map(_._3).distinct).toMap
    assert(perCluster.values.forall(_.length == 1),
      s"clusters with mixed splits: ${perCluster.filter(_._2.length > 1).keys.take(5)}")
    // and through the ACTUAL near-dup pairs: both ends always agree
    val split = rows.map(r => r._1 -> r._3).toMap
    val pairs = Dedup.dedupMinhash(spark, sfSmall).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture must contain near-dup pairs")
    pairs.foreach { case (a, b) =>
      assert(split(a) == split(b), s"leak: pair ($a,$b) straddles ${split(a)}/${split(b)}")
    }
    // per-doc hash splits DO leak on this fixture — the guard is not
    // vacuous: at least one near-dup pair straddles sampleSplit's
    // assignment (80/10/10 odds make a 500-doc dup-heavy fixture
    // straddle with near-certainty; pinned by the fixed salt)
    val naive = Sampling.sampleSplit(spark, sfSmall).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pairs.exists { case (a, b) => naive(a) != naive(b) },
      "fixture no longer demonstrates the leak the operator exists to prevent")
    // proportions stay usable (clusters shift mass, but the corpus is
    // mostly singletons)
    val frac = rows.groupBy(_._3).view.mapValues(_.length / 500.0).toMap
    assert(frac("train") > 0.65 && frac("train") < 0.95, s"$frac")
    // determinism
    val again = Sampling.leakageSafeSplit(spark, sfSmall).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rows.toSeq == again.toSeq)
  }

  test("contaminationSets: shared phrases detected, common shingles df-capped out") {
    val bench = Seq(
      (1000L, "the capital of france is paris and it sits on the seine"))
      .toDF("id", "sentence")
    val train = Seq(
      // contains the benchmark phrase verbatim -> many shared shingles
      (1L, "students wrote that the capital of france is paris and it sits on the seine today"),
      // unrelated
      (2L, "spark catalyst optimizer rewrites logical plans into physical plans"),
      // shares only a single common stopword-ish shingle? no 3-gram overlap
      (3L, "the capital city budget grew fast this year"))
      .toDF("id", "sentence")
    val got = Dedup.contaminationSets(train, bench)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(t => (t._1, t._2)).toSeq == Seq((1L, 1000L)),
      s"only the verbatim-phrase doc may pair, got ${got.toSeq}")
    assert(got.head._3 >= 8, s"verbatim inclusion shares many shingles: ${got.head._3}")
    // df cap: a shingle present in EVERY doc stops generating pairs
    val spam = (10L until 60L).map(i => (i, "alpha beta gamma"))
    val train2 = (spam :+ (99L, "alpha beta gamma")).toDF("id", "sentence")
    val bench2 = Seq((2000L, "alpha beta gamma")).toDF("id", "sentence")
    val capped = Dedup.contaminationSets(train2, bench2, minShared = 1, maxDf = 10)
    assert(capped.count() == 0, "df-capped shingle must not pair")
  }

  test("mixtureSample: deterministic per-source downsampling audit") {
    val a = Sampling.mixtureSample(spark, sfSmall).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
    val b = Sampling.mixtureSample(spark, sfSmall).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
    assert(a.toSeq == b.toSeq, "keep decisions must be reproducible")
    val m = a.toMap
    assert(a.map(_._2._1).sum == 500L, "audit covers every document")
    assert(m.values.forall { case (t, k) => k >= 0 && k <= t })
    // hash thresholds realize the configured ordering: src0 (~80%)
    // keeps a larger fraction than src2 (~25%) with overwhelming margin
    val frac = m.view.mapValues { case (t, k) => k.toDouble / t }.toMap
    assert(frac("src0") > frac("src2"),
      s"src0=${frac("src0")} must exceed src2=${frac("src2")}")
  }

  test("stratifiedSample: exact per-stratum counts, deterministic, ranks contiguous") {
    val perStratum = 50
    val got = Sampling.stratifiedSample(spark, sfSmall, perStratum).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    val strataSizes = graft.Tables.documents(spark, sfSmall)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val byLang = got.groupBy(_._2)
    assert(byLang.keySet == strataSizes.keySet, "every stratum represented")
    byLang.foreach { case (lang, rows) =>
      assert(rows.length == math.min(perStratum.toLong, strataSizes(lang)),
        s"$lang: ${rows.length} of stratum ${strataSizes(lang)}")
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length).toSeq,
        s"$lang ranks must be contiguous from 1")
    }
    val again = Sampling.stratifiedSample(spark, sfSmall, perStratum).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(got.toSeq == again.toSeq, "selection must be reproducible")
  }

  test("stratifiedSampleThresholded equals the exact sampler (margin covers)") {
    val exact = Sampling.stratifiedSample(spark, sfSmall).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq
    val fast = Sampling.stratifiedSampleThresholded(spark, sfSmall).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq
    assert(fast == exact,
      "threshold pre-filter must keep the same first-perStratum rows")
  }

  test("temperatureMixture: min language keeps all, head languages flatten toward sqrt") {
    val rows = Sampling.temperatureMixture(spark, sfSmall).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
    val byLang = rows.groupBy(_._2).view
      .mapValues(v => (v.size, v.count(_._3))).toMap
    val nMin = byLang.values.map(_._1).min
    for ((lang, (n, kept)) <- byLang) {
      if (n == nMin) assert(kept == n, s"smallest language $lang must keep all")
      else {
        // expected keep rate sqrt(n_min/n); binomial tolerance
        val expect = n * math.sqrt(nMin.toDouble / n)
        val tol = 4 * math.sqrt(expect)
        assert(math.abs(kept - expect) <= tol,
          s"$lang kept $kept, expected ~$expect ± $tol")
      }
    }
    // flattening: post-sample share ratio is the sqrt of the input
    // ratio, so the largest/smallest kept ratio must compress
    val (nMax, keptMax) = byLang.values.maxBy(_._1)
    assert(keptMax.toDouble / nMin < nMax.toDouble / nMin,
      "head language must be downsampled relative to the tail")
    // deterministic
    val again = Sampling.temperatureMixture(spark, sfSmall).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
    assert(rows.toSeq == again.toSeq)
  }

  test("weightedSample: matches a driver-side Efraimidis-Spirakis reference") {
    val k = 50
    val docs = graft.Tables.documents(spark, sfSmall)
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // independent reference: same two-round multiplicative-hash
    // uniform, same rounded E-S key, same (key desc, id asc) top-k —
    // plain Scala, no Spark operators
    def key(id: Long, w: Long): Double = {
      val mix1 = (id % 2147483647L) * 2654435761L % 2147483647L
      val uInt = ((id / 2147483647L + mix1) % 2147483647L) * 2246822519L % 2147483647L
      val u = (uInt + 1).toDouble / 2147483648.0
      BigDecimal(math.log(u) / math.max(w, 1L).toDouble)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expected = docs.map { case (id, w) => (id, key(id, w)) }
      .sortBy { case (id, kk) => (-kk, id) }.take(k).map(_._1).toSet
    val got = Sampling.weightedSample(spark, sfSmall, k).collect()
      .map(_.getLong(0)).toSet
    assert(got.size == k)
    assert(got == expected,
      s"membership diverges: extra=${(got -- expected).take(5)} missing=${(expected -- got).take(5)}")
  }

  test("weightedSample: weight-proportional (longer docs overrepresented) and deterministic") {
    val all = graft.Tables.documents(spark, sfSmall)
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val corpusMean = all.map(_._2).sum.toDouble / all.length
    val sample = Sampling.weightedSample(spark, sfSmall, 100).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    val sampleMean = sample.map(_._2).sum.toDouble / sample.length
    assert(sampleMean > corpusMean,
      s"length-weighted sample mean $sampleMean must exceed corpus mean $corpusMean")
    val again = Sampling.weightedSample(spark, sfSmall, 100).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(sample.toSeq == again.toSeq)
  }

  test("weightedSample uniform: full 64-bit id feeds the hash (no mod-2^31-1 correlation)") {
    import spark.implicits._
    val P = 2147483647L
    // ids sharing a residue mod 2^31-1 (including exact multiples of
    // it, which the one-round LCG pinned to the minimum u) must draw
    // distinct, non-degenerate uniforms
    val ids = Seq(5L, 5L + P, 5L + 2 * P, P, 2 * P, 3 * P, 7L * P)
    val df = ids.map(id => (id, "s", 100L)).toDF("doc_id", "source", "n_chars")
    val keyed = Sampling.weightedSampleOf(df, ids.length).collect()
    assert(keyed.length == ids.length)
    def u(id: Long): Long = {
      val mix1 = (id % P) * 2654435761L % P
      ((id / P + mix1) % P) * 2246822519L % P
    }
    val us = ids.map(u)
    assert(us.distinct.size == ids.size, s"correlated uniforms: $us")
    assert(us.forall(_ > 0), s"degenerate minimum u for a multiple of 2^31-1: $us")
    // overflow bound: the largest possible operand pair stays < 2^63
    assert(BigInt(P - 1) * BigInt(2654435761L) < BigInt(Long.MaxValue))
    assert(BigInt(P - 1) * BigInt(2246822519L) < BigInt(Long.MaxValue))
  }
}
