package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.ExactRank

/** The exact-rank selection must agree with NTILE bit-for-bit on every
  * shape that can go wrong: duplicates spanning a cut, all-equal
  * values (the bracket-stall case), n below/at/above the bucket count,
  * and windows large enough to force the sketch-bracket loop to
  * actually iterate (small accuracy). */
class ExactRankSpec extends SparkSpec {
  import spark.implicits._

  private def ntileBuckets(df: org.apache.spark.sql.DataFrame, b: Int) =
    df.withColumn("expect",
      ntile(b).over(Window.orderBy(col("v").asc, col("id").asc)).cast("long"))

  private def check(rows: Seq[(Long, Double)], buckets: Int,
                    accuracy: Int = 10000): Unit = {
    val df = rows.toDF("id", "v").repartition(4).cache()
    try {
      val n = df.count()
      val cuts = ExactRank.cutsAt(df, "v", "id",
        ExactRank.ntileCutRanks(n, buckets), accuracy)
      val got = ntileBuckets(df, buckets)
        .withColumn("bucket", ExactRank.bucketCol(col("v"), col("id"), cuts))
      assert(got.filter(col("bucket") =!= col("expect")).count() === 0,
        s"bucket mismatch for n=$n buckets=$buckets acc=$accuracy")
    } finally df.unpersist()
  }

  test("ntileCutRanks matches SQL NTILE cumulative sizes") {
    assert(ExactRank.ntileCutRanks(9, 3) === Seq(3L, 6L))
    assert(ExactRank.ntileCutRanks(10, 3) === Seq(4L, 7L))
    assert(ExactRank.ntileCutRanks(11, 3) === Seq(4L, 8L))
    assert(ExactRank.ntileCutRanks(2, 3) === Seq(1L, 2L))
    assert(ExactRank.ntileCutRanks(1, 3) === Seq(1L, 1L))
    assert(ExactRank.ntileCutRanks(0, 3) === Seq.empty)
  }

  test("matches NTILE on random doubles with duplicates") {
    val rnd = new scala.util.Random(7)
    // values drawn from a small set -> many duplicates across cuts
    val rows = (1L to 1000L).map(i => (i, (rnd.nextInt(37) / 7.0)))
    check(rows, 3)
    check(rows, 5)
  }

  test("matches NTILE when the bracket loop must iterate (tiny accuracy)") {
    val rnd = new scala.util.Random(13)
    val rows = (1L to 5000L).map(i => (i, rnd.nextDouble() * 100))
    // accuracy 50 -> floor window 1024 < n, loop iterates before collect
    check(rows, 3, accuracy = 50)
  }

  test("all-equal values: cut resolves purely by id tiebreak") {
    val rows = (1L to 2000L).map(i => (i, 42.0))
    check(rows, 3, accuracy = 100)
  }

  test("one value holds the majority across a cut boundary") {
    // 1500 copies of 5.0 surrounded by 300 low + 200 high: both cut
    // ranks land inside the duplicated mass
    val rows =
      (1L to 300L).map(i => (i, 1.0)) ++
      (301L to 1800L).map(i => (i, 5.0)) ++
      (1801L to 2000L).map(i => (i, 9.0))
    check(rows, 3, accuracy = 100)
  }

  test("tiny frames: n below, at, and just above the bucket count") {
    check(Seq((1L, 3.0)), 3)
    check(Seq((1L, 3.0), (2L, 1.0)), 3)
    check(Seq((1L, 3.0), (2L, 1.0), (3L, 2.0)), 3)
    check(Seq((1L, 3.0), (2L, 1.0), (3L, 2.0), (4L, 2.0)), 3)
  }

  test("multi-rank selection batches its jobs (one bracket + one count pass per round)") {
    val rnd = new scala.util.Random(99)
    val rows = (1L to 5000L).map(i => (i, rnd.nextDouble() * 100))
    val df = rows.toDF("id", "v").repartition(4).cache()
    try {
      val n = df.count()
      // 4 cuts, accuracy 50: the loop iterates before flooring. The
      // one-rank-at-a-time path paid ~5 jobs PER cut (bracket, counts,
      // floor collect, tied count, id collect ≈ 20 total); batched,
      // every round is one bracket agg + one count agg SHARED by all
      // live ranks and the whole-frame floor collect is shared, so the
      // job count stays far below the per-cut regime and grows with
      // ROUNDS, not ranks. Counted via a job group (the status tracker
      // records submissions synchronously — no listener-bus race).
      spark.sparkContext.setJobGroup("exact-rank-batch", "job-count probe",
        interruptOnCancel = false)
      try {
        val cuts = ExactRank.cutsAt(df, "v", "id",
          ExactRank.ntileCutRanks(n, 5), accuracy = 50, nKnown = Some(n))
        assert(cuts.size === 4)
        val observed = spark.sparkContext.statusTracker
          .getJobIdsForGroup("exact-rank-batch").length
        assert(observed > 0 && observed <= 16,
          s"multi-rank selection ran $observed jobs — batching regressed")
      } finally spark.sparkContext.clearJobGroup()
    } finally df.unpersist()
  }

  test("property sweep: NTILE equivalence across seeds, duplication regimes, and bucket counts") {
    // widen the equivalence net beyond the hand-picked shapes: three
    // seeds × three duplication regimes × two bucket counts, all at an
    // accuracy small enough that the bracket loop iterates
    for (seed <- Seq(1, 17, 4242); card <- Seq(5, 200, 100000)) {
      val rnd = new scala.util.Random(seed)
      val rows = (1L to 1500L).map(i => (i, rnd.nextInt(card).toDouble / 3.0))
      check(rows, 4, accuracy = 60)
      check(rows, 10, accuracy = 60)
    }
  }

  test("batched cutsAt agrees with the single-rank reference selectAt on every cut") {
    val rnd = new scala.util.Random(31)
    // duplicate-heavy values force both the boundary-hit and the
    // id-tiebreak paths through the batch machinery
    val rows = (1L to 3000L).map(i => (i, (rnd.nextInt(23) / 5.0)))
    val df = rows.toDF("id", "v").repartition(4).cache()
    try {
      val n = df.count()
      val ranks = ExactRank.ntileCutRanks(n, 7)
      val batched = ExactRank.cutsAt(df, "v", "id", ranks, accuracy = 100,
        nKnown = Some(n))
      ranks.zip(batched).foreach { case (r, cut) =>
        val (v, lt) = ExactRank.selectAt(df, "v", n, r, 100)
        val tied = df.filter(col("v") === lit(v))
        val (idv, _) = ExactRank.selectAt(tied, "id", tied.count(), r - lt, 100)
        assert(cut.value === v.asInstanceOf[Double] && cut.id === idv.asInstanceOf[Long],
          s"rank $r: batched (${cut.value}, ${cut.id}) != reference ($v, $idv)")
      }
    } finally df.unpersist()
  }

  test("selectAt returns the exact element and below-count on longs") {
    val df = Seq(10L, 20L, 20L, 20L, 30L, 40L).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val (v2, lt2) = ExactRank.selectAt(df, "v", 6, 2, 10000)
    assert(v2 === 20L && lt2 === 1L)
    val (v6, lt6) = ExactRank.selectAt(df, "v", 6, 6, 10000)
    assert(v6 === 40L && lt6 === 5L)
  }
}
