package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{CurationScorecard, NbClassifier, ScorecardIndex, TextAnalytics}
import graft.sources.Ingest

/** Incremental wave scoring must equal the batch scorecard restricted
  * to the wave: every persisted log is exact-integer additive, so
  * build(admitted) + appendWave(wave) + refreshCuts(full) reconstructs
  * the full-corpus model state bit-for-bit. */
class ScorecardIndexSpec extends SparkSpec {

  private def corpus: DataFrame = Ingest.corpusFromDocuments(spark, sfSmall)

  private def labeled(df: DataFrame): DataFrame =
    df.select(col("id"),
      TextAnalytics.tokens(col("sentence")).as("toks"),
      TextAnalytics.qualityKeep(col("sentence")).as("label"))

  test("NB model: save + additive append + load equals a fresh train over the union") {
    val dir = tmpDir("nb-model-")
    val admitted = labeled(corpus.filter(col("id") % 5 =!= 0))
    val wave = labeled(corpus.filter(col("id") % 5 === 0))
    NbClassifier.saveModel(admitted, dir)
    NbClassifier.appendModel(spark, dir, wave)
    val loaded = NbClassifier.loadModel(spark, dir)
    val fresh = NbClassifier.train(labeled(corpus))
    // weights: identical (w, wgt) sets — decimal, so equality is exact
    def wset(df: DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getDecimal(1).toPlainString)).toSet
    assert(wset(loaded._1) == wset(fresh._1))
    def prow(df: DataFrame) = df.collect()
      .map(r => (r.getDecimal(0).toPlainString, r.getDecimal(1).toPlainString)).toSeq
    assert(prow(loaded._2) == prow(fresh._2))
    // and the scored verdicts agree on every document
    val a = NbClassifier.score(loaded, labeled(corpus))
      .select(col("id"), col("log_odds"), col("nb_keep")).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2))).toSet
    val b = NbClassifier.score(fresh, labeled(corpus))
      .select(col("id"), col("log_odds"), col("nb_keep")).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2))).toSet
    assert(a == b)
  }

  private def rows(df: DataFrame) = df.collect().map(r => (
    r.getLong(0), r.getBoolean(1), r.getBoolean(2), r.getBoolean(3),
    if (r.isNullAt(4)) None else Some(r.getDouble(4)),
    if (r.isNullAt(5)) None else Some(r.getLong(5)),
    r.getDouble(6), r.getBoolean(7))).toSeq

  test("wave scoring through the appended index equals full-corpus scoring restricted to the wave") {
    val dir = tmpDir("scorecard-idx-")
    val admitted = corpus.filter(col("id") % 5 =!= 0)
    val wave = corpus.filter(col("id") % 5 === 0)
    // production cadence: build on the standing corpus, append the new
    // wave's deltas (touches only the wave), refresh cuts on schedule
    ScorecardIndex.build(spark, dir, admitted)
    ScorecardIndex.appendWave(spark, dir, wave)
    ScorecardIndex.refreshCuts(spark, dir, corpus)
    val incremental = rows(ScorecardIndex.scoreWave(spark, dir, wave))
    val batch = rows(CurationScorecard.scorecard(spark, sfSmall)
      .filter(col("id") % 5 === 0))
    assert(incremental.size == batch.size && incremental.nonEmpty)
    incremental.zip(batch).foreach { case (i, b) =>
      assert(i == b, s"wave row $i != batch row $b")
    }
  }

  test("log compaction on the wave cadence leaves wave scoring bit-identical") {
    val dir = tmpDir("scorecard-compact-")
    ScorecardIndex.build(spark, dir, corpus.filter(col("id") % 5 === 1))
    // three more waves pile one file per partition per log
    (2 to 4).foreach(r =>
      ScorecardIndex.appendWave(spark, dir, corpus.filter(col("id") % 5 === r)))
    ScorecardIndex.appendWave(spark, dir, corpus.filter(col("id") % 5 === 0))
    ScorecardIndex.refreshCuts(spark, dir, corpus)
    val wave = corpus.filter(col("id") % 5 === 0)
    val before = rows(ScorecardIndex.scoreWave(spark, dir, wave))
    assert(ScorecardIndex.maintain(spark, dir, maxFilesPerPartition = 2),
      "five appended waves must cross a 2-file bound somewhere")
    val after = rows(ScorecardIndex.scoreWave(spark, dir, wave))
    assert(before == after, "compaction changed wave scores")
    // settled: a second cadence pass stands pat
    assert(!ScorecardIndex.maintain(spark, dir, maxFilesPerPartition = 2))
  }

  test("incoming scoring: virtual-union dedup/span signals equal the batch pass over the union") {
    val dir = tmpDir("scorecard-incoming-")
    ScorecardIndex.build(spark, dir, corpus.filter(col("id") % 5 =!= 0))
    val wave = corpus.filter(col("id") % 5 === 0)
    val incoming = ScorecardIndex.scoreWaveIncoming(spark, dir, wave)
      .select("id", "dedup_kept", "dup_fraction").collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getDouble(2))).toSeq
    // dedup/span fold the wave in virtually, so they must equal the
    // full-corpus batch scorecard's values for the wave ids exactly
    val batch = CurationScorecard.scorecard(spark, sfSmall)
      .filter(col("id") % 5 === 0)
      .select("id", "dedup_kept", "dup_fraction").collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getDouble(2))).toSeq
    assert(incoming == batch)
    // the model columns LAG: nb/ppl must equal scoring with a model
    // trained on the admitted half only
    val admittedLab = labeled(corpus.filter(col("id") % 5 =!= 0))
    val waveLab = labeled(wave)
    val nbExpect = NbClassifier.score(NbClassifier.train(admittedLab), waveLab)
      .select("id", "nb_keep").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val got = ScorecardIndex.scoreWaveIncoming(spark, dir, wave)
      .select("id", "nb_keep").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got == nbExpect)
  }

  test("scorecardStream: waves score against everything admitted, then join the corpus") {
    import org.apache.spark.sql.DataFrame
    val keepDoc = (i: Long, tag: String) =>
      (i, s"the quick brown $tag fox jumps over the lazy dog near the river bank")
    val dir = tmpDir("scorecard-stream-idx")
    val landing = tmpDir("scorecard-stream-landing")
    val ckpt = tmpDir("scorecard-stream-ckpt")
    def docs(rows: (Long, String)*): DataFrame = {
      import spark.implicits._
      rows.toDF("id", "sentence")
    }
    // admitted: one quality doc + one junk doc (both NB classes present)
    ScorecardIndex.build(spark, dir,
      docs(keepDoc(0L, "alpha"), 1L -> "0 1 2 3 4 5 6 7 8 9"))
    val schema = docs(0L -> "x").schema
    def stage(name: String, rows: (Long, String)*): Unit = {
      val tmp = tmpDir("scorecard-stream-stage")
      docs(rows: _*).coalesce(1).write.mode("overwrite").parquet(tmp)
      val files = java.nio.file.Files.list(java.nio.file.Paths.get(tmp))
      try files.filter(_.toString.endsWith(".parquet"))
        .forEach(p => java.nio.file.Files.move(p,
          java.nio.file.Paths.get(s"$landing/$name.parquet")))
      finally files.close()
    }
    // wave 1: a novel quality doc; wave 2: its EXACT duplicate plus a
    // fresh doc — the duplicate is only droppable because wave 1 was
    // admitted between the two scoring passes
    val novel = keepDoc(10L, "beta")._2
    stage("w1", 10L -> novel)
    stage("w2", 20L -> novel, 21L -> keepDoc(21L, "gamma")._2)
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Boolean)]
    def run(): Unit = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(landing)
      graft.streaming.IndexMaintenance.scorecardStream(stream, dir,
        (v, _) => seen ++= v.select("id", "dedup_kept").collect()
          .map(r => (r.getLong(0), r.getBoolean(1))),
        checkpointDir = Some(ckpt),
        maintainEvery = 1, maxFilesPerPartition = 2).awaitTermination()
    }
    run()
    val verdicts = seen.toMap
    assert(verdicts(10L), "wave-1 novel doc must be the canonical copy")
    assert(!verdicts(20L), "wave-2 duplicate of an ADMITTED wave-1 doc must not be kept")
    assert(verdicts(21L), "wave-2 novel doc must be kept")
    // replay with nothing new: committed batches skip — no re-emission
    seen.clear(); run()
    assert(seen.isEmpty, s"committed batches must not re-score: $seen")
    // every doc is admitted (the wave-2 duplicate shares wave 1's
    // sentence, so the min-id log holds 4 distinct texts)
    import org.apache.spark.sql.functions.{col => c}
    val mins = spark.read.parquet(s"$dir/mins")
      .groupBy(c("sentence")).count()
    assert(mins.count() == 4L)
  }

  test("scorecardStream: a partially-admitted wave is finished, never re-scored") {
    import org.apache.spark.sql.DataFrame
    val dir = tmpDir("scorecard-partial-idx")
    val landing = tmpDir("scorecard-partial-landing")
    val ckpt = tmpDir("scorecard-partial-ckpt")
    def docs(rows: (Long, String)*): DataFrame = {
      import spark.implicits._
      rows.toDF("id", "sentence")
    }
    ScorecardIndex.build(spark, dir,
      docs(0L -> "the quick brown alpha fox jumps over the lazy dog by the river",
        1L -> "0 1 2 3 4 5 6 7 8 9"))
    val wave = docs(10L -> "the quick brown beta fox jumps over the lazy dog by the river")
    val tmp = tmpDir("scorecard-partial-stage")
    wave.coalesce(1).write.mode("overwrite").parquet(tmp)
    val fs = java.nio.file.Files.list(java.nio.file.Paths.get(tmp))
    try fs.filter(_.toString.endsWith(".parquet"))
      .forEach(p => java.nio.file.Files.move(p,
        java.nio.file.Paths.get(s"$landing/w1.parquet")))
    finally fs.close()
    // simulate the crash window: the wave's admission STARTED (all
    // component commits landed) but the root marker was lost — the
    // replay must not re-score (the span log already holds the wave's
    // windows; a re-score would flag every doc as its own duplicate)
    // and must finish the admission idempotently
    val ns = graft.streaming.IndexMaintenance.checkpointNamespace(Some(ckpt))
    ScorecardIndex.appendWaveBatch(spark, dir, wave, 0L, ns)
    java.nio.file.Files.delete(graft.operators.BatchFs.markerFor(dir, 0L, ns))
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    graft.streaming.IndexMaintenance.scorecardStream(
      spark.readStream.schema(docs(0L -> "x").schema).parquet(landing), dir,
      (v, _) => seen ++= v.select("id").collect().map(_.getLong(0)),
      checkpointDir = Some(ckpt)).awaitTermination()
    assert(seen.isEmpty,
      s"partially-admitted wave must not re-score/re-emit: $seen")
    assert(ScorecardIndex.appendWaveBatch(spark, dir, wave, 0L, ns) == 0L,
      "the stream replay must have finished the admission (root marker restored)")
    // the wave landed exactly once in the min-id log
    assert(spark.read.parquet(s"$dir/mins")
      .filter(col("min_id") === 10L).count() == 1L)
  }

  test("scorecardStream: a crash MID-LM-append (data landed, no lm marker) still suppresses re-scoring") {
    import org.apache.spark.sql.DataFrame
    import graft.operators.{BatchFs, NgramLm, TextAnalytics => TA}
    val dir = tmpDir("scorecard-midlm-idx")
    val landing = tmpDir("scorecard-midlm-landing")
    val ckpt = tmpDir("scorecard-midlm-ckpt")
    def docs(rows: (Long, String)*): DataFrame = {
      import spark.implicits._
      rows.toDF("id", "sentence")
    }
    ScorecardIndex.build(spark, dir,
      docs(0L -> "the quick brown alpha fox jumps over the lazy dog by the river",
        1L -> "0 1 2 3 4 5 6 7 8 9"))
    val wave = docs(10L -> "the quick brown beta fox jumps over the lazy dog by the river")
    val tmp = tmpDir("scorecard-midlm-stage")
    wave.coalesce(1).write.mode("overwrite").parquet(tmp)
    val fs = java.nio.file.Files.list(java.nio.file.Paths.get(tmp))
    try fs.filter(_.toString.endsWith(".parquet"))
      .forEach(p => java.nio.file.Files.move(p,
        java.nio.file.Paths.get(s"$landing/w1.parquet")))
    finally fs.close()
    // the exact window the r10 advice flagged: appendWaveBatch wrote
    // its started sentinel and NgramLm.appendModelBatch committed the
    // uni/bi/tri DATA files, but the crash hit before the lm MARKER
    // landed — the LM log now contains part of the wave's own counts
    // with no component marker to witness it. Simulate by replaying
    // appendWaveBatch's prefix by hand.
    val ns = graft.streaming.IndexMaintenance.checkpointNamespace(Some(ckpt))
    BatchFs.writeMarker(ScorecardIndex.startedSentinel(dir, 0L, ns), "")
    NgramLm.appendModelBatch(spark, s"$dir/lm",
      wave.select(col("id"), TA.tokens(col("sentence")).as("toks"))
        .filter(size(col("toks")) > 0), 0L, ns)
    java.nio.file.Files.delete(BatchFs.markerFor(s"$dir/lm", 0L, ns))
    assert(ScorecardIndex.waveStarted(dir, 0L, ns),
      "the started sentinel must witness the partially-landed LM data")
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    graft.streaming.IndexMaintenance.scorecardStream(
      spark.readStream.schema(docs(0L -> "x").schema).parquet(landing), dir,
      (v, _) => seen ++= v.select("id").collect().map(_.getLong(0)),
      checkpointDir = Some(ckpt)).awaitTermination()
    assert(seen.isEmpty,
      s"a wave with partially-landed LM data must not re-score/re-emit: $seen")
    // the replay FINISHED the admission: every component committed, and
    // the LM log holds the wave's counts exactly once (the replaced
    // b<tag>- files were never doubled)
    assert(ScorecardIndex.appendWaveBatch(spark, dir, wave, 0L, ns) == 0L)
    val uniCount = NgramLm.loadModel(spark, s"$dir/lm").uni
      .filter(col("w") === "beta").collect()
    assert(uniCount.length == 1 && uniCount.head.getLong(1) == 1L,
      s"wave LM counts must land exactly once: ${uniCount.mkString(",")}")
  }

  test("appendWaveBatch: a crash between component commits repairs on replay, no double counts") {
    import graft.operators.{BatchFs, NbClassifier => NB, NgramLm}
    val dir = tmpDir("scorecard-crash-")
    val admitted = corpus.filter(col("id") % 5 =!= 0)
    val wave = corpus.filter(col("id") % 5 === 0)
    ScorecardIndex.build(spark, dir, admitted)
    assert(ScorecardIndex.appendWaveBatch(spark, dir, wave, 5L, "t") > 0L)
    val wantWeights = NB.loadModel(spark, s"$dir/nb")._1.collect()
      .map(r => (r.getString(0), r.getDecimal(1).toPlainString)).toSet
    val wantUni = NgramLm.loadModel(spark, s"$dir/lm").uni.collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val wantMins = spark.read.parquet(s"$dir/mins")
      .groupBy(col("sentence")).agg(min(col("min_id")).as("m")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    // crash window: NB and mins markers lost (their commits "didn't
    // happen" from the replayer's view), LM and spans markers kept —
    // the replay must repair exactly the lost components (their staged
    // b<tag>- files are REPLACED, never doubled) and no-op the rest
    java.nio.file.Files.delete(BatchFs.markerFor(s"$dir/nb", 5L, "t"))
    java.nio.file.Files.delete(BatchFs.markerFor(dir, 5L, "t"))
    ScorecardIndex.appendWaveBatch(spark, dir, wave, 5L, "t")
    val gotWeights = NB.loadModel(spark, s"$dir/nb")._1.collect()
      .map(r => (r.getString(0), r.getDecimal(1).toPlainString)).toSet
    val gotUni = NgramLm.loadModel(spark, s"$dir/lm").uni.collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val gotMins = spark.read.parquet(s"$dir/mins")
      .groupBy(col("sentence")).agg(min(col("min_id")).as("m")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(gotWeights == wantWeights, "NB stats doubled or lost across the crash replay")
    assert(gotUni == wantUni, "LM counts changed although its marker survived")
    assert(gotMins == wantMins, "min-id log changed across the crash replay")
    // and a fully-committed replay is a complete no-op
    assert(ScorecardIndex.appendWaveBatch(spark, dir, wave, 5L, "t") == 0L)
  }

  test("registered wave surface scores every 5th doc against the full-corpus index") {
    val out = ScorecardIndex.scorecardWaveFor(spark, sfSmall)
    val got = rows(out)
    assert(got.nonEmpty && got.forall(_._1 % 5 == 0))
    val batch = rows(CurationScorecard.scorecard(spark, sfSmall)
      .filter(col("id") % 5 === 0))
    assert(got == batch)
  }
}
