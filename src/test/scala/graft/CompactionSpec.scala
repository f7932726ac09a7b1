package graft

import org.apache.spark.sql.functions._
import graft.operators.{Compaction, MinhashIndex, NgramLm, TextSearch}
import graft.sources.Ingest

/** Compaction must be invisible to readers (bit-identical results),
  * must reduce per-bucket file counts, and must NEVER fold a
  * not-yet-committed batch file (a replay would double its rows). */
class CompactionSpec extends SparkSpec {

  test("term index: appends compact to fewer files, search results bit-identical") {
    val corpus = Ingest.corpusFromDocuments(spark, sfSmall)
    val first = corpus.filter(col("id") < 200)
    val mid = corpus.filter(col("id") >= 200 && col("id") < 350)
    val rest = corpus.filter(col("id") >= 350)
    val dir = tmpDir("compact-term-")
    TextSearch.saveTermIndex(TextSearch.buildTermIndex(first, nBuckets = 8), dir)
    TextSearch.appendTermBatch(spark, dir, mid, 1L, "c")
    TextSearch.appendTermBatch(spark, dir, rest, 2L, "c")
    val beforeRows = TextSearch.loadTermIndex(spark, dir).postings
      .orderBy(col("term"), col("id")).collect()
    val (nb, na) = Compaction.compactTermIndex(spark, dir)
    assert(na < nb, s"no reduction: $nb -> $na")
    val afterRows = TextSearch.loadTermIndex(spark, dir).postings
      .orderBy(col("term"), col("id")).collect()
    assert(beforeRows.sameElements(afterRows))
    // a replayed committed batch is still a no-op after compaction
    assert(TextSearch.appendTermBatch(spark, dir, mid, 1L, "c") == 0L)
  }

  test("LM model: compacted count logs load to identical scores") {
    val corpus = Ingest.corpusFromDocuments(spark, sfSmall)
    val docs = NgramLm.tokenized(corpus)
    val first = docs.filter(col("id") < 250)
    val rest = docs.filter(col("id") >= 250)
    val dir = tmpDir("compact-lm-")
    NgramLm.saveModel(NgramLm.train(first), dir)
    NgramLm.appendModelBatch(spark, dir, rest, 3L, "c")
    val before = NgramLm.score(NgramLm.loadModel(spark, dir), docs)
      .orderBy(col("id")).collect()
    val (nb, na) = Compaction.compactLmModel(spark, dir)
    assert(na < nb, s"no reduction: $nb -> $na")
    val after = NgramLm.score(NgramLm.loadModel(spark, dir), docs)
      .orderBy(col("id")).collect()
    assert(before.sameElements(after))
  }

  test("minhash index: compaction preserves probe verdicts") {
    val corpus = Ingest.corpusFromDocuments(spark, sfSmall)
    val dir = tmpDir("compact-mh-")
    MinhashIndex.save(corpus.filter(col("id") < 300), dir, nBuckets = 8)
    MinhashIndex.appendBatch(spark, dir,
      corpus.filter(col("id") >= 300 && col("id") < 400), 1L, "c")
    val wave = corpus.filter(col("id") >= 400 && col("id") < 450)
    val before = MinhashIndex.probe(spark, dir, wave)
      .orderBy(col("probe_id"), col("index_id")).collect()
    val (nb, na) = Compaction.compactMinhashIndex(spark, dir)
    assert(na < nb, s"no reduction: $nb -> $na")
    val after = MinhashIndex.probe(spark, dir, wave)
      .orderBy(col("probe_id"), col("index_id")).collect()
    assert(before.sameElements(after))
  }

  test("maintainLog compacts only past the file-count bound") {
    val corpus = Ingest.corpusFromDocuments(spark, sfSmall)
    val dir = tmpDir("compact-maintain-")
    TextSearch.saveTermIndex(
      TextSearch.buildTermIndex(corpus.filter(col("id") < 200), nBuckets = 4), dir)
    TextSearch.appendTermBatch(spark, dir,
      corpus.filter(col("id") >= 200 && col("id") < 300), 1L, "m")
    // 2 files per bucket — under a bound of 4: stands pat
    val (did1, max1) = Compaction.maintainLog(spark, s"$dir/postings", dir, "bucket", 4)
    assert(!did1 && max1 == 2, s"($did1, $max1)")
    TextSearch.appendTermBatch(spark, dir,
      corpus.filter(col("id") >= 300 && col("id") < 400), 2L, "m")
    TextSearch.appendTermBatch(spark, dir,
      corpus.filter(col("id") >= 400), 3L, "m")
    // 4 files per bucket — past a bound of 3: compacts back to 1
    val (did2, max2) = Compaction.maintainLog(spark, s"$dir/postings", dir, "bucket", 3)
    assert(did2 && max2 == 4, s"($did2, $max2)")
    val (did3, max3) = Compaction.maintainLog(spark, s"$dir/postings", dir, "bucket", 3)
    assert(!did3 && max3 == 1, s"($did3, $max3)")
  }

  test("batch tags parse at the LAST -part- boundary: dashed namespaces never truncate") {
    // a namespace that itself contains "-part-" must still round-trip:
    // splitting at the FIRST occurrence would extract "ns" and
    // misclassify the file as belonging to a tag no marker can match
    assert(Compaction.batchTagOf("bns-part-x-7-part-00000-abc.parquet")
      === Some("ns-part-x-7"))
    assert(Compaction.batchTagOf("bc-7-part-00000-abc.parquet") === Some("c-7"))
    assert(Compaction.batchTagOf("part-00000-abc.parquet") === None)
    assert(Compaction.batchTagOf("b-part-00000.parquet") === None)
  }

  test("maintainLog triggers on committed files only: crashed orphans cannot cause rewrite churn") {
    import java.nio.file.{Files, Paths}
    val corpus = Ingest.corpusFromDocuments(spark, sfSmall)
    val dir = tmpDir("compact-orphan-trigger-")
    TextSearch.saveTermIndex(
      TextSearch.buildTermIndex(corpus.filter(col("id") < 200), nBuckets = 4), dir)
    // pile marker-less batch files into one bucket, past the bound
    val bucket0 = Paths.get(s"$dir/postings/bucket=0")
    val base = graft.operators.BatchFs.children(bucket0)
      .filter(_.getFileName.toString.endsWith(".parquet")).head
    (1 to 5).foreach(i =>
      Files.copy(base, bucket0.resolve(s"b9-$i-part-0000$i-orphan.parquet")))
    // 6 raw files but only 1 committed: compaction could never reduce
    // the count, so the trigger must NOT fire (the pre-fix behavior was
    // a full rewrite every cadence, forever)
    val (did, maxFiles) = Compaction.maintainLog(spark, s"$dir/postings", dir, "bucket", 3)
    assert(!did && maxFiles == 1, s"($did, $maxFiles)")
    // the orphans are still there, untouched
    assert(graft.operators.BatchFs.children(bucket0)
      .count(_.getFileName.toString.startsWith("b9-")) == 5)
  }

  test("non-canonical live partition names abort the swap loudly instead of losing rows") {
    import java.nio.file.{Files, Paths}
    val corpus = Ingest.corpusFromDocuments(spark, sfSmall)
    val dir = tmpDir("compact-noncanon-")
    TextSearch.saveTermIndex(
      TextSearch.buildTermIndex(corpus.filter(col("id") < 200), nBuckets = 4), dir)
    // a non-Spark writer lands committed rows under a NON-CANONICAL
    // partition dir: Spark reads bucket=07 as value 7 and stages it as
    // bucket=7 — name-based promotion would silently drop the rows
    // (the pre-fix behavior promoted an empty staged dir over them)
    val alien = Paths.get(s"$dir/postings/bucket=07")
    Files.createDirectories(alien)
    val base = graft.operators.BatchFs.children(Paths.get(s"$dir/postings/bucket=0"))
      .filter(_.getFileName.toString.endsWith(".parquet")).head
    Files.copy(base, alien.resolve(base.getFileName))
    val rowsBefore = spark.read.parquet(s"$dir/postings").count()
    val e = intercept[IllegalArgumentException](
      Compaction.compactTermIndex(spark, dir))
    assert(e.getMessage.contains("round-trip"), e.getMessage)
    // nothing was renamed or dropped: every committed row still reads
    assert(spark.read.parquet(s"$dir/postings").count() == rowsBefore)
    assert(graft.operators.BatchFs.children(Paths.get(s"$dir/postings"))
      .forall(!_.getFileName.toString.startsWith("_old-")))
  }

  test("maintainLog survives the canonical-name abort: skip + untouched log, never a thrown cadence") {
    import java.nio.file.{Files, Paths}
    val corpus = Ingest.corpusFromDocuments(spark, sfSmall)
    val dir = tmpDir("compact-maintain-skip-")
    TextSearch.saveTermIndex(
      TextSearch.buildTermIndex(corpus.filter(col("id") < 200), nBuckets = 4), dir)
    (1 to 3).foreach(i => TextSearch.appendTermBatch(spark, dir,
      corpus.filter(col("id") >= 200 + 100 * (i - 1) && col("id") < 200 + 100 * i),
      i.toLong, "s"))
    // same non-canonical alien partition as the compactPartitions abort
    // test — but the streaming cadence reaches compaction through
    // maintainLog, where an abort must degrade to a logged SKIP: a
    // thrown require would fail the whole streaming query every cadence
    val alien = Paths.get(s"$dir/postings/bucket=07")
    Files.createDirectories(alien)
    val base = graft.operators.BatchFs.children(Paths.get(s"$dir/postings/bucket=0"))
      .filter(_.getFileName.toString.endsWith(".parquet")).head
    Files.copy(base, alien.resolve(base.getFileName))
    val rowsBefore = spark.read.parquet(s"$dir/postings").count()
    val (did, maxFiles) = Compaction.maintainLog(spark, s"$dir/postings", dir, "bucket", 3)
    assert(!did && maxFiles == 4, s"($did, $maxFiles)")
    // the log is untouched and the staged re-derivation was cleaned up
    assert(spark.read.parquet(s"$dir/postings").count() == rowsBefore)
    assert(!Files.exists(Paths.get(s"$dir/postings.compact-staging")))
    // the offline entry point keeps the hard failure
    intercept[IllegalArgumentException](Compaction.compactTermIndex(spark, dir))
  }

  test("a crash between rename-aside and promote loses nothing on the next pass") {
    import java.nio.file.{Files, Paths}
    val corpus = Ingest.corpusFromDocuments(spark, sfSmall)
    val dir = tmpDir("compact-recover-")
    TextSearch.saveTermIndex(
      TextSearch.buildTermIndex(corpus.filter(col("id") < 250), nBuckets = 4), dir)
    TextSearch.appendTermBatch(spark, dir,
      corpus.filter(col("id") >= 250), 1L, "r")
    val expected = spark.read.parquet(s"$dir/postings")
      .orderBy(col("term"), col("id")).collect()
    // simulate the exact crash window: bucket=1 fully staged, live
    // renamed aside, promote never ran
    val live = Paths.get(s"$dir/postings/bucket=1")
    val staged = Paths.get(s"$dir/postings.compact-staging/bucket=1")
    Files.createDirectories(staged)
    graft.operators.BatchFs.children(live)
      .foreach(f => Files.move(f, staged.resolve(f.getFileName)))
    Files.move(live, Paths.get(s"$dir/postings/_old-bucket=1"))
    // next pass recovers, then compacts normally
    Compaction.compactTermIndex(spark, dir)
    val got = spark.read.parquet(s"$dir/postings")
      .orderBy(col("term"), col("id")).collect()
    assert(expected.sameElements(got), "rows lost or duplicated across recovery")
    assert(!Files.exists(Paths.get(s"$dir/postings/_old-bucket=1")))
    assert(!Files.exists(Paths.get(s"$dir/postings.compact-staging")))
  }

  test("a crash after rename-aside with staging lost restores the set-aside partition") {
    import java.nio.file.{Files, Paths}
    val corpus = Ingest.corpusFromDocuments(spark, sfSmall)
    val dir = tmpDir("compact-restore-")
    TextSearch.saveTermIndex(
      TextSearch.buildTermIndex(corpus.filter(col("id") < 250), nBuckets = 4), dir)
    TextSearch.appendTermBatch(spark, dir,
      corpus.filter(col("id") >= 250), 1L, "r")
    val expected = spark.read.parquet(s"$dir/postings")
      .orderBy(col("term"), col("id")).collect()
    // crash window: live renamed aside, but the staged replacement is
    // GONE (e.g. the staging delete raced the crash) — recovery's only
    // safe move is restoring the set-aside dir verbatim
    val live = Paths.get(s"$dir/postings/bucket=2")
    Files.move(live, Paths.get(s"$dir/postings/_old-bucket=2"))
    Compaction.compactTermIndex(spark, dir)
    val got = spark.read.parquet(s"$dir/postings")
      .orderBy(col("term"), col("id")).collect()
    assert(expected.sameElements(got), "rows lost across the restore-unwind recovery")
    assert(!Files.exists(Paths.get(s"$dir/postings/_old-bucket=2")))
  }

  test("an uncommitted batch file is carried over, never folded") {
    import java.nio.file.{Files, Paths}
    val corpus = Ingest.corpusFromDocuments(spark, sfSmall)
    val dir = tmpDir("compact-crash-")
    TextSearch.saveTermIndex(
      TextSearch.buildTermIndex(corpus.filter(col("id") < 200), nBuckets = 4), dir)
    TextSearch.appendTermBatch(spark, dir,
      corpus.filter(col("id") >= 200 && col("id") < 300), 1L, "c")
    // simulate a crashed (marker-less) batch commit: a b<tag>- file
    // sitting in a bucket with no marker for its tag
    val bucket0 = Paths.get(s"$dir/postings/bucket=0")
    val committedFile = graft.operators.BatchFs.children(bucket0)
      .filter(_.getFileName.toString.endsWith(".parquet")).head
    val orphan = bucket0.resolve("b9-9-part-00000-orphan.parquet")
    Files.copy(committedFile, orphan)
    val rowsBefore = spark.read.parquet(s"$dir/postings").count()
    Compaction.compactTermIndex(spark, dir)
    // the orphan survives under its exact name for the replay's
    // clearBatch to find, and total visible rows are unchanged
    assert(Files.exists(orphan), "uncommitted batch file was folded/destroyed")
    assert(spark.read.parquet(s"$dir/postings").count() == rowsBefore)
    // bucket 0 now holds exactly the compacted file + the orphan
    val names = graft.operators.BatchFs.children(bucket0)
      .map(_.getFileName.toString).filter(_.endsWith(".parquet"))
    assert(names.length == 2 && names.contains(orphan.getFileName.toString))
  }
}
