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
