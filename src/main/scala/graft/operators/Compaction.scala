package graft.operators

import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Compaction for the additive bucket-partitioned index logs — the
  * missing lifecycle piece of the append-only maintenance story. Every
  * idempotent batch append ([[TextSearch.appendTermBatch]],
  * [[MinhashIndex.appendBatch]], [[NgramLm.appendModelBatch]],
  * [[IvfIndex.appendBatch]], [[SpanDedup]]'s count log) adds one file
  * per touched partition per wave; at 100 TB ingest cadence the
  * per-bucket file count — and with it scan open-file overhead — grows
  * without bound. `compactPartitions` rewrites each partition's
  * COMMITTED files into one file, row-for-row (readers that sum count
  * logs or scan postings see identical data, test-pinned
  * bit-identical), while leaving the append protocol's crash-recovery
  * machinery intact:
  *
  *  - only committed data is folded: a `b<tag>-` file whose marker is
  *    absent belongs to a crashed, not-yet-replayed batch — folding it
  *    would double its rows when the source replays. Such files are
  *    carried over untouched, so the replay's clearBatch+commit cycle
  *    still finds them under their batch prefix;
  *  - markers are preserved: a batch replayed AFTER compaction still
  *    sees its marker and no-ops (its rows now live in the compacted
  *    file);
  *  - the swap is the Upsert per-partition delete-then-move (staged
  *    dir fully written first). Crash posture matches Upsert: a crash
  *    mid-swap leaves partitions either compacted or original, each
  *    internally consistent; re-running compaction is idempotent.
  *    Single-writer maintenance windows are assumed, as everywhere in
  *    this repo's sink family. */
object Compaction {

  /** `b<tag>-part-….parquet` → Some(tag); base files → None. Exact
    * extraction at the `-part-` boundary (Spark part files always
    * start with `part-`), so a tag containing dashes — the
    * namespace-batchId scheme — never misclassifies. */
  private def batchTagOf(name: String): Option[String] = {
    val i = name.indexOf("-part-")
    if (name.startsWith("b") && i > 1) Some(name.substring(1, i)) else None
  }

  /** Compact one additive log directory `dataDir` laid out as
    * `<partCol>=<v>/` parquet partitions, with commit markers under
    * `markerRoot` (the index root — several logs can share one marker
    * dir, e.g. the LM's uni/bi/tri). Returns
    * (parquet files before, parquet files after). */
  def compactPartitions(spark: SparkSession, dataDir: String,
                        markerRoot: String, partCol: String): (Int, Int) = {
    val root = Paths.get(dataDir)
    if (!Files.exists(root)) return (0, 0)
    val markerDir =
      Paths.get(s"$markerRoot/_committed/${BatchFs.MarkerSchemeVersion}")
    val committedTags: Set[String] =
      if (Files.exists(markerDir))
        BatchFs.children(markerDir).map(_.getFileName.toString).toSet
      else Set.empty
    val partDirs = BatchFs.children(root).filter(p =>
      Files.isDirectory(p) && p.getFileName.toString.startsWith(s"$partCol="))
    def parquets(d: Path) = BatchFs.children(d)
      .filter(_.getFileName.toString.endsWith(".parquet"))
    val byPart = partDirs.map(d => d -> parquets(d))
    val before = byPart.map(_._2.size).sum
    val committed = byPart.flatMap(_._2).filter { f =>
      batchTagOf(f.getFileName.toString).forall(committedTags.contains)
    }
    if (committed.isEmpty) return (before, before)
    val staging = s"$dataDir.compact-staging"
    spark.read.option("basePath", dataDir)
      .parquet(committed.map(_.toString): _*)
      .repartition(col(partCol))
      .write.mode("overwrite").partitionBy(partCol).parquet(staging)
    // swap each partition: carry uncommitted batch files over, then
    // delete-then-move (the Upsert posture)
    byPart.foreach { case (live, files) =>
      val staged = Paths.get(s"$staging/${live.getFileName}")
      Files.createDirectories(staged)
      files.filter { f =>
        batchTagOf(f.getFileName.toString).exists(!committedTags.contains(_))
      }.foreach(f => Files.move(f, staged.resolve(f.getFileName)))
      BatchFs.deleteRecursively(live)
      Files.move(staged, live)
    }
    BatchFs.deleteRecursively(Paths.get(staging))
    val after = partDirs.map(parquets(_).size).sum
    (before, after)
  }

  /** Compact every log of a persisted BM25 term index. */
  def compactTermIndex(spark: SparkSession, dir: String): (Int, Int) =
    compactPartitions(spark, s"$dir/postings", dir, "bucket")

  /** Compact both logs of a persisted MinHash index. */
  def compactMinhashIndex(spark: SparkSession, dir: String): (Int, Int) = {
    val a = compactPartitions(spark, s"$dir/bands", dir, "bucket")
    val b = compactPartitions(spark, s"$dir/docs", dir, "bucket")
    (a._1 + b._1, a._2 + b._2)
  }

  /** Compact the three count logs of a persisted n-gram LM. */
  def compactLmModel(spark: SparkSession, dir: String): (Int, Int) =
    Seq("uni", "bi", "tri").map(sub =>
      compactPartitions(spark, s"$dir/$sub", dir, "bucket"))
      .reduce((x, y) => (x._1 + y._1, x._2 + y._2))

  /** Compact a persisted IVF index's postings (inverted lists). */
  def compactIvfIndex(spark: SparkSession, dir: String): (Int, Int) =
    compactPartitions(spark, s"$dir/postings", dir, "list_id")

  /** Compact a span-dedup window-count log. */
  def compactSpanIndex(spark: SparkSession, dir: String): (Int, Int) =
    compactPartitions(spark, s"$dir/counts", dir, "bucket")
}
