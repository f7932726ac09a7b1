package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.TextAnalytics

/** Streaming document curation — the continuous-ingestion twin of the
  * batch curation surface: documents arrive as files in a landing
  * directory, pass the engine's single quality predicate
  * (TextAnalytics.qualityKeep — shared with the batch queries so the
  * two can never drift), and deduplicate on the normalized-text
  * fingerprint in the state store. New corpus drops then stream into
  * the pipeline instead of triggering full recomputes.
  *
  * State posture: `dropDuplicates` on the fingerprint keeps one state
  * row per DISTINCT kept document, forever — right for a finite
  * replay and for moderate corpora; a production feed attaches an
  * arrival timestamp and uses `dropDuplicatesWithinWatermark` to
  * bound state to the dedup horizon (the same decision the events
  * pipeline makes with its 1-hour watermark, EventsStreaming.scala).
  */
object DocCuration {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Streaming DataFrame of documents (same symlink staging as
    * EventsStreaming.readEvents: the driver testdata is one file; the
    * file source monitors a directory — in production, the landing
    * zone). */
  def readDocuments(spark: SparkSession, sfDir: String): DataFrame = {
    val stage = java.nio.file.Paths.get(
      s"/root/repo/target/stream-src-docs/${new java.io.File(sfDir).getName}")
    java.nio.file.Files.createDirectories(stage)
    val link = stage.resolve("documents.parquet")
    if (!java.nio.file.Files.exists(link)) {
      java.nio.file.Files.createSymbolicLink(
        link, java.nio.file.Paths.get(s"$sfDir/documents.parquet"))
    }
    spark.readStream.schema(docSchema).parquet(stage.toString)
  }

  /** Quality filter + fingerprint dedup, all narrow until the
    * state-store exchange on md5_norm. Works identically on a batch
    * DataFrame (the filters and fingerprint are plain projections) —
    * tests exploit that to diff stream vs batch. */
  def curateDocuments(stream: DataFrame): DataFrame =
    stream
      .withColumn("sentence", trim(col("text")))
      .where(length(col("sentence")) > 0)
      .where(TextAnalytics.qualityKeep(col("sentence")))
      .withColumn("md5_norm",
        md5(concat_ws(" ", TextAnalytics.tokens(col("sentence")))))
      .dropDuplicates("md5_norm")

  /** The production-posture variant: documents carry an arrival
    * timestamp, and dedup state is BOUNDED to the watermark horizon
    * with `dropDuplicatesWithinWatermark` — a duplicate arriving
    * within `watermarkDelay` of the original is dropped; one arriving
    * after the state expired is admitted again (the explicit
    * correctness/state-size trade a 100 TB feed makes; unbounded
    * dedup is a batch backfill's job). */
  def curateDocumentsBounded(stream: DataFrame,
                             watermarkDelay: String = "1 hour"): DataFrame =
    stream
      .withColumn("sentence", trim(col("text")))
      .where(length(col("sentence")) > 0)
      .where(TextAnalytics.qualityKeep(col("sentence")))
      .withColumn("md5_norm",
        md5(concat_ws(" ", TextAnalytics.tokens(col("sentence")))))
      .withWatermark("arrival_ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("md5_norm")

  /** Registered-query surface: the curated corpus's fingerprint set.
    * WHICH doc of a duplicate group survives depends on arrival order
    * (micro-batch interleaving), but the fingerprint SET is
    * deterministic — that set, sorted, is what the DuckDB oracle
    * reproduces. */
  def curatedFingerprints(spark: SparkSession, sfDir: String): DataFrame =
    EventsStreaming.runToCompletion(
      curateDocuments(readDocuments(spark, sfDir)), "doc_curation")
      .select(col("md5_norm"))
      .orderBy(col("md5_norm").asc)
}
