package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}
import org.apache.spark.sql.types._

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  * All operators take `(SparkSession, sfDir)` and read through here so
  * scans stay uniform (plain parquet; Catalyst handles predicate
  * pushdown and column pruning).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def nation(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "region")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "part")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's reader
    * rejects outright (PARQUET_TYPE_ILLEGAL). Read it as raw nanos via
    * schema override and truncate to microseconds — the same
    * conversion DuckDB applies internally (its timestamps are µs), so
    * oracle comparisons stay exact.
    *
    * The truncation MUST be integer division (`div`): epoch nanos
    * (~1.7e18) exceed a double's 2^53 exact-integer range, so
    * `floor(ts / 1000)` — double division — lands ±1 µs off the true
    * value on ~half the rows. Coarse-granularity oracles never saw it;
    * exact-micros ones (conv latencies) do. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    spark.read.schema(raw).parquet(s"$sfDir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
}
