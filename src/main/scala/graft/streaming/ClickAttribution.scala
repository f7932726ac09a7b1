package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream join (SURVEY.md §2.9): click→purchase attribution as
  * two live streams — the streaming twin of
  * `RelationalOps.intervalJoinCounts`. Each side carries its own
  * watermark and the join condition carries the time range, so Spark
  * bounds BOTH state stores: a click is held only until the purchase
  * watermark passes its attribution window, and vice versa — the
  * canonical bounded-state stream-stream join, not an unbounded
  * buffer.
  *
  * On a finite single-batch replay every pair lands in state together,
  * so the emitted pair set equals the batch inequality join exactly —
  * which makes this the one streaming query with a full SQL oracle
  * over PAIRS (events_hourly_stream oracles an aggregate).
  *
  * Scale posture: the join keys on user_id (hash-shuffled once per
  * side); state per key is the in-window events only. At 100 TB-rate
  * ingest the file sources swap for Kafka and nothing in the plan
  * changes.
  */
object ClickAttribution {

  /** (click_id, purchase_id, user_id) pairs: purchases strictly after
    * the click and within one hour. */
  def attributionPairs(spark: org.apache.spark.sql.SparkSession,
                       sfDir: String): DataFrame = {
    val clicks = EventsStreaming.readEvents(spark, sfDir)
      .filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"),
        col("user_id").as("c_user"), col("ts").as("cts"))
      .withWatermark("cts", "1 hour")
    val purchases = EventsStreaming.readEvents(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user"), col("ts").as("pts"))
      .withWatermark("pts", "2 hours")
    clicks.join(purchases,
      col("c_user") === col("p_user") &&
        col("pts") > col("cts") &&
        col("pts") <= col("cts") + expr("INTERVAL 1 HOUR"))
      .select(col("click_id"), col("purchase_id"), col("c_user").as("user_id"))
  }

  /** Run the replay to completion and return the ordered pair table
    * (the registered-query entry point). */
  def attributionReplay(spark: org.apache.spark.sql.SparkSession,
                        sfDir: String): DataFrame =
    EventsStreaming.runToCompletion(
      attributionPairs(spark, sfDir), "click_attribution")
      .orderBy(col("click_id").asc, col("purchase_id").asc)
}
