package graft

import org.apache.spark.sql.functions._
import graft.streaming.EventsStreaming

/** Structured Streaming parity: the watermarked windowed aggregate
  * over a finite replay must equal the batch query (no late data). */
class StreamingSpec extends SparkSpec {

  test("streaming events_hourly equals the batch aggregate on replay") {
    val streamed = EventsStreaming.runToCompletion(
      EventsStreaming.eventsHourly(EventsStreaming.readEvents(spark, sfSmall)),
      "test_events_hourly")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    val batch = graft.operators.RelationalOps.eventsHourly(spark, sfSmall)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(streamed == batch)
  }

  test("streaming dedup drops duplicate event_ids within the watermark") {
    val deduped = EventsStreaming.runToCompletion(
      EventsStreaming.dedupEvents(EventsStreaming.readEvents(spark, sfSmall)),
      "test_dedup_events")
    val total = Tables.events(spark, sfSmall).count()
    val distinct = Tables.events(spark, sfSmall).select("event_id").distinct().count()
    assert(deduped.count() == distinct)
    assert(deduped.select("event_id").distinct().count() == distinct)
    assert(total >= distinct)
  }
}
