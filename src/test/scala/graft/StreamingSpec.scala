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

  test("streaming session_window: append emits exactly the watermark-closed sessions") {
    val streamed = EventsStreaming.runToCompletion(
      EventsStreaming.userSessions(EventsStreaming.readEvents(spark, sfSmall),
        watermarkDelay = "0 seconds"),
      "test_sessions")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val batch = graft.operators.RelationalOps.userSessions(spark, sfSmall)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    // emitted rows must be a subset of the batch sessions, bit-identical
    assert(streamed.subsetOf(batch),
      s"streamed rows not in batch: ${streamed.diff(batch).take(3)}")
    // and every session the final watermark (= max event ts at delay 0)
    // strictly passed — end = last event + 30min gap < max ts — must
    // have been emitted. Derive session ends driver-side.
    val events = Tables.events(spark, sfSmall)
      .select("user_id", "ts").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime))
    val maxTs = events.map(_._2).max
    val gapMs = 30L * 60 * 1000
    val sessions = events.groupBy(_._1).iterator.flatMap { case (_, rows) =>
      val ts = rows.map(_._2).sorted
      ts.foldLeft(List.empty[List[Long]]) {
        case (Nil, t) => List(List(t))
        case (cur :: done, t) =>
          if (t - cur.head >= gapMs) List(t) :: cur :: done
          else (t :: cur) :: done
      }
    }.toSeq
    // must emit: sessions the final watermark (max ts, delay 0)
    // strictly passed. May also emit: sessions whose last event sits
    // exactly AT the watermark (observed no-data-batch eviction corner;
    // ±1ms slack because collected timestamps truncate micros).
    val lo = sessions.count(s => s.head + gapMs < maxTs - 1)
    val hi = sessions.count(s => s.head + gapMs < maxTs + 1 || (s.head - maxTs).abs <= 1)
    assert(streamed.size >= lo && streamed.size <= hi,
      s"expected [$lo, $hi] closed sessions, streamed ${streamed.size}")
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
