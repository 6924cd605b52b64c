package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec
import graft.queries.EventWindows

/** Pins the on-arrival attribution-edge stream against batch
  * attributionEdgesOf over the union of the micro-batches, across a
  * batch boundary that lands MID-SESSION: session continuation,
  * conversion suppression (post-purchase events emit nothing but keep
  * the gap clock running), and NULL terminals emitted when the next
  * session's first event proves the gap. Every user's final session
  * converts, so the batch and stream define the same edge multiset.
  */
class StreamingAttributionSpec extends SparkSpec {
  import spark.implicits._

  test("streamed edges equal the batch derivation across micro-batches") {
    implicit val sql = spark.sqlContext
    val h = 1700000000000L
    val gap = 2000000L // > 30 min
    // (event_id, user_id, event_type, ts_ms)
    val b1 = Seq(
      (1L, 1L, "view", h), (2L, 1L, "click", h + 1000),
      (10L, 2L, "click", h), (11L, 2L, "purchase", h + 1000))
    val b2 = Seq(
      (12L, 2L, "view", h + 2000), // post-purchase: suppressed, clock runs
      (3L, 1L, "view", h + gap), (4L, 1L, "purchase", h + gap + 1000),
      (13L, 2L, "purchase", h + 2000 + gap))
    val in = MemoryStream[(Long, Long, String, Long)]
    // flushAfterMs = None: this spec pins batch parity via AvailableNow,
    // which never terminates under a processing-time flush timer (the
    // engine always schedules another batch so timers can fire);
    // StateBoundSpec drives the timer path with a polling sink.
    val edges = StatefulStreams.streamingAttributionEdges(
      in.toDF().toDF("event_id", "user_id", "event_type", "ts_ms"), None)
    val q = edges.toDF("from_state", "to_state")
      .writeStream.format("memory").queryName("attredges")
      .outputMode("append").trigger(Trigger.AvailableNow())
    in.addData(b1); val h1 = q.start(); h1.awaitTermination()
    in.addData(b2); val h2 = q.start(); h2.awaitTermination()
    def counts(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getString(0), r.getString(1)))
        .groupBy(identity).map { case (k, v) => k -> v.size }
    val got = counts(spark.table("attredges").collect())
    val want = counts(EventWindows.attributionEdgesOf(
      (b1 ++ b2).toDF("event_id", "user_id", "event_type", "ts_ms")
        .selectExpr("user_id", "event_id", "event_type", "ts_ms")).collect())
    assert(got == want, s"got $got want $want")
    // the hand-derivable multiset, as a second, independent pin
    assert(got == Map(
      ("START", "view") -> 2, ("view", "click") -> 1, ("click", "NULL") -> 1,
      ("view", "CONV") -> 1, ("START", "click") -> 1, ("click", "CONV") -> 1,
      ("START", "CONV") -> 1))
  }
}
