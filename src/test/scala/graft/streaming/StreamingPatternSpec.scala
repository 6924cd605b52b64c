package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

/** Pins the on-arrival CEP NFA (streamingEventPattern) to batch q201's
  * regex semantics: per-user non-overlapping leftmost `vc*p` match
  * counts are identical across arbitrary micro-batch splits, including
  * a live `v c*` prefix crossing a batch boundary.
  */
class StreamingPatternSpec extends SparkSpec {
  import spark.implicits._

  test("streaming event-pattern NFA matches batch regexp_count across micro-batches") {
    implicit val sql = spark.sqlContext
    // (event_id, user_id, event_type, ts_ms) — user 7's funnel spans the
    // first/second micro-batch boundary (v,c in batch 1; p in batch 2);
    // user 9 has a broken funnel (error intervenes) then a clean one;
    // user 11 tests restart-on-view (v c v p => one match) and a
    // same-ts tie ordered by event_id.
    val rows = Seq(
      (1L, 7L, "view", 0L), (2L, 7L, "click", 10L),
      (3L, 9L, "view", 5L), (4L, 9L, "error", 6L),
      // --- batch split here ---
      (5L, 7L, "purchase", 20L), (6L, 9L, "view", 7L),
      (7L, 11L, "view", 0L), (8L, 11L, "click", 1L),
      // --- batch split here ---
      (9L, 11L, "view", 2L), (10L, 11L, "purchase", 3L),
      (11L, 9L, "purchase", 8L), (12L, 7L, "view", 30L),
      (13L, 7L, "purchase", 31L), (14L, 7L, "purchase", 31L) // tie: id 13 first
    )
    // batch expectation: Java regex over the (ts_ms, event_id)-ordered
    // char sequence — exactly what q201's regexp_count evaluates
    val expect = rows.groupBy(_._2).map { case (u, evs) =>
      val seq = evs.sortBy(e => (e._4, e._1)).map(_._3.head).mkString
      u -> "vc*p".r.findAllIn(seq).size.toLong
    }.filter(_._2 > 0)

    val in = MemoryStream[(Long, Long, String, Long)]
    val out = StatefulStreams
      .streamingEventPattern(in.toDF().toDF("event_id", "user_id", "event_type", "ts_ms"))
      .toDF("user_id", "match_ts")
    val q = out.writeStream.format("memory").queryName("scep")
      .outputMode("append").start()
    try {
      in.addData(rows.take(4)); q.processAllAvailable()
      in.addData(rows.slice(4, 8)); q.processAllAvailable()
      in.addData(rows.drop(8)); q.processAllAvailable()
      val got = spark.table("scep").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val counts = got.groupBy(_._1).map { case (u, ms) => u -> ms.size.toLong }
      assert(counts == expect, s"got $counts\nexp $expect")
      // the cross-boundary funnel completed at user 7's first purchase
      assert(got.contains((7L, 20L)), "v..c | p across the boundary must match")
      // non-overlap: user 7's second purchase (same run) must NOT match twice
      assert(got.count(_._1 == 7L) == 2)
    } finally q.stop()
  }
}
