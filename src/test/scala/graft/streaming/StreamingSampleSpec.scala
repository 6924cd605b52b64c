package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

/** Parity pin for the continuously-maintained priority sample: after
  * an arbitrary micro-batch split, the final Update emission is
  * row-identical to batch q138 over the same rows — including the
  * IEEE-double priorities and τ-thresholded weight estimates.
  */
class StreamingSampleSpec extends SparkSpec {
  import spark.implicits._

  test("streaming priority sample converges to batch q138 across micro-batches") {
    implicit val sql = spark.sqlContext
    val docs = Seq(
      (1L, 100L), (2L, 5000L), (3L, 40L), (4L, 900L), (5L, 7L), (6L, 2500L))
    val k = 3
    val expect = graft.queries.Sampling
      .prioritySampleOf(docs.toDF("doc_id", "n_chars"), k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toSet

    val in = MemoryStream[(Long, Long)]
    val out = StatefulStreams
      .streamingPrioritySample(in.toDF().toDF("doc_id", "n_chars"), k)
      .toDF("doc_id", "w", "priority", "est_w")
    val q = out.writeStream.format("memory").queryName("spri")
      .outputMode("update").start()
    try {
      in.addData(docs.take(2)) // only 2 docs < k+1: no emission yet
      q.processAllAvailable()
      assert(spark.table("spri").count() == 0)
      in.addData(docs.slice(2, 5)) // 5 docs >= k+1: sample live
      q.processAllAvailable()
      val mid = spark.table("spri").count()
      assert(mid == k, s"mid-stream emission: $mid rows")
      in.addData(docs.drop(5)) // replay-free final batch
      q.processAllAvailable()
      val rows = spark.table("spri").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      // Update mode appends each batch's emission; the final k rows are
      // the current sample
      assert(rows.takeRight(k).toSet == expect,
        s"got ${rows.takeRight(k).toSet}\nexp $expect")
    } finally q.stop()
  }

  test("streaming lateness tags match batch q147 across micro-batches") {
    implicit val sql = spark.sqlContext
    val min = 60000L
    val rows = Seq(
      (1L, "a", 0L), (2L, "a", 20L * min), (3L, "a", 5L * min),
      (4L, "b", 9L * min), (5L, "b", 21L * min))
    val expect = graft.queries.EventWindows
      .latenessAuditOf(rows.toDF("event_id", "event_type", "ts_ms"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq

    val in = MemoryStream[(Long, String, Long)]
    val out = StatefulStreams
      .streamingLatenessTags(in.toDF().toDF("event_id", "event_type", "ts_ms"))
      .toDF("event_id", "event_type", "ts_ms", "wm", "late")
    val q = out.writeStream.format("memory").queryName("slate")
      .outputMode("append").start()
    try {
      in.addData(rows.take(2)); q.processAllAvailable()
      in.addData(rows.drop(2)); q.processAllAvailable()
      val tags = spark.table("slate").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getBoolean(4)))
      // aggregate the streamed tags the way batch q147 does
      val agg = tags.groupBy(_._2).map { case (tp, ts) =>
        val late = ts.filter(_._4)
        val wmOf = spark.table("slate").collect()
          .map(r => r.getLong(0) -> r.getLong(3)).toMap
        (tp, ts.size.toLong, late.size.toLong,
          if (late.isEmpty) 0L else late.map(t => wmOf(t._1) - t._3).max)
      }.toSeq.sortBy(_._1)
      assert(agg == expect, s"got $agg\nexp $expect")
    } finally q.stop()
  }

  test("streaming bursts: last emission per hour matches batch q151") {
    implicit val sql = spark.sqlContext
    val hr = 3600000L
    // in-order events: type a gets 2@hr0, 1@hr1, 5@hr25; type b 3@hr1, 1@hr2
    val rows = ((Seq.fill(2)(("a", 0L)) ++ Seq(("a", 1L)) ++ Seq.fill(3)(("b", 1L)) ++
      Seq(("b", 2L)) ++ Seq.fill(5)(("a", 25L)))
      .zipWithIndex.map { case ((tp, h), i) => (i.toLong, tp, h * hr + 7) })
    val expect = graft.queries.EventWindows
      .burstsOf(rows.toDF("event_id", "event_type", "ts_ms"), topN = 100)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet

    val in = MemoryStream[(Long, String, Long)]
    val out = StatefulStreams
      .streamingBursts(in.toDF().toDF("event_id", "event_type", "ts_ms"))
      .toDF("event_type", "hr", "cnt", "trail_sum", "trail_hours", "burst_fp")
    val q = out.writeStream.format("memory").queryName("sburst")
      .outputMode("update").start()
    try {
      in.addData(rows.take(4)); q.processAllAvailable()
      in.addData(rows.drop(4)); q.processAllAvailable()
      // Update mode re-emits as hours fill; keep the LAST row per (type, hr)
      val emitted = spark.table("sburst").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5)))
      val last = emitted.zipWithIndex
        .groupBy { case (t, _) => (t._1, t._2) }
        .map { case (_, vs) => vs.maxBy(_._2)._1 }.toSet
      assert(last == expect, s"got $last\nexp $expect")
    } finally q.stop()
  }

  test("replayed doc_ids do not perturb the sample") {
    implicit val sql = spark.sqlContext
    val docs = Seq(
      (1L, 100L), (2L, 5000L), (3L, 40L), (4L, 900L), (5L, 7L), (6L, 2500L))
    val k = 3
    val expect = graft.queries.Sampling
      .prioritySampleOf(docs.toDF("doc_id", "n_chars"), k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toSet
    val in = MemoryStream[(Long, Long)]
    val out = StatefulStreams
      .streamingPrioritySample(in.toDF().toDF("doc_id", "n_chars"), k)
      .toDF("doc_id", "w", "priority", "est_w")
    val q = out.writeStream.format("memory").queryName("spri2")
      .outputMode("update").start()
    try {
      in.addData(docs)
      q.processAllAvailable()
      in.addData(docs.take(4)) // full replay of earlier rows
      q.processAllAvailable()
      val rows = spark.table("spri2").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      assert(rows.takeRight(k).toSet == expect)
    } finally q.stop()
  }

  test("streaming skyline converges to batch q153 across micro-batches") {
    implicit val sql = spark.sqlContext
    // includes duplicates, a same-x pair, a same-y pair, and points
    // that enter the frontier then get dominated by later arrivals
    val pts = Seq(
      (5.0, 3L), (4.0, 2L), (4.0, 7L), (6.0, 9L), (4.0, 7L),
      (2.0, 1L), (3.0, 7L), (2.0, 6L), (9.0, 9L), (6.0, 9L), (1.0, 1L))
    val expect = graft.queries.Frontier
      .skylineOf(pts.toDF("x", "y").distinct())
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toSet

    val in = MemoryStream[(Double, Long)]
    val out = StatefulStreams.streamingSkyline(in.toDF().toDF("x", "y"))
      .toDF("version", "x", "y")
    val q = out.writeStream.format("memory").queryName("ssky")
      .outputMode("update").start()
    try {
      in.addData(pts.take(4)); q.processAllAvailable()
      in.addData(pts.slice(4, 8)); q.processAllAvailable()
      in.addData(pts.drop(8)); q.processAllAvailable()
      in.addData(pts.take(3)) // full replay: dominated + duplicate arrivals
      q.processAllAvailable()
      val rows = spark.table("ssky").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      val vMax = rows.map(_._1).max
      val last = rows.filter(_._1 == vMax).map(t => (t._2, t._3)).toSet
      assert(last == expect, s"got $last\nexp $expect")
      // the replay batch changed nothing, so it emitted nothing:
      // version count == number of CHANGING batches
      assert(vMax <= 3L, s"replay incremented version to $vMax")
    } finally q.stop()
  }

  test("streaming peak concurrency converges to batch q154 (in-order)") {
    implicit val sql = spark.sqlContext
    val h = graft.queries.Frontier.HoldMs
    val ev = Seq(
      ("a", 0L), ("a", 100L), ("a", 200L),   // overlap of 3
      ("a", h + 300L),                        // all expired: back to 1
      ("b", 0L), ("b", h),                    // touching: never concurrent
      ("c", 42L))
    val expect = graft.queries.Frontier
      .peakConcurrencyOf(ev.toDF("event_type", "ts_ms"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

    val in = MemoryStream[(String, Long)]
    val out = StatefulStreams
      .streamingPeakConcurrency(in.toDF().toDF("event_type", "ts_ms"))
      .toDF("event_type", "peak", "n_events")
    val q = out.writeStream.format("memory").queryName("speak")
      .outputMode("update").start()
    try {
      in.addData(ev.take(2)); q.processAllAvailable()
      in.addData(ev.drop(2)); q.processAllAvailable()
      val rows = spark.table("speak").collect().zipWithIndex
        .map { case (r, i) => (r.getString(0), r.getLong(1), r.getLong(2), i) }
      val last = rows.groupBy(_._1)
        .map { case (_, vs) => val m = vs.maxBy(_._4); (m._1, m._2, m._3) }.toSet
      assert(last == expect, s"got $last\nexp $expect")
    } finally q.stop()
  }

  test("streaming transitions aggregate to the batch q168 matrix") {
    implicit val sql = spark.sqlContext
    val gap = 1800000L
    // user 1: a->b->c in one session, session break, c->a in the next;
    // user 2: single session b->b->a
    val ev = Seq(
      (1L, 1L, "a", 0L), (1L, 2L, "b", 1000L), (1L, 3L, "c", 2000L),
      (1L, 4L, "c", 2000L + gap + 1), (1L, 5L, "a", 2000L + gap + 500),
      (2L, 6L, "b", 0L), (2L, 7L, "b", 10L), (2L, 8L, "a", 20L))
    val expect = graft.queries.EventWindows
      .transitionMatrixOf(ev.toDF("user_id", "event_id", "event_type", "ts_ms"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet

    val in = MemoryStream[(Long, Long, String, Long)]
    val out = StatefulStreams
      .streamingTransitions(in.toDF().toDF("user_id", "event_id", "event_type", "ts_ms"))
      .toDF("from_type", "to_type")
    val q = out.writeStream.format("memory").queryName("strans")
      .outputMode("append").start()
    try {
      in.addData(ev.take(3)); q.processAllAvailable()
      in.addData(ev.drop(3)); q.processAllAvailable()
      val got = spark.table("strans").collect()
        .map(r => (r.getString(0), r.getString(1)))
        .groupBy(identity).map { case (k, vs) => (k._1, k._2, vs.size.toLong) }
        .toSet
      assert(got == expect, s"got $got\nexp $expect")
    } finally q.stop()
  }

  test("streaming LTV attribution aggregates to the batch q177 cells") {
    implicit val sql = spark.sqlContext
    val day = 86400000L
    // u1: cohort day 0, purchases on days 0 and 2, activity day 1;
    // u2: cohort day 2, purchase same day
    val ev = Seq(
      (1L, 0L, "purchase", 150.0), (1L, day + 5, "view", 0.0),
      (1L, 2 * day, "purchase", 50.0),
      (2L, 2 * day, "purchase", 300.0))
    val evDf = ev.toDF("user_id", "ts_ms", "event_type", "value")
    val expect = graft.queries.EventWindows.ltvCohortsOf(evDf)
      .select("cohort_day", "day_offset", "rev_cents")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val in = MemoryStream[(Long, Long, Long)]
    val out = StatefulStreams
      .streamingLtvAttribution(in.toDF().toDF("user_id", "day", "cents"))
      .toDF("cohort_day", "day_offset", "cents")
    val q = out.writeStream.format("memory").queryName("sltv")
      .outputMode("append").start()
    try {
      val rows = ev.map { case (u, ts, tp, v) =>
        (u, ts / day, if (tp == "purchase") math.round(v * 100) else 0L) }
      in.addData(rows.take(2)); q.processAllAvailable()
      in.addData(rows.drop(2)); q.processAllAvailable()
      val got = spark.table("sltv").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .groupBy(t => (t._1, t._2))
        .map { case ((c, o), vs) => (c, o, vs.map(_._3).sum) }.toSet
      assert(got == expect, s"got $got\nexp $expect")
    } finally q.stop()
  }

  test("streaming expectations keep running violation counters") {
    implicit val sql = spark.sqlContext
    // (l_quantity, l_discount): 2 qty violations, 1 discount violation
    val rows = Seq((5.0, 0.05), (0.0, 0.02), (60.0, 0.0), (10.0, 0.5), (49.0, 0.1))
    val in = MemoryStream[(Double, Double)]
    val out = StatefulStreams
      .streamingExpectations(in.toDF().toDF("l_quantity", "l_discount"))
    val q = out.writeStream.format("memory").queryName("sexp")
      .outputMode("update").start()
    try {
      in.addData(rows.take(2)); q.processAllAvailable()
      in.addData(rows.drop(2)); q.processAllAvailable()
      // Update mode re-emits per batch; last row per constraint wins
      val last = spark.table("sexp").collect().zipWithIndex
        .map { case (r, i) => (r.getString(0), r.getLong(1), r.getLong(2), i) }
        .groupBy(_._1).map { case (_, vs) =>
          val m = vs.maxBy(_._4); (m._1, m._2, m._3) }.toSet
      assert(last == Set(("qty_range", 2L, 5L), ("discount_range", 1L, 5L)),
        s"got $last")
    } finally q.stop()
  }
}
