package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

/** Update-mode parity pins for the round-9 batch additions that are
  * running-aggregate shaped: q179 seasonality cells and q176 drift
  * cells, each converging across arbitrary micro-batch splits to the
  * batch arithmetic over the same rows.
  */
class StreamingSeasonalitySpec extends SparkSpec {
  import spark.implicits._

  private val hr = 3600000L
  private val day = 86400000L

  test("streaming seasonality cells + derived shares match batch q179 across micro-batches") {
    implicit val sql = spark.sqlContext
    // events across 3 days-of-week and 4 hours, with a clear per-day peak
    val rows: Seq[Long] = Seq(
      0L * day + 1 * hr, 0L * day + 1 * hr + 5, 0L * day + 2 * hr, // Thu h1 x2, h2
      1L * day + 0 * hr, 1L * day + 0 * hr + 9, 1L * day + 0 * hr + 11, // Fri h0 x3
      1L * day + 23 * hr, // Fri h23
      5L * day + 12 * hr, 5L * day + 12 * hr + 1, // Tue h12 x2
      12L * day + 0 * hr) // Tue(+1wk) h0 — same dow accumulates
    val batch = graft.queries.Signals
      .seasonalityOf(rows.toDF("ts_ms"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSet

    val in = MemoryStream[Long]
    val out = StatefulStreams.streamingSeasonality(in.toDF().toDF("ts_ms"))
    val q = out.writeStream.format("memory").queryName("sseason")
      .outputMode("update").start()
    try {
      in.addData(rows.take(3)); q.processAllAvailable()
      in.addData(rows.slice(3, 8)); q.processAllAvailable()
      in.addData(rows.drop(8)); q.processAllAvailable()
      // Update mode re-emits a cell whenever it changes: the LAST
      // emission per (dow, hod) is the converged count
      val emitted = spark.table("sseason").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).zipWithIndex
      val cells = emitted.groupBy { case ((dw, hd, _), _) => (dw, hd) }
        .map { case (_, vs) => vs.maxBy(_._2)._1 }.toSeq
      // derive shares + day peak over the final snapshot, the same
      // 7-row arithmetic the batch query runs
      val dayTotals = cells.groupBy(_._1)
        .map { case (dw, cs) => dw -> (cs.map(_._3).sum, cs.map(_._3).max) }
      val derived = cells.map { case (dw, hd, n) =>
        val (dn, dmax) = dayTotals(dw)
        (dw, hd, n, n * 1048576L / dn, n == dmax)
      }.toSet
      assert(derived == batch, s"got $derived\nexp $batch")
    } finally q.stop()
  }

  test("streaming drift cells converge to the fixed-ruler batch cells and TVD") {
    implicit val sql = spark.sqlContext
    // doc texts engineered to spread quality: repetitive (low distinct
    // ratio), out-of-range length (quality 0), and clean mid-range docs
    def words(n: Int, distinct: Int): String =
      (0 until n).map(i => s"w${i % distinct}").mkString(" ")
    val docs = Seq(
      1L -> words(30, 30), 2L -> words(30, 15), 3L -> words(40, 10),
      4L -> words(10, 10) /* too short -> q=0 */, 5L -> words(50, 45),
      6L -> words(25, 5), 7L -> words(1200, 600) /* too long -> q=0 */,
      8L -> words(60, 55))
    val scoredBatch = graft.queries.Filtering
      .qualityScored(docs.toDF("doc_id", "text"))
    val expect = StatefulStreams.streamingDriftCells(scoredBatch)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val in = MemoryStream[(Long, String)]
    val scored = graft.queries.Filtering
      .qualityScored(in.toDF().toDF("doc_id", "text"))
    val q = StatefulStreams.streamingDriftCells(scored)
      .writeStream.format("memory").queryName("sdrift")
      .outputMode("update").start()
    try {
      in.addData(docs.take(3)); q.processAllAvailable()
      in.addData(docs.slice(3, 6)); q.processAllAvailable()
      in.addData(docs.drop(6)); q.processAllAvailable()
      val emitted = spark.table("sdrift").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).zipWithIndex
      val cells = emitted.groupBy { case ((b, _, _), _) => b }
        .map { case (_, vs) => vs.maxBy(_._2)._1 }.toSet
      assert(cells == expect, s"got $cells\nexp $expect")
      // same 10-row TVD arithmetic both ways, exercising a non-zero
      // half-vs-half deviation
      def tvd(cs: Set[(Long, Long, Long)]): Long = {
        val ta = cs.toSeq.map(_._2).sum; val tb = cs.toSeq.map(_._3).sum
        cs.toSeq.map { case (_, a, b) =>
          math.abs(a * 1048576L / ta - b * 1048576L / tb)
        }.sum / 2
      }
      assert(tvd(cells) == tvd(expect))
      assert(tvd(cells) > 0L, "degenerate fixture: halves identical")
    } finally q.stop()
  }

  test("streaming inter-arrival deltas reproduce batch q185's spectrum") {
    implicit val sql = spark.sqlContext
    // two users, interleaved, with sub-second / minute / hour gaps and
    // a same-ts tie broken by event_id
    val rows = Seq( // (event_id, user_id, ts_ms)
      (1L, 7L, 1000L), (2L, 7L, 1200L), (3L, 9L, 500L),
      (4L, 7L, 61200L), (5L, 9L, 500L), (6L, 9L, 3600500L),
      (7L, 7L, 61200L + hr))
    def spectrum(deltas: Seq[Long]): Map[Long, Long] =
      deltas.groupBy(d => 63 - java.lang.Long.numberOfLeadingZeros(d + 1))
        .map { case (b, ds) => b.toLong -> ds.size.toLong }
    // batch deltas per user over the (ts, event_id) order
    val batchDeltas = rows.groupBy(_._2).values.flatMap { evs =>
      val ts = evs.sortBy(e => (e._3, e._1)).map(_._3)
      ts.zip(ts.drop(1)).map { case (a, b) => b - a }
    }.toSeq

    val in = MemoryStream[(Long, Long, Long)]
    val out = StatefulStreams
      .streamingInterarrival(in.toDF().toDF("event_id", "user_id", "ts_ms"))
      .toDF("user_id", "delta")
    val q = out.writeStream.format("memory").queryName("sgap")
      .outputMode("append").start()
    try {
      in.addData(rows.take(3)); q.processAllAvailable()
      in.addData(rows.slice(3, 5)); q.processAllAvailable()
      in.addData(rows.drop(5)); q.processAllAvailable()
      val streamed = spark.table("sgap").collect().map(_.getLong(1)).toSeq
      assert(spectrum(streamed) == spectrum(batchDeltas),
        s"got ${spectrum(streamed)}\nexp ${spectrum(batchDeltas)}")
      assert(streamed.size == rows.size - 2, "one delta per non-first event")
    } finally q.stop()
  }

  test("streaming intervals reproduce batch q191's closed-interval occupancy") {
    implicit val sql = spark.sqlContext
    // (event_id, user_id, event_type, ts_ms): two users switching states
    val rows = Seq(
      (1L, 7L, "click", 0L), (2L, 7L, "view", 1000L), (3L, 9L, "click", 500L),
      (4L, 7L, "click", 5000L), (5L, 9L, "purchase", 2500L),
      (6L, 9L, "click", 9000L), (7L, 7L, "view", 6000L))
    // batch closed intervals: per user in (ts, event_id) order, every
    // event except the user's last contributes (its_type, next_ts - ts)
    val expect = rows.groupBy(_._2).values.flatMap { evs =>
      val o = evs.sortBy(e => (e._4, e._1))
      o.zip(o.drop(1)).map { case (a, b) => (a._3, b._4 - a._4) }
    }.groupBy(_._1).map { case (tp, ds) =>
      (tp, ds.size.toLong, ds.map(_._2).sum) }.toSet

    val in = MemoryStream[(Long, Long, String, Long)]
    val out = StatefulStreams
      .streamingIntervals(in.toDF().toDF("event_id", "user_id", "event_type", "ts_ms"))
      .toDF("event_type", "dur")
    val q = out.writeStream.format("memory").queryName("sints")
      .outputMode("append").start()
    try {
      in.addData(rows.take(3)); q.processAllAvailable()
      in.addData(rows.slice(3, 5)); q.processAllAvailable()
      in.addData(rows.drop(5)); q.processAllAvailable()
      val got = spark.table("sints").collect()
        .map(r => (r.getString(0), r.getLong(1)))
        .groupBy(_._1).map { case (tp, ds) =>
          (tp, ds.size.toLong, ds.map(_._2).sum) }.toSet
      assert(got == expect, s"got $got\nexp $expect")
    } finally q.stop()
  }
}
