package graft.streaming

import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.SparkSpec
import graft.queries.Privacy

/** Sustained-run STATE BOUNDS for the two newest streaming twins,
  * asserted against the engine's own state-store row counts
  * (`lastProgress.stateOperators.numRowsTotal`) — the README/STATE
  * table's proofs, executed:
  *
  *   - `streamingAttributionEdges`: one state row per ACTIVE user,
  *     evicted by the processing-time flush timer (which also emits
  *     the churned user's pending NULL terminal — the bias the
  *     round-12 ADVICE flagged: without the flush, unconverted final
  *     sessions never produce their NULL edge);
  *   - `streamingDpRelease`: one aggregate state row per (lang,
  *     source) CELL — histogram-sized, never corpus-sized, and flat
  *     across re-publishes of the same cells.
  *
  * Driving style is TtlDedupSpec's: processing-time timers mean the
  * engine ALWAYS has another batch to run, so the specs poll the sink
  * / progress with a deadline instead of processAllAvailable.
  */
class StateBoundSpec extends SparkSpec {
  import spark.implicits._

  private def pollUntil(what: String)(cond: => Boolean): Unit = {
    val deadline = System.nanoTime() + 90L * 1000 * 1000 * 1000
    while (!cond && System.nanoTime() < deadline) Thread.sleep(50)
    assert(cond, s"timed out waiting for: $what")
  }

  private def stateRows(q: StreamingQuery): Long = {
    val p = q.lastProgress
    if (p == null || p.stateOperators.isEmpty) -1L
    else p.stateOperators.map(_.numRowsTotal).sum
  }

  test("attribution edges: one state row per active user, flushed with the NULL terminal") {
    implicit val sql = spark.sqlContext
    val ckpt = Files.createTempDirectory("graft_attr_state").toString
    val h = 1700000000000L
    val in = MemoryStream[(Long, Long, String, Long)]
    val edges = StatefulStreams.streamingAttributionEdges(
      in.toDF().toDF("event_id", "user_id", "event_type", "ts_ms"),
      flushAfterMs = Some(500L))
    val received = new ConcurrentLinkedQueue[(String, String)]()
    val q = edges.writeStream
      .foreachBatch { (batch: Dataset[(String, String)], _: Long) =>
        batch.collect().foreach(received.add)
      }
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.ProcessingTime("100 milliseconds"))
      .start()
    try {
      // user 1: open UNCONVERTED session; user 2: converted session
      in.addData(Seq((1L, 1L, "view", h),
        (2L, 2L, "click", h), (3L, 2L, "purchase", h + 500)))
      pollUntil("the 3 on-arrival edges") { received.size >= 3 }
      assert(received.toArray(Array.empty[(String, String)]).sorted.toSeq ==
        Seq(("START", "click"), ("START", "view"), ("click", "CONV")))
      // state bound: exactly one row per user seen
      pollUntil("2 state rows (one per active user)") { stateRows(q) == 2 }
      // past the flush timer: user 1's pending NULL terminal is emitted
      // (the churned-user edge the NoTimeout version lost forever)...
      pollUntil("the flushed NULL terminal") {
        received.contains(("view", "NULL"))
      }
      // ...user 2's converted session flushes SILENTLY (terminal
      // already emitted as CONV), and the store drains to zero rows
      pollUntil("state drained to 0 rows after the flush") { stateRows(q) == 0 }
      Thread.sleep(300) // settle: no further edges may appear
      assert(received.toArray(Array.empty[(String, String)]).sorted.toSeq ==
        Seq(("START", "click"), ("START", "view"),
          ("click", "CONV"), ("view", "NULL")))
    } finally q.stop()
  }

  test("dp release: state is one aggregate row per cell, flat across re-publishes") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[(String, String)]
    val rel = StatefulStreams.streamingDpRelease(
      in.toDF().toDF("lang", "source"), Privacy.DpTestSeed)
    val w = rel.writeStream.format("memory").queryName("dprel_state")
      .outputMode("complete").trigger(Trigger.AvailableNow())
    // batch 1: 40 rows over 3x2 distinct cells
    in.addData((1 to 40).map(i => (s"l${i % 3}", s"s${i % 2}")))
    val q1 = w.start(); q1.awaitTermination()
    assert(stateRows(q1) == 6, s"want 6 cell rows, got ${stateRows(q1)}")
    // batch 2: 60 more rows, SAME cells — re-publish must not grow state
    in.addData((1 to 60).map(i => (s"l${i % 3}", s"s${i % 2}")))
    val q2 = w.start(); q2.awaitTermination()
    assert(stateRows(q2) == 6, s"re-publish grew state: ${stateRows(q2)}")
    // batch 3: 2 genuinely new cells -> exactly 2 more state rows
    in.addData(Seq(("xx", "s0"), ("yy", "s1")))
    val q3 = w.start(); q3.awaitTermination()
    assert(stateRows(q3) == 8, s"want 8 cell rows, got ${stateRows(q3)}")
  }
}
