package graft.streaming

import java.nio.file.Files
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec
import graft.queries.Sequential._

/** Pins the live SPRT monitor: the verdict freezes at the first
  * boundary crossing (a later plunge through the OPPOSITE boundary —
  * planted here — must not reverse it, because a sequential test that
  * has stopped has stopped), counters keep counting for observability,
  * the frozen crossing trial matches the batch q272 constants, and the
  * state store holds exactly one row per arm. Driving style is
  * TtlDedupSpec's: one continuous query, poll the captured snapshots.
  */
class SprtStreamSpec extends SparkSpec {
  import spark.implicits._

  private def pollUntil(what: String)(cond: => Boolean): Unit = {
    val deadline = System.nanoTime() + 90L * 1000 * 1000 * 1000
    while (!cond && System.nanoTime() < deadline) Thread.sleep(50)
    assert(cond, s"timed out waiting for: $what")
  }

  test("decision freezes at first crossing; one state row per arm") {
    implicit val sql = spark.sqlContext
    val ckpt = Files.createTempDirectory("graft_sprt").toString
    val in = MemoryStream[(Long, Long, Long, Long)]
    val mon = StatefulStreams.streamingSprtMonitor(
      in.toDF().toDF("arm", "enroll_ms", "user_id", "conv"))
    val latest = new ConcurrentHashMap[Long, (Long, Long, String, Long)]()
    val q = mon.writeStream
      .foreachBatch { (batch: Dataset[(Long, Long, Long, Long, String, Long)], _: Long) =>
        batch.collect().foreach { case (arm, n, c, _, dec, nd) =>
          latest.put(arm, (n, c, dec, nd))
        }
      }
      .option("checkpointLocation", ckpt)
      .outputMode("update")
      .trigger(Trigger.ProcessingTime("100 milliseconds"))
      .start()
    try {
      // batch 1: arm 0 converts 60/60 -> crosses A at trial 52 (the
      // batch q272 fixture's folded value); arm 1 stays undecided
      in.addData((0 until 60).map(i => (0L, 1000L + i, i.toLong, 1L)) ++
        Seq((1L, 1000L, 900L, 1L)))
      pollUntil("batch-1 verdicts")(
        latest.get(0L) == ((60L, 60L, "accept_h1", 52L)) &&
          Option(latest.get(1L)).exists(s => s._3 == "continue" && s._4 == -1L))

      // batch 2: 40 straight misses would cross B on their own — the
      // frozen verdict and crossing trial must not move; n/c keep counting
      in.addData((0 until 40).map(i => (0L, 2000L + i, 100L + i, 0L)))
      pollUntil("frozen verdict after the plunge")(
        latest.get(0L) == ((100L, 60L, "accept_h1", 52L)))
      // the plunge really happened: the live LLR is now under B
      assert(60L * (SprtC1 - SprtC0) + 100L * SprtC0 <= SprtB)
      // state is arm-sized: exactly 2 rows
      pollUntil("arm-sized state") {
        val p = q.lastProgress
        p != null && p.stateOperators.nonEmpty &&
          p.stateOperators.map(_.numRowsTotal).sum == 2L
      }
    } finally q.stop()
  }
}
