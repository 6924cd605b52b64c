package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec

class StreamingExtrasSpec extends SparkSpec {
  import spark.implicits._

  test("native session windows split on gap") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, String)]
    in.addData(Seq(
      (java.sql.Timestamp.valueOf("2024-01-01 00:00:01"), "u1"),
      (java.sql.Timestamp.valueOf("2024-01-01 00:00:30"), "u1"),
      (java.sql.Timestamp.valueOf("2024-01-01 01:00:00"), "u1"), // new session
      (java.sql.Timestamp.valueOf("2024-01-01 02:00:00"), "u1"))) // watermark driver
    val out = StatefulStreams.sessionCounts(
      in.toDF().toDF("ts", "user"), "ts", "user", "5 minutes", "1 second")
    val q = out.writeStream.format("memory").queryName("sessions")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val rows = spark.table("sessions")
      .select("session_start", "n").collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(1))).toSeq.sorted
    // first session has 2 events, second 1 (third still open -> not emitted)
    assert(rows == Seq(("2024-01-01 00:00:01.0", 2L), ("2024-01-01 01:00:00.0", 1L)))
  }

  test("update-mode streaming aggregation revises counts per micro-batch") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[String]
    in.addData(Seq("a", "b", "a"))
    in.addData(Seq("a", "c"))
    val counts = in.toDF().toDF("w").groupBy("w").count()
    val q = counts.writeStream.format("memory").queryName("upd")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // update mode emits one revision row per changed key per batch;
    // the LAST revision per key must equal the true totals
    val last = spark.table("upd").collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
    assert(last == Map("a" -> 3L, "b" -> 1L, "c" -> 1L))
  }

  test("rate-micro-batch source: the unbounded generator analog") {
    // the reference's only unbounded source is its infinite generator
    // stream (datastream.go:15-27); Spark's built-in equivalent is the
    // rate family — rate-micro-batch produces a DETERMINISTIC number of
    // rows per batch, so the test is timing-independent
    val df = spark.readStream.format("rate-micro-batch")
      .option("rowsPerBatch", "25").option("numPartitions", "2").load()
    val q = df.writeStream.format("memory").queryName("ratesrc")
      .outputMode("append").start()
    try {
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (spark.table("ratesrc").count() < 50 && System.nanoTime() < deadline) {
        Thread.sleep(200)
      }
      val vals = spark.table("ratesrc").select("value")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(vals.length >= 50, s"rate source produced only ${vals.length} rows")
      assert(vals.take(50) == (0L until 50L), "values must be the deterministic 0..n sequence")
    } finally q.stop()
  }

  test("foreachBatch fan-out delivers each micro-batch to every sink") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[Int]
    in.addData(1 to 10)
    val got1 = scala.collection.mutable.ArrayBuffer.empty[Long]
    val got2 = scala.collection.mutable.ArrayBuffer.empty[Long]
    val sinks: Seq[DataFrame => Unit] = Seq(
      df => got1.synchronized { got1 += df.count() },
      df => got2.synchronized { got2 += df.count() })
    val q = StatefulStreams.fanOutSinks(in.toDF(), sinks)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(got1.sum == 10 && got2.sum == 10)
  }
}
