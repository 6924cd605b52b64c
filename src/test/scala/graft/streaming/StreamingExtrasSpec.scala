package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, struct}
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

  test("streaming token-budget gate admits per-source until the budget binds, across batches") {
    implicit val sql = spark.sqlContext
    // 4 tokens per doc, budget 10: docs 1,2 fit (used 4, 8); doc 3
    // starts at 8 < 10 and crosses the line (admitted, used 12); doc 4
    // starts past budget (rejected). Source b is an independent quota.
    def doc(words: Int) = Seq.fill(words)("w").mkString(" ")
    val in = MemoryStream[(Long, String, String)]
    val out = StatefulStreams.streamingTokenBudget(
      in.toDF().toDF("doc_id", "source", "text"), budget = 10L)
      .toDF("doc_id", "source", "n_toks", "cum_toks")
    val q = out.writeStream.format("memory").queryName("sbudget")
      .outputMode("append").start()
    try {
      in.addData(Seq((1L, "a", doc(4)), (2L, "a", doc(4)), (10L, "b", doc(9))))
      q.processAllAvailable()
      // boundary docs admitted in a LATER batch off persisted state
      // (3 crosses a's line, 11 crosses b's); doc 4 starts past
      // budget and is rejected
      in.addData(Seq((3L, "a", doc(4)), (4L, "a", doc(4)), (11L, "b", doc(5))))
      q.processAllAvailable()
      val got = spark.table("sbudget").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
      assert(got == Set(
        (1L, "a", 4L, 4L), (2L, "a", 4L, 8L), (3L, "a", 4L, 12L),
        (10L, "b", 9L, 9L), (11L, "b", 5L, 14L)))
    } finally q.stop()
  }

  test("streaming IVF assignment: static codebook, argmax parity, update-mode revision") {
    implicit val sql = spark.sqlContext
    val centroids = Seq((0, Seq(1f, 0f)), (1, Seq(0f, 1f))).toDF("cell", "cvec")
    val in = MemoryStream[(Long, Seq[Float])]
    val out = StatefulStreams.streamingIvfAssign(
      in.toDF().toDF("vec_id", "embedding"), centroids)
    val q = out.writeStream.format("memory").queryName("sivf")
      .outputMode("update").start()
    try {
      in.addData(Seq((1L, Seq(0.9f, 0.1f)), (2L, Seq(0.1f, 0.9f)),
        (3L, Seq(0.7f, 0.7f)))) // exact tie -> smaller cell (the q41 contract)
      q.processAllAvailable()
      val got = spark.table("sivf").collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSet
      assert(got == Set((1L, 0), (2L, 1), (3L, 0)), s"got $got")
      // a vector re-arriving with new content revises its assignment
      in.addData(Seq((1L, Seq(0.0f, 1.0f))))
      q.processAllAvailable()
      val revised = spark.table("sivf").collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSet
      assert(revised.contains((1L, 1)), s"revision missing: $revised")
    } finally q.stop()
    // batch mode: same operator body equals a direct batch argmax
    val vecs = Seq((10L, Seq(0.3f, 0.8f)), (11L, Seq(0.8f, 0.3f))).toDF("vec_id", "embedding")
    val batch = StatefulStreams.streamingIvfAssign(vecs, centroids)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(batch == Set((10L, 1), (11L, 0)))
  }

  test("streaming changelog apply: update-mode latest-wins, tombstone flagged, late arrival keeps payload") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[(Long, Long, Long, String, Double)]
    val out = StatefulStreams.streamingChangelogApply(
      in.toDF().toDF("user_id", "ts_ms", "event_id", "event_type", "value"))
    val q = out.writeStream.format("memory").queryName("schangelog")
      .outputMode("update").start()
    def state() = spark.table("schangelog").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getBoolean(4), r.getLong(5)))
      .groupBy(_._1).map { case (_, vs) => vs.maxBy(_._5) }.toSet
    try {
      in.addData(Seq((1L, 100L, 1L, "view", 1.0), (1L, 200L, 2L, "click", 2.0),
        (2L, 150L, 3L, "view", 5.0)))
      q.processAllAvailable()
      assert(state() == Set((1L, "click", 2.0, false, 2L), (2L, "view", 5.0, false, 1L)))
      // u1 tombstoned across batches off persisted state; u2 gets a
      // LATE arrival (older ts) — payload must not regress
      in.addData(Seq((1L, 300L, 4L, "error", 0.0), (2L, 120L, 5L, "click", 9.0)))
      q.processAllAvailable()
      assert(state() == Set((1L, "error", 0.0, true, 3L), (2L, "view", 5.0, false, 2L)))
    } finally q.stop()
    // batch mode: same operator body agrees with ops.Changelog on the
    // kept (non-tombstoned) rows
    val log = Seq((1L, 100L, 1L, "view", 1.0), (1L, 200L, 2L, "error", 0.0),
      (2L, 150L, 3L, "click", 7.0))
      .toDF("user_id", "ts_ms", "event_id", "event_type", "value")
    val viaStream = StatefulStreams.streamingChangelogApply(log)
      .filter(!col("is_tombstone"))
      .select("user_id", "last_type", "last_value", "last_ts_ms", "n_changes")
      .collect().map(_.toSeq).toSet
    val viaBatch = graft.ops.Changelog(log, Seq("user_id"),
        struct(col("ts_ms"), col("event_id")),
        Seq("last_type" -> col("event_type"), "last_value" -> col("value"),
          "last_ts_ms" -> col("ts_ms")),
        last => last.getField("last_type") === "error")
      .select("user_id", "last_type", "last_value", "last_ts_ms", "n_changes")
      .collect().map(_.toSeq).toSet
    assert(viaStream == viaBatch && viaBatch == Set(Seq(2L, "click", 7.0, 150L, 1L)))
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
