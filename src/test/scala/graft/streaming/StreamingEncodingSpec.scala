package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Parity pin for streamingEncodingRuns (the live twin of batch
  * q253's run accounting): per-column run-start counts over arbitrary
  * micro-batch splits must equal the batch window arithmetic with the
  * chain broken at id gaps AND 1024-row block boundaries.
  */
class StreamingEncodingSpec extends SparkSpec {
  import spark.implicits._

  test("streaming run starts match batch per-block window counts across micro-batches") {
    implicit val sql = spark.sqlContext
    // ids with a gap (7 missing) and values engineered to form runs;
    // id 1024 crosses the block boundary with identical values to id
    // 1023 — the stream must still start new runs there
    val rows: Seq[(Long, String, Long, Long, Long)] = Seq(
      (1L, "a", 10L, 100L, 5L), (2L, "a", 10L, 100L, 5L),
      (3L, "a", 11L, 100L, 5L), (4L, "b", 11L, 200L, 5L),
      (5L, "b", 11L, 200L, 7L), (6L, "b", 11L, 200L, 7L),
      (8L, "b", 11L, 200L, 7L), // id gap: all four columns restart
      (1023L, "c", 42L, 300L, 9L),
      (1024L, "c", 42L, 300L, 9L)) // block boundary: all restart
    val df = rows.toDF("event_id", "event_type", "user_id", "ts_ms", "vc")

    // batch expectation: run starts per column with the stream's
    // block-broken chain rule
    val w = Window.partitionBy(expr("event_id DIV 1024")).orderBy(col("event_id"))
    def runs(c: String): Long = df
      .withColumn("p_id", lag(col("event_id"), 1).over(w))
      .withColumn("p_v", lag(col(c), 1).over(w))
      .filter(col("p_id").isNull || col("p_id") =!= col("event_id") - 1 ||
        col("p_v") =!= col(c))
      .count()
    val expect = Map("event_type" -> runs("event_type"),
      "user_id" -> runs("user_id"), "ts_ms" -> runs("ts_ms"),
      "value_cents" -> runs("vc"))

    val in = MemoryStream[(Long, String, Long, Long, Long)]
    val out = StatefulStreams.streamingEncodingRuns(
      in.toDF().toDF("event_id", "event_type", "user_id", "ts_ms", "vc"))
    val q = out.writeStream.format("memory").queryName("sruns")
      .outputMode("append").start()
    try {
      in.addData(rows.take(4)); q.processAllAvailable()
      in.addData(rows.slice(4, 7)); q.processAllAvailable()
      in.addData(rows.drop(7)); q.processAllAvailable()
      val got = spark.table("sruns").collect()
        .map(r => r.getString(0)).groupBy(identity)
        .map { case (k, v) => k -> v.length.toLong }
      assert(got == expect, s"got $got\nexp $expect")
    } finally q.stop()
  }

  test("late-arriving rows within a block still chain to stored state") {
    implicit val sql = spark.sqlContext
    // second micro-batch continues the run started in the first: the
    // chained value must NOT re-emit a run start
    val in = MemoryStream[(Long, String, Long, Long, Long)]
    val out = StatefulStreams.streamingEncodingRuns(
      in.toDF().toDF("event_id", "event_type", "user_id", "ts_ms", "vc"))
    val q = out.writeStream.format("memory").queryName("sruns2")
      .outputMode("append").start()
    try {
      in.addData(Seq((1L, "x", 1L, 1L, 1L))); q.processAllAvailable()
      in.addData(Seq((2L, "x", 1L, 1L, 1L))); q.processAllAvailable()
      in.addData(Seq((3L, "x", 1L, 1L, 2L))); q.processAllAvailable()
      val got = spark.table("sruns2").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      val expect: Set[(String, Long)] = Set(
        ("event_type", 1L), ("user_id", 1L), ("ts_ms", 1L), ("value_cents", 1L),
        ("value_cents", 3L)) // only vc changes at id 3
      assert(got == expect, s"got $got\nexp $expect")
    } finally q.stop()
  }
}
