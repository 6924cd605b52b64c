package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec

/** Streaming-native dedup and enrichment — the incremental forms of the
  * batch dedup pillar (graft.queries.Dedup):
  *  - exact streaming dedup via dropDuplicates within a watermark
  *    (state bounded by event time — the 100 TB-safe configuration);
  *  - stream-static join: each micro-batch enriched against a static
  *    dimension table without any streaming state.
  */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("watermarked streaming dedup drops repeats across micro-batches") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, Long)]
    in.addData(Seq((ts("2024-01-01 00:00:01"), 1L), (ts("2024-01-01 00:00:02"), 2L)))
    in.addData(Seq((ts("2024-01-01 00:00:03"), 1L), (ts("2024-01-01 00:00:04"), 3L))) // 1 is a dup
    val out = in.toDF().toDF("ts", "doc_id")
      .withWatermark("ts", "10 minutes")
      .dropDuplicates("doc_id")
    val q = out.writeStream.format("memory").queryName("sdedup")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("sdedup").select("doc_id").as[Long].collect().toSeq.sorted
    assert(got == Seq(1L, 2L, 3L))
  }

  test("stream-static join enriches micro-batches against a dimension table") {
    implicit val sql = spark.sqlContext
    val dim = Seq((1L, "en"), (2L, "de"), (3L, "fr")).toDF("doc_id", "lang")
    val in = MemoryStream[Long]
    in.addData(Seq(1L, 3L, 9L))
    val out = in.toDF().toDF("doc_id").join(broadcast(dim), Seq("doc_id"), "left_outer")
    val q = out.writeStream.format("memory").queryName("senrich")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("senrich").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toSeq.sortBy(_._1)
    assert(got == Seq((1L, Some("en")), (3L, Some("fr")), (9L, None)))
  }
}
