package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec

/** Stream-stream interval join with watermarks — the join capability
  * the reference entirely lacks (SURVEY.md §2.2 Joins), native in
  * Structured Streaming: both sides buffered in state, bounded by
  * watermark + time-range condition.
  */
class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  test("watermarked stream-stream join matches clicks to impressions in range") {
    implicit val sql = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val impressions = MemoryStream[(java.sql.Timestamp, String)]
    val clicks = MemoryStream[(java.sql.Timestamp, String)]
    impressions.addData(Seq(
      (ts("2024-01-01 00:00:00"), "ad1"),
      (ts("2024-01-01 00:01:00"), "ad2"),
      (ts("2024-01-01 01:00:00"), "ad3"))) // also advances the watermark
    clicks.addData(Seq(
      (ts("2024-01-01 00:00:30"), "ad1"), // within 2 min of ad1 imp
      (ts("2024-01-01 00:10:00"), "ad2"), // too late after ad2 imp
      (ts("2024-01-01 01:00:30"), "ad3")))

    val imp = impressions.toDF().toDF("imp_ts", "ad")
      .withWatermark("imp_ts", "10 seconds")
    val clk = clicks.toDF().toDF("clk_ts", "clk_ad")
      .withWatermark("clk_ts", "10 seconds")
    val joined = imp.join(clk,
      col("ad") === col("clk_ad") &&
        col("clk_ts") >= col("imp_ts") &&
        col("clk_ts") <= col("imp_ts") + expr("INTERVAL 2 MINUTES"))

    val q = joined.writeStream.format("memory").queryName("ssj")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("ssj").select("ad").as[String].collect().toSeq.sorted
    assert(got == Seq("ad1", "ad3"))
  }

  test("stream-stream LEFT OUTER join emits unmatched rows after watermark expiry") {
    implicit val sql = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val impressions = MemoryStream[(java.sql.Timestamp, String)]
    val clicks = MemoryStream[(java.sql.Timestamp, String)]
    val imp = impressions.toDF().toDF("imp_ts", "ad")
      .withWatermark("imp_ts", "10 seconds")
    val clk = clicks.toDF().toDF("clk_ts", "clk_ad")
      .withWatermark("clk_ts", "10 seconds")
    val joined = imp.join(clk,
      col("ad") === col("clk_ad") &&
        col("clk_ts") >= col("imp_ts") &&
        col("clk_ts") <= col("imp_ts") + expr("INTERVAL 2 MINUTES"),
      "leftOuter")
    val q = joined.writeStream.format("memory").queryName("ssloj")
      .outputMode("append").start()
    try {
      // batch 1: ad1 matches, ad2 has no click
      impressions.addData(Seq(
        (ts("2024-01-01 00:00:00"), "ad1"), (ts("2024-01-01 00:01:00"), "ad2")))
      clicks.addData(Seq((ts("2024-01-01 00:00:30"), "ad1")))
      q.processAllAvailable()
      // batches 2-3: advance BOTH watermarks (joint watermark = min)
      // far past ad2's join window end 00:03:00, then trigger again so
      // the expired left-side state flushes as a null-padded result
      for (t <- Seq("2024-01-01 01:00:00", "2024-01-01 01:00:01")) {
        impressions.addData(Seq((ts(t), "adX")))
        clicks.addData(Seq((ts(t), "adXc")))
        q.processAllAvailable()
      }
      val rows = spark.table("ssloj").select("ad", "clk_ad").collect()
        .map(r => (r.getString(0), Option(r.getString(1)))).toSet
      assert(rows.contains(("ad1", Some("ad1"))), s"match lost: $rows")
      assert(rows.contains(("ad2", None)), s"unmatched left row not emitted: $rows")
    } finally q.stop()
  }
}
