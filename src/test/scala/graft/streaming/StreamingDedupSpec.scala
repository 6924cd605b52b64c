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

  test("dropDuplicatesWithinWatermark evicts dedup state by event time") {
    // the Spark 3.5+ native form of the TTL-dedup contract: a key's
    // state lives only while inside the watermark, so a re-arrival
    // BEYOND the horizon is re-emitted (unlike plain dropDuplicates,
    // whose keyed state never expires) — the bounded-state default a
    // year-long stream needs
    implicit val sql = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, Long)]
    val out = in.toDF().toDF("ts", "doc_id")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("doc_id")
    val q = out.writeStream.format("memory").queryName("sdedupwm")
      .outputMode("append").start()
    try {
      in.addData(Seq((ts("2024-01-01 00:00:01"), 1L)))
      q.processAllAvailable()
      // same key within the watermark: dropped
      in.addData(Seq((ts("2024-01-01 00:05:00"), 1L)))
      q.processAllAvailable()
      // advance the watermark far past the key's horizon, then replay it
      in.addData(Seq((ts("2024-01-01 02:00:00"), 99L)))
      q.processAllAvailable()
      in.addData(Seq((ts("2024-01-01 02:00:01"), 1L))) // state expired: re-emitted
      q.processAllAvailable()
      val got = spark.table("sdedupwm").select("doc_id").as[Long]
        .collect().toSeq
      assert(got == Seq(1L, 99L, 1L), s"got $got")
    } finally q.stop()
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

  test("streaming LSH near-dup finds pairs across micro-batches") {
    implicit val sql = spark.sqlContext
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val in = MemoryStream[(Long, String)]
    val pairs = StatefulStreams.streamingNearDupPairs(in.toDF().toDF("doc_id", "text"))
      .toDF("doc_a", "doc_b", "est_jaccard")
    val q = pairs.writeStream.format("memory").queryName("snear")
      .outputMode("append").start()
    try {
      in.addData(Seq((1L, text), (2L, text), (10L, "a totally different unique sentence content")))
      q.processAllAvailable()
      val afterB1 = spark.table("snear").select("doc_a", "doc_b").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(afterB1 == Set((1L, 2L)), s"batch1: $afterB1")
      // a near-dup arriving LATER must pair against state from batch 1
      in.addData(Seq((3L, text)))
      q.processAllAvailable()
      val afterB2 = spark.table("snear").distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(afterB2 == Set((1L, 2L, 1.0), (1L, 3L, 1.0), (2L, 3L, 1.0)), s"batch2: $afterB2")
    } finally q.stop()
  }

  test("near-dup bucket cap: over-cap arrivals still probe stored members") {
    // maxPerBucket=2 on 4 identical docs: docs 1,2 get stored; docs 3,4
    // are not stored but still pair against the stored cap-set — only
    // pairs AMONG over-cap arrivals (3,4) are lost, the documented
    // bound on what capping can drop
    val docs = (1L to 4L)
      .map(i => (i, "same words repeated enough times to form shingles here"))
      .toDF("doc_id", "text")
    val pairs = StatefulStreams.streamingNearDupPairs(docs, maxPerBucket = 2)
      .toDF("a", "b", "est").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L)), s"got $pairs")
  }

  test("streaming winnowing substring pairs find copied passages across micro-batches") {
    implicit val sql = spark.sqlContext
    val passage = ("the quick brown fox jumps over the lazy dog and then " +
      "runs far away into the deep dark forest tonight") * 3
    val in = MemoryStream[(Long, String)]
    val pairs = StatefulStreams.streamingSubstringPairs(in.toDF().toDF("doc_id", "text"))
      .toDF("doc_a", "doc_b")
    val q = pairs.writeStream.format("memory").queryName("swinnow")
      .outputMode("append").start()
    try {
      in.addData(Seq((1L, s"unrelated prefix words here $passage"),
        (5L, "completely different content with no shared passage at all")))
      q.processAllAvailable()
      assert(spark.table("swinnow").count() == 0)
      // the copy arrives a batch later and must pair against stored state
      in.addData(Seq((2L, s"$passage and a different suffix entirely")))
      q.processAllAvailable()
      val got = spark.table("swinnow").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((1L, 2L)), s"got $got")
    } finally q.stop()
  }

  test("winnow bucket cap: over-cap arrivals still probe stored members") {
    // maxPerBucket=2 on 4 docs sharing one passage: docs 1,2 stored per
    // fingerprint bucket; 3,4 probe the cap-set but are not stored —
    // only pairs among over-cap arrivals (3,4) are lost, the documented
    // bound on what capping can drop
    val passage = ("the quick brown fox jumps over the lazy dog and then " +
      "runs far away into the deep dark forest tonight") * 3
    val docs = (1L to 4L).map(i => (i, s"$passage tail$i"))
      .toDF("doc_id", "text")
    val pairs = StatefulStreams.streamingSubstringPairs(docs, maxPerBucket = 2)
      .toDF("a", "b").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L)), s"got $pairs")
  }

  test("replayed arrivals emit nothing: pair counts stable under re-delivery") {
    implicit val sql = spark.sqlContext
    val passage = ("the quick brown fox jumps over the lazy dog and then " +
      "runs far away into the deep dark forest tonight") * 3
    // winnowing form
    val in = MemoryStream[(Long, String)]
    val pairs = StatefulStreams.streamingSubstringPairs(in.toDF().toDF("doc_id", "text"))
      .toDF("doc_a", "doc_b")
    val q = pairs.writeStream.format("memory").queryName("sreplay")
      .outputMode("append").start()
    try {
      in.addData(Seq((1L, s"$passage one"), (2L, s"$passage two")))
      q.processAllAvailable()
      val n1 = spark.table("sreplay").count()
      assert(n1 > 0)
      // doc 1 re-delivered verbatim: already stored, so no re-emission —
      // downstream n_shared counts must not inflate vs batch q86
      in.addData(Seq((1L, s"$passage one")))
      q.processAllAvailable()
      assert(spark.table("sreplay").count() == n1)
    } finally q.stop()
    // LSH form
    val in2 = MemoryStream[(Long, String)]
    val pairs2 = StatefulStreams.streamingNearDupPairs(in2.toDF().toDF("doc_id", "text"))
      .toDF("doc_a", "doc_b", "est")
    val q2 = pairs2.writeStream.format("memory").queryName("sreplay2")
      .outputMode("append").start()
    try {
      val text = "the quick brown fox jumps over the lazy dog again and again"
      in2.addData(Seq((1L, text), (2L, text)))
      q2.processAllAvailable()
      val n1 = spark.table("sreplay2").count()
      assert(n1 > 0)
      in2.addData(Seq((2L, text)))
      q2.processAllAvailable()
      assert(spark.table("sreplay2").count() == n1)
    } finally q2.stop()
  }

  test("streaming winnowing in batch mode matches q86's thresholded pairs") {
    val sf = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, sf)
    val streamed = StatefulStreams.streamingSubstringPairs(docs)
      .toDF("doc_a", "doc_b")
      .groupBy("doc_a", "doc_b").count()
      .filter(col("count") >= graft.queries.Dedup.SubstrMinShared)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = graft.SparkEntry.queries("q86_substring_winnow")(spark, sf)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch,
      s"streaming!=batch: only-streaming=${streamed -- batch}, only-batch=${batch -- streamed}")
  }

  test("streaming near-dup operator in batch mode equals the batch LSH pair set (q32)") {
    val sf = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, sf)
    val streamingOp = StatefulStreams.streamingNearDupPairs(docs)
      .toDF("doc_a", "doc_b", "est_jaccard").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = graft.SparkEntry.queries("q32_minhash_lsh")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamingOp == batch,
      s"streaming!=batch: only-streaming=${streamingOp -- batch}, only-batch=${batch -- streamingOp}")
  }
}
