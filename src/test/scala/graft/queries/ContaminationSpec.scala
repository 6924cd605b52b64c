package graft.queries

import graft.SparkSpec

class ContaminationSpec extends SparkSpec {
  import spark.implicits._

  test("a near-copy of a benchmark doc is flagged, unrelated docs are not") {
    val benchText = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val docs = Seq(
      (0L, benchText), // doc_id % 97 == 0 -> benchmark slice
      (1L, benchText + " with a tiny suffix change"), // near-copy: most 5-grams shared
      (2L, "completely different words nothing shared here at all in any gram"),
      (3L, "short")) // fewer tokens than a 5-gram: n_grams = 0, never flagged
      .toDF("doc_id", "text")
    val got = Contamination.contaminationOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toList
    val byId = got.map(t => t._1 -> t).toMap
    assert(got.map(_._1) == List(1L, 2L, 3L)) // benchmark doc itself excluded
    val (_, n1, h1, c1) = byId(1L)
    assert(c1 == 1 && h1 * 2 >= n1, s"near-copy not flagged: $got")
    assert(byId(2L)._3 == 0 && byId(2L)._4 == 0)
    assert(byId(3L)._2 == 0L && byId(3L)._4 == 0)
  }

  test("split-leakage audit flags eval docs whose 5-grams sit in train") {
    val trainText = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val docs = Seq(
      (0L, "train", trainText),
      (1L, "train", "other words filling the training split with content"),
      (2L, "val", trainText + " trailing extra"), // near-copy of doc 0 -> leaked
      (3L, "val", "completely different vocabulary nothing shared anywhere at all ok"),
      (4L, "test", "alpha beta gamma delta epsilon plus unrelated suffix tokens here"))
      .toDF("doc_id", "split", "text")
    val got = Contamination.splitLeakageOf(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toList
    assert(got.map(_._1) == List(2L, 3L, 4L)) // train docs never audited
    val byId = got.map(t => t._1 -> t).toMap
    val (_, s2, n2, h2, l2) = byId(2L)
    assert(s2 == "val" && l2 == 1L && h2 * 2 >= n2, s"near-copy not leaked: $got")
    assert(byId(3L)._4 == 0L && byId(3L)._5 == 0L) // zero overlap, clean
    val (_, _, n4, h4, l4) = byId(4L)
    assert(h4 > 0L && l4 == 0L && h4 * 2 < n4, // partial overlap below 50%
      s"partial-overlap doc misflagged: $got")
  }

  test("the contamination gate runs unchanged as a streaming filter") {
    // stream-static form: the benchmark gram array is computed from a
    // static frame, and each micro-batch of candidate docs streams
    // through the same single-scan overlap plan
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    val benchText = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val static = Seq((0L, benchText)).toDF("doc_id", "text")
    val in = MemoryStream[(Long, String)]
    val out = Contamination.contaminationStream(in.toDF().toDF("doc_id", "text"), static)
    val q = out.writeStream.format("memory").queryName("contam")
      .outputMode("append").start()
    try {
      in.addData(Seq((1L, benchText + " slightly extended"), (2L, "nothing in common at all here friends")))
      q.processAllAvailable()
      val got = spark.table("contam").collect()
        .map(r => (r.getLong(0), r.getInt(3))).toMap
      assert(got == Map(1L -> 1, 2L -> 0), s"got $got")
    } finally q.stop()
  }
}
