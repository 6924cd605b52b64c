package graft.queries

import graft.SparkSpec

/** Semantic pins for the q115 DSIR-style importance weights: the score
  * is a pure function of the hashed feature profile (lang only enters
  * through the GLOBAL counts), and documents matching the target
  * distribution score strictly higher per feature than disjoint ones.
  */
class DsirWeightsSpec extends SparkSpec {
  import spark.implicits._

  private val textA = "the quick brown fox jumps over the lazy dog again today"
  private val textB = "zxq wvu tsr qpo nml kji hgf edc ba zyx wv"

  test("weight is feature-determined; target-like docs outscore disjoint ones") {
    val docs = Seq(
      (1L, "en", textA),
      (2L, "en", textA),
      (3L, "de", textA), // same features as the en docs -> same weight
      (4L, "de", textB)) // disjoint features, zero target mass
      .toDF("doc_id", "lang", "text")
    val got = Sampling.dsirWeightsOf(docs, "en").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byId = got.map(t => t._1 -> t).toMap
    assert(got.map(_._1).toList == List(1L, 2L, 3L, 4L))
    assert(byId(1L) == byId(2L).copy(_1 = 1L), s"identical docs differ: $got")
    assert(byId(3L)._3 == byId(1L)._3,
      s"weight must ignore the doc's own lang: $got")
    // per-feature average score: A-features carry target mass (t_f = 2),
    // B-features none (t_f = 0) -> strict ordering
    val perFeatA = byId(1L)._3.toDouble / byId(1L)._2
    val perFeatB = byId(4L)._3.toDouble / byId(4L)._2
    assert(perFeatA > perFeatB,
      s"target-like doc does not outscore disjoint doc: $perFeatA vs $perFeatB")
  }

  test("streaming DSIR gate matches batch weights when fit on the same corpus") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    val fixture = Seq(
      (1L, "en", textA), (2L, "en", textA), (3L, "de", textA), (4L, "de", textB))
    val static = fixture.toDF("doc_id", "lang", "text")
    val batch = Sampling.dsirWeightsOf(static, "en").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val in = MemoryStream[(Long, String, String)]
    val out = Sampling.dsirWeightsStream(
      in.toDF().toDF("doc_id", "lang", "text"), static, "en")
    val q = out.writeStream.format("memory").queryName("dsir_stream")
      .outputMode("append").start()
    try {
      in.addData(fixture)
      q.processAllAvailable()
      val got = spark.table("dsir_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == batch, s"stream $got != batch $batch")
    } finally q.stop()
  }

  test("smoothing keeps zero-target-mass features at a positive score") {
    val docs = Seq((1L, "de", textB)).toDF("doc_id", "lang", "text")
    val Array(r) = Sampling.dsirWeightsOf(docs, "en").collect()
    // every feature scores (10000 * (0 + 1)) div (1 + 2) = 3333
    assert(r.getLong(2) == 3333L * r.getLong(1), s"smoothing broken: $r")
  }
}
