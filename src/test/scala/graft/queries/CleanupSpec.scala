package graft.queries

import graft.SparkSpec

/** Pins the edges of the q121/q124 document rewrites that the sf
  * corpora don't exercise: a document whose EVERY segment is
  * boilerplate (reassembles to the empty string), partial-tail
  * segments shorter than SegLen, and the q122 smoothing floor for a
  * document with no reference-model overlap.
  */
class CleanupSpec extends SparkSpec {
  import spark.implicits._

  // two 8-token segments, shared verbatim by docs 0 and 1
  private val segA = "alpha beta gamma delta epsilon zeta eta theta"
  private val segB = "iota kappa lambda mu nu xi omicron pi"

  test("segment dedup drops shared segments and reassembles the rest") {
    val docs = Seq(
      (0L, s"$segA $segB"), // all segments boilerplate -> empty clean text
      (1L, s"$segA rho sigma tau upsilon phi chi psi omega unique trailing"),
      (2L, s"$segB"), // exactly one segment, boilerplate
      (3L, "lone content nothing shared here at all")) // untouched, 7-token tail
      .toDF("doc_id", "text")
    val got = Cleanup.segmentDedupOf(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // (n_toks, n_removed, n_segs_dropped)
    assert(got(0L) == ((16L, 16L, 2L)), s"got ${got(0L)}")
    assert(got(1L) == ((18L, 8L, 1L)), s"got ${got(1L)}")
    assert(got(2L) == ((8L, 8L, 1L)), s"got ${got(2L)}")
    assert(got(3L) == ((7L, 0L, 0L)), s"got ${got(3L)}")
    // fully-dropped docs share the empty-string fingerprint
    val hashes = Cleanup.segmentDedupOf(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(hashes(0L) == hashes(2L))
    assert(hashes(0L) != hashes(3L))
  }

  test("repetition trim collapses runs and counts distinct repeated terms") {
    val docs = Seq(
      (0L, "batch batch batch stream stream spark"), // runs of 3 and 2
      (1L, "clean text with no adjacent repeats"),
      (2L, "dup dup")) // collapses to one token
      .toDF("doc_id", "text")
    val got = Cleanup.repetitionTrimOf(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // (n_toks, n_removed, n_dup_terms)
    assert(got(0L) == ((6L, 3L, 2L)), s"got ${got(0L)}")
    assert(got(1L) == ((6L, 0L, 0L)), s"got ${got(1L)}")
    assert(got(2L) == ((2L, 1L, 1L)), s"got ${got(2L)}")
  }

  test("streaming segment dedup matches batch q121 when mined on the same corpus") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    val fixture = Seq(
      (0L, s"$segA $segB"),
      (1L, s"$segA rho sigma tau upsilon phi chi psi omega unique trailing"),
      (2L, s"$segB"),
      (3L, "lone content nothing shared here at all"))
    val static = fixture.toDF("doc_id", "text")
    val batch = Cleanup.segmentDedupOf(static).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    val in = MemoryStream[(Long, String)]
    val out = Cleanup.segmentDedupStream(in.toDF().toDF("doc_id", "text"), static)
    val q = out.writeStream.format("memory").queryName("seg_stream")
      .outputMode("append").start()
    try {
      in.addData(fixture)
      q.processAllAvailable()
      val got = spark.table("seg_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSet
      assert(got == batch, s"stream $got != batch $batch")
    } finally q.stop()
  }

  test("property: segment dedup equals a sequential reference on random corpora") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    // tiny vocab + short docs force shared segments, partial tails,
    // fully-boilerplate docs, and single-segment docs
    val word = Gen.oneOf("aa", "bb", "cc")
    val gen = for {
      n <- Gen.choose(1, 24)
      docs <- Gen.listOfN(n, Gen.choose(0, 19).flatMap(len => Gen.listOfN(len, word)))
    } yield docs.zipWithIndex.map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
    def reference(docs: Seq[(Long, String)]): Map[Long, (Long, Long, Long)] = {
      val segs = docs.map { case (id, text) =>
        id -> text.split(" ").filter(_.nonEmpty).grouped(Cleanup.SegLen)
          .map(_.mkString(" ")).toSeq
      }.toMap
      val df = segs.toSeq.flatMap { case (id, ss) => ss.distinct.map(_ -> id) }
        .groupBy(_._1).map { case (s, m) => s -> m.size }
      docs.map { case (id, text) =>
        val n = text.split(" ").count(_.nonEmpty).toLong
        val dropped = segs(id).filter(s => df(s) >= Cleanup.SegMinDf)
        id -> ((n, dropped.map(_.split(" ").length.toLong).sum, dropped.size.toLong))
      }.toMap
    }
    val prop = Prop.forAll(gen) { docs =>
      val got = Cleanup.segmentDedupOf(docs.toDF("doc_id", "text")).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      got == reference(docs)
    }
    val res = check(Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("fluency floor: a doc with zero reference overlap scores the smoothed minimum") {
    val docs = Seq(
      (0L, "en", "spark table spark table spark table spark table spark"),
      (1L, "zz", "qqq www qqq www qqq www")) // no bucket overlap w/ ref (w.h.p.)
      .toDF("doc_id", "lang", "text")
    val got = Fluency.fluencyOf(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // ref doc: 8 bigrams, each bucket holds 4 of the 8 ref contexts ->
    // fp = (4+1)*2^20 div (4+1024) = 5100 for every bigram
    assert(got(0L) == ((8L, 5100L, 0L)), s"got ${got(0L)}")
    // floor = (0+1)*2^20 div (0+Buckets) = 1024 when the doc's buckets
    // miss the reference model entirely
    assert(got(1L) == ((5L, 1024L, 0L)), s"got ${got(1L)}")
  }
}
