package graft.queries

import graft.SparkSpec

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def search(docs: org.apache.spark.sql.DataFrame, phrase: Seq[String]) =
    Retrieval.phraseSearch(docs, phrase)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("phraseSearch counts exact adjacent occurrences") {
    val docs = Seq(
      (1L, "a b c a b c x a b"),
      (2L, "a a a"),
      (3L, "b c a"),
    ).toDF("doc_id", "text")
    assert(search(docs, Seq("a", "b", "c")) == Seq((1L, 2L)))
    assert(search(docs, Seq("a", "b")) == Seq((1L, 3L)))
    // repeated-term phrase: overlapping occurrences count (i=0 and i=1)
    assert(search(docs, Seq("a", "a")) == Seq((2L, 2L)))
    // single term: plain term frequency
    assert(search(docs, Seq("c")) == Seq((1L, 2L), (3L, 1L)))
    // absent phrase: no rows
    assert(search(docs, Seq("c", "x", "z")).isEmpty)
  }

  // A k-term phrase must NOT rebuild the postings (tokenize+posexplode)
  // per term: one Generate in the plan = one corpus pass, with the
  // per-term split done by a broadcast (term, offset) join instead.
  test("phraseSearch plans ONE postings build for a k-term phrase") {
    val docs = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val plan = Retrieval.phraseSearch(docs, Seq("a", "b", "c"))
      .queryExecution.executedPlan.toString
    val generates = "Generate".r.findAllIn(plan).size
    assert(generates == 1, s"expected 1 Generate, got $generates:\n$plan")
  }

  test("winnowing substring dedup finds planted copied passages only") {
    // doc 1 and doc 2 share one long verbatim passage embedded in
    // otherwise-different text; doc 3 is unrelated. The content-defined
    // sampling must select the same windows inside the shared passage
    // on both sides, so (1,2) surfaces and nothing else does.
    val passage = ("the quick brown fox jumps over the lazy dog and then " +
      "runs far away into the deep dark forest tonight") * 3
    val rnd = new scala.util.Random(11)
    def noise(n: Int) =
      (0 until n).map(_ => ('a' + rnd.nextInt(26)).toChar).grouped(7).map(_.mkString).mkString(" ")
    val docs = Seq(
      (1L, s"${noise(200)} $passage ${noise(150)}"),
      (2L, s"${noise(180)} $passage ${noise(120)}"),
      (3L, noise(600)),
    ).toDF("doc_id", "text")
    val got = Dedup.substringNearDupPairs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 2L)))
  }

  test("containment verify surfaces a short doc pasted inside a long one") {
    // doc 2 IS a passage of doc 1: Jaccard is low (doc 1 has far more
    // grams) but containment on doc 2's side must be ~1.0; doc 3 is
    // unrelated and must not pair
    val passage = "the quick brown fox jumps over the lazy dog and then " +
      "runs far away into the deep dark forest tonight hunting rabbits " +
      "until the morning light returns over the quiet hills"
    val rnd = new scala.util.Random(13)
    def noise(n: Int) =
      (0 until n).map(_ => ('a' + rnd.nextInt(26)).toChar).grouped(7).map(_.mkString).mkString(" ")
    val docs = Seq(
      (1L, s"${noise(900)} $passage ${noise(900)}"),
      (2L, passage),
      (3L, noise(400)),
    ).toDF("doc_id", "text")
    val out = Dedup.containmentPairs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
    assert(out.map(t => (t._1, t._2)) == Seq((1L, 2L)))
    val (_, _, contLong, contShort) = out.head
    assert(contShort > 0.95, s"short-side containment should be ~1, got $contShort")
    assert(contLong < 0.5, s"long-side containment should be small, got $contLong")
  }

  test("k-center greedy picks the farthest-point order on a known geometry") {
    // unit vectors in the plane at 0°, 5°, 10°, 180°, 90°, 270°.
    // From seed 0: the antipode (3) first, then the two orthogonals —
    // 5 before 4 because cos(270°) rounds to a tiny NEGATIVE float
    // where cos(90°) rounds tiny positive, so 5's max-cos is smaller —
    // then 10° (2) before 5° (1): near-duplicates of the seed surface
    // LAST, which is the curation point.
    val vecs = Seq(0.0, 5.0, 10.0, 180.0, 90.0, 270.0).zipWithIndex.map {
      case (deg, i) =>
        val r = math.toRadians(deg)
        (i.toLong, Seq(math.cos(r).toFloat, math.sin(r).toFloat))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val got = Similarity.kCenterSelect(df, 6)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(got == Seq((1, 0L), (2, 3L), (3, 5L), (4, 4L), (5, 2L), (6, 1L)))
  }

  test("positional postings are per (term, doc) with sorted positions") {
    val docs = Seq((7L, "b a b")).toDF("doc_id", "text")
    val idx = Retrieval.positionalPostings(docs)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getSeq[Long](2))).toSet
    assert(idx == Set(("a", 7L, Seq(1L)), ("b", 7L, Seq(0L, 2L))))
  }
}
