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

  test("positional postings are per (term, doc) with sorted positions") {
    val docs = Seq((7L, "b a b")).toDF("doc_id", "text")
    val idx = Retrieval.positionalPostings(docs)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getSeq[Long](2))).toSet
    assert(idx == Set(("a", 7L, Seq(1L)), ("b", 7L, Seq(0L, 2L))))
  }
}
