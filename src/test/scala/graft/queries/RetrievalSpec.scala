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

  test("positional postings are per (term, doc) with sorted positions") {
    val docs = Seq((7L, "b a b")).toDF("doc_id", "text")
    val idx = Retrieval.positionalPostings(docs)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getSeq[Long](2))).toSet
    assert(idx == Set(("a", 7L, Seq(1L)), ("b", 7L, Seq(0L, 2L))))
  }
}
