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
}
