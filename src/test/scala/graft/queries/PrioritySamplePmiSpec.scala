package graft.queries

import graft.SparkSpec

/** Fixture pins for q138 (priority sampling) and q139 (PMI
  * collocations): both recomputed sequentially in-test with the same
  * integer/IEEE arithmetic, so equality is exact — including the
  * τ-threshold estimator law and the fixed-point PMI floor division.
  */
class PrioritySamplePmiSpec extends SparkSpec {
  import spark.implicits._

  /** The same portable 60-bit hash as TextFns.hash60. */
  private def h60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  test("priority sample: top-k by w/u, est_w = max(w, tau), exact doubles") {
    val docs = Seq(
      (1L, 100L), (2L, 5000L), (3L, 40L), (4L, 900L), (5L, 7L), (6L, 2500L))
    val k = 3
    // sequential reference with identical arithmetic
    val pri = docs.map { case (id, w) =>
      val u = (h60(s"pri$id") + 1L).toDouble
      (id, w, w.toDouble * 1.152921504606846976e18 / u)
    }.sortBy { case (id, _, p) => (-p, id) }
    val tau = pri(k)._3
    val expect = pri.take(k).map { case (id, w, p) =>
      (id, w, p, math.max(w.toDouble, tau))
    }
    val got = Sampling.prioritySampleOf(docs.toDF("doc_id", "n_chars"), k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq == expect, s"got ${got.toSeq}\nexp $expect")
    // estimator law: every kept weight is floored at tau
    assert(got.forall { case (_, w, _, e) => e >= w && e >= tau })
  }

  test("PMI collocations: exact fixed-point scores, empty/1-token docs safe") {
    // "x y x y x y": c_x=3, c_y=3, bigrams (x,y)x3 (y,x)x2; plus an
    // empty doc and a 1-token doc (no bigrams, but z joins the unigram
    // total): N = 7
    val docs = Seq("x y x y x y", "", "z").toDF("text")
    val got = Corpus.pmiCollocationsOf(docs, minSupport = 1L, topN = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val s = Corpus.PmiScale
    assert(got.toSeq == Seq(
      ("x", "y", 3L, s * 3 * 7 / 9),
      ("y", "x", 2L, s * 2 * 7 / 9)), s"got ${got.toSeq}")
  }

  test("PMI min-support drops rare bigrams") {
    val docs = Seq("a b a b", "c d").toDF("text")
    val got = Corpus.pmiCollocationsOf(docs, minSupport = 2L, topN = 10)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(got.toSeq == Seq(("a", "b")))
  }
}
