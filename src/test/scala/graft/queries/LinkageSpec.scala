package graft.queries

import graft.SparkSpec

/** Pins q273's Fellegi-Sunter EM core against a sequential fold of the
  * same fixed-point recurrence, and checks the fitted mixture actually
  * recovers planted linkage structure (match class owns the all-agree
  * pattern, non-match class the all-disagree one).
  */
class LinkageSpec extends SparkSpec {
  import spark.implicits._

  private val S = Linkage.FsScale

  /** Sequential EM fold, same integer arithmetic as emOf: histogram is
    * (b1,b2,b3,n) rows; returns (m(3), u(3), p).
    */
  private def reference(
      hist: Seq[(Long, Long, Long, Long)],
      rounds: Int): (Seq[Long], Seq[Long], Long) = {
    var m = Seq.fill(3)(Linkage.FsInitM)
    var u = Seq.fill(3)(Linkage.FsInitU)
    var p = Linkage.FsInitP
    def prod(c: Seq[Long], b: Seq[Long]): Long = {
      def f(k: Int) = b(k) * c(k) + (1 - b(k)) * (S - c(k))
      ((BigInt(f(0)) * f(1) / S * f(2)) / S).toLong
    }
    for (_ <- 1 to rounds) {
      val es = hist.map { case (b1, b2, b3, n) =>
        val b = Seq(b1, b2, b3)
        val mp = prod(m, b); val up = prod(u, b)
        val w = (BigInt(p) * mp * S /
          (BigInt(p) * mp + BigInt(S - p) * up).max(BigInt(1))).toLong
        (b, n, w)
      }
      val tw = es.map { case (_, n, w) => BigInt(n) * w }.sum
      val tnw = es.map { case (_, n, w) => BigInt(n) * (S - w) }.sum
      val tn = es.map(_._2).sum
      m = (0 until 3).map { k =>
        val sm = es.map { case (b, n, w) => BigInt(n) * w * b(k) }.sum
        (sm * S / tw.max(BigInt(1))).toLong.min(S - 1).max(1L)
      }
      u = (0 until 3).map { k =>
        val su = es.map { case (b, n, w) => BigInt(n) * (S - w) * b(k) }.sum
        (su * S / tnw.max(BigInt(1))).toLong.min(S - 1).max(1L)
      }
      p = (tw / BigInt(tn).max(BigInt(1))).toLong.min(S - 1).max(1L)
    }
    (m, u, p)
  }

  // planted mixture: 200 all-agree pairs (the dup cluster), 700
  // all-disagree, and field-correlated noise in between
  private val hist: Seq[(Long, Long, Long, Long)] = Seq(
    (1L, 1L, 1L, 200L), (0L, 0L, 0L, 700L),
    (1L, 1L, 0L, 40L), (1L, 0L, 1L, 25L), (0L, 1L, 1L, 15L),
    (1L, 0L, 0L, 60L), (0L, 1L, 0L, 30L), (0L, 0L, 1L, 20L))

  test("emOf equals the sequential fold") {
    val got = Linkage.emOf(
        hist.toDF("b1", "b2", "b3", "n"), Linkage.FsRounds)
      .collect().head
    val (m, u, p) = reference(hist, Linkage.FsRounds)
    assert((0 until 3).map(got.getLong) == m)
    assert((3 until 6).map(got.getLong) == u)
    assert(got.getLong(6) == p)
  }

  test("fitted mixture recovers the planted structure") {
    val (m, u, p) = reference(hist, Linkage.FsRounds)
    // every field must separate the classes: agreement is evidence FOR
    // a match (m_k > u_k), and the prevalence must sit near the planted
    // ~25% match mass, far from both the 10% init and the boundaries
    (0 until 3).foreach(k => assert(m(k) > u(k), s"field $k: m=${m(k)} u=${u(k)}"))
    assert(p > S / 10 && p < S / 2, s"prevalence $p")
  }

  test("q273 over sf0.001 emits fields, prevalence and patterns") {
    val rows = graft.SparkEntry.queries("q273_record_linkage")(
        spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(Set("field_lang", "field_source", "field_lenb", "prevalence")
      .subsetOf(rows.keySet))
    // odds ratio m/u present and positive for every field
    Seq("field_lang", "field_source", "field_lenb").foreach { f =>
      assert(rows(f).getLong(3) > 0L)
    }
    // posterior weights are valid fixed-point probabilities
    rows.keys.filter(_.startsWith("pattern_")).foreach { k =>
      val w = rows(k).getLong(1)
      assert(w >= 0L && w <= S, s"$k posterior $w")
    }
  }
}
