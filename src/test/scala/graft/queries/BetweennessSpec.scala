package graft.queries

import graft.SparkSpec

/** Pins the q262 sampled-Brandes core (Graph.betweennessOf) against a
  * sequential fold of the same bounded-radius recurrence — identical
  * 2^20 fixed-point integer arithmetic (per-term truncating DIV), so
  * equality is exact, plus hand-checkable facts on a diamond graph
  * (two equal shortest paths split the dependency 50/50).
  */
class BetweennessSpec extends SparkSpec {
  import spark.implicits._

  private val Fp = 1048576L

  /** Sequential bounded-radius Brandes over the undirected closure of
    * `e0`, same per-term integer DIV as the distributed code.
    */
  private def reference(
      e0: Seq[(Long, Long)], seeds: Seq[Long], hops: Int): Map[Long, Long] = {
    val adj = (e0 ++ e0.map(_.swap)).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2) }
    val bc = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for (s <- seeds) {
      // forward: levels + path counts
      val sigma = scala.collection.mutable.Map(s -> 1L)
      val levels = scala.collection.mutable.ArrayBuffer(Seq(s))
      val visited = scala.collection.mutable.Set(s)
      for (_ <- 1 to hops) {
        val cand = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
        for (u <- levels.last; v <- adj.getOrElse(u, Nil)) cand(v) += sigma(u)
        val next = cand.keys.filterNot(visited).toSeq.sorted
        next.foreach { v => sigma(v) = cand(v); visited += v }
        levels += next
      }
      // backward: per-term fixed-point dependency accumulation
      val delta = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      for (h <- (hops - 1) to 1 by -1) {
        val atNext = levels(h + 1).toSet
        for (v <- levels(h)) {
          val dep = adj.getOrElse(v, Nil).filter(atNext).map { w =>
            sigma(v) * (Fp + delta(w)) / sigma(w)
          }.sum
          delta(v) = dep
          bc(v) += dep
        }
      }
    }
    bc.filter(_._2 > 0).toMap
  }

  private def run(
      e0: Seq[(Long, Long)], seeds: Seq[Long], hops: Int): Map[Long, Long] =
    Graph.betweennessOf(e0.toDF("src", "dst"), seeds.toDF("id"), hops)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("diamond: two equal shortest paths split the dependency 50/50") {
    // 1 -> {2,3} -> 4 -> 5; from seed 1, sigma(4)=2, so each of 2 and 3
    // carries half of 4's (1 + delta(4)/Fp) dependency.
    val e0 = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
    val got = run(e0, Seq(1L), hops = 3)
    assert(got == reference(e0, Seq(1L), 3), s"got $got")
    // delta(4) = sigma(4)*(Fp+delta(5))/sigma(5) = 2*Fp/2 = Fp;
    // delta(2) = delta(3) = sigma(2)*(Fp+delta(4))/sigma(4)
    //          = (Fp+Fp)/2 = Fp: each branch carries half of 4's
    // doubled dependency — one full unit apiece.
    assert(got(4L) == Fp)
    assert(got(2L) == got(3L))
    assert(!got.contains(5L) && !got.contains(1L)) // leaves broker nothing
  }

  test("path + cycle fixture equals the sequential fold, multi-seed") {
    // 4-cycle 1-2-3-4 with a tail 3-5-6: mixed path multiplicities
    val e0 = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (3L, 5L), (5L, 6L))
    val seeds = Seq(1L, 5L)
    val got = run(e0, seeds, hops = 3)
    assert(got == reference(e0, seeds, 3), s"got $got")
    // 3 joins the cycle to the tail: every bounded path from seed 5
    // into the cycle routes through it — strictly the biggest broker
    assert(got(3L) == got.values.max)
    // 6 is a leaf and 5 is itself a source at radius 0 — neither brokers
    assert(!got.contains(6L) && !got.contains(5L))
  }
}
