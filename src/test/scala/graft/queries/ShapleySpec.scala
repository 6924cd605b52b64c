package graft.queries

import graft.SparkSpec

/** Pins the q265 KNN-Shapley core twice over:
  *  - the distributed fixed-point recursion (knnShapleyOf) against a
  *    sequential fold of the SAME truncating-integer recurrence;
  *  - the closed-form recursion itself (in doubles) against the 2^n
  *    Shapley DEFINITION — every subset's marginal contribution under
  *    the K-NN utility U(S) = (1/K)·Σ_{j≤min(K,|S|)} 1[y_{α_j(S)}=y]
  *    (Jia et al. 2019, Theorem 1) — so an off-by-one in the rank/K
  *    handling cannot hide behind engine parity.
  */
class ShapleySpec extends SparkSpec {
  import spark.implicits._

  private val S = 1048576L
  private val K = 2

  /** Sequential fold of the same fixed-point recurrence. `pts` are
    * (vec_id, ind, cos) for ONE test point, any order.
    */
  private def seqFold(pts: Seq[(Long, Long, Double)]): Map[Long, Long] = {
    val byRank = pts.sortBy(p => (-p._3, p._1))
    val n = byRank.size
    val sv = new Array[Long](n)
    sv(n - 1) = byRank(n - 1)._2 * S / n
    for (j <- (n - 2) to 0 by -1) {
      val rk = j + 1
      val m = math.min(K, rk).toLong
      val a = byRank(j)._2 * S * m / (K * rk)
      val b = byRank(j + 1)._2 * S * m / (K * rk)
      sv(j) = sv(j + 1) + a - b
    }
    byRank.map(_._1).zip(sv).toMap
  }

  /** Closed-form recursion in doubles (rank 1 = nearest). */
  private def closedForm(ind: Array[Int]): Array[Double] = {
    val n = ind.length
    val s = new Array[Double](n)
    s(n - 1) = ind(n - 1).toDouble / n
    for (j <- (n - 2) to 0 by -1) {
      val rk = j + 1
      s(j) = s(j + 1) +
        (ind(j) - ind(j + 1)).toDouble * math.min(K, rk) / (K.toDouble * rk)
    }
    s
  }

  /** The 2^n definition: exact Shapley of the K-NN utility, doubles. */
  private def bruteShapley(ind: Array[Int]): Array[Double] = {
    val n = ind.length
    def u(members: Seq[Int]): Double = { // members = ranks ascending
      members.take(K).map(ind(_)).sum.toDouble / K
    }
    val fact = (0 to n).map(i => (1 to i).foldLeft(1.0)(_ * _))
    Array.tabulate(n) { i =>
      val others = (0 until n).filterNot(_ == i)
      (0 until (1 << others.size)).map { mask =>
        val sub = others.zipWithIndex.collect {
          case (o, b) if (mask & (1 << b)) != 0 => o
        }
        val w = fact(sub.size) * fact(n - sub.size - 1) / fact(n)
        w * (u((sub :+ i).sorted) - u(sub.sorted))
      }.sum
    }
  }

  test("distributed fixed-point recursion equals the sequential fold, multi-test") {
    // two test points over six shared train vectors, different orders
    val t0 = Seq((11L, 1L, 0.9), (12L, 0L, 0.8), (13L, 1L, 0.7),
      (14L, 0L, 0.5), (15L, 1L, 0.3), (16L, 0L, 0.1))
    val t1 = Seq((11L, 0L, 0.2), (12L, 1L, 0.95), (13L, 0L, 0.6),
      (14L, 1L, 0.4), (15L, 0L, 0.85), (16L, 1L, 0.05))
    val rows =
      t0.map { case (v, ind, cos) => (100L, v, 0, cos, ind) } ++
        t1.map { case (v, ind, cos) => (101L, v, 0, cos, ind) }
    val got = Similarity.knnShapleyOf(
        rows.toDF("test_id", "vec_id", "label", "cos", "ind"), K)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val want = (seqFold(t0).toSeq ++ seqFold(t1).toSeq)
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    assert(got == want, s"got $got want $want")
  }

  test("closed-form recursion equals the 2^n Shapley definition") {
    for (indPattern <- Seq(
        Array(1, 0, 1, 0, 1, 0), Array(0, 0, 1, 1, 0, 1),
        Array(1, 1, 1, 1, 1, 1), Array(0, 0, 0, 0, 0, 0),
        Array(0, 1, 0, 0, 0, 0))) {
      val cf = closedForm(indPattern)
      val bf = bruteShapley(indPattern)
      for (i <- indPattern.indices)
        assert(math.abs(cf(i) - bf(i)) < 1e-12,
          s"pattern ${indPattern.mkString} i=$i cf=${cf(i)} bf=${bf(i)}")
    }
  }
}
