package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins [[Filtering.isotonicFit]] (the convex-minorant formulation)
  * against the textbook sequential stack PAV: the least-squares
  * isotonic fit is UNIQUE in fitted values (strictly convex projection
  * onto the monotone cone), so the hull-derived per-block fits must
  * equal the stack algorithm's pooled means exactly — including on the
  * adversarial "zipper" staircase that defeats round-based parallel
  * PAV schedules. Also pins monotonicity and fixed-point emission.
  */
class IsotonicPavSpec extends SparkSpec {

  private def stackPav(blocks: Seq[(Long, Long, Long)])
      : Seq[(Long, Long, Long, Long)] = {
    // (x_lo, x_hi_index, n, s) pools; input (x, n, s) sorted by x
    val st = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    for ((x, n, s) <- blocks.sortBy(_._1)) {
      st += ((x, x, n, s))
      while (st.length >= 2 && {
        val (a, c) = (st(st.length - 2), st.last)
        BigInt(a._4) * c._3 > BigInt(c._4) * a._3
      }) {
        val c = st.remove(st.length - 1); val a = st.remove(st.length - 1)
        st += ((a._1, c._2, a._3 + c._3, a._4 + c._4))
      }
    }
    st.toSeq
  }

  private def check(in: Seq[(Long, Long, Long)]): Unit = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("x", LongType),
      StructField("n", LongType), StructField("s", LongType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(in.map(t => Row(t._1, t._2, t._3)), 4),
      schema)
    val got = Filtering.isotonicFit(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.map(_._1).toSeq == in.map(_._1).sorted, "one output row per block")
    // expected: each block's fitted value = its stack-PAV pool mean
    val pools = stackPav(in)
    val want = in.sortBy(_._1).map { case (x, _, _) =>
      val p = pools.find(p => p._1 <= x && x <= p._2).get
      (BigInt(p._4) * 1048576 / p._3).toLong
    }
    assert(got.map(_._4).toSeq == want, s"fit mismatch on $in")
    // monotone non-decreasing in x
    got.map(_._4).toSeq.sliding(2).foreach {
      case Seq(a, b) => assert(a <= b)
      case _ =>
    }
    // mass preserved
    assert(got.map(_._2).sum == in.map(_._2).sum)
    assert(got.map(_._3).sum == in.map(_._3).sum)
  }

  private def mk(ys: Seq[(Long, Long)]): Seq[(Long, Long, Long)] =
    ys.zipWithIndex.map { case ((n, s), i) => (i.toLong, n, s) }

  test("zipper staircase (the round-based-PAV killer) pools correctly") {
    check(mk((1L to 64L).map(v => (1L, if (v <= 32) 1L else 0L))))
  }

  test("already monotone input keeps every block's own mean") {
    check(mk(Seq((5L, 0L), (4L, 1L), (3L, 2L), (2L, 2L), (1L, 1L))))
  }

  test("equal-mean plateaus keep exact fitted values") {
    check(mk(Seq((2L, 1L), (4L, 2L), (6L, 3L), (2L, 0L), (2L, 2L))))
  }

  test("single block passes through") {
    check(Seq((7L, 5L, 3L)))
  }

  test("seeded random block sequences match the sequential fit") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 8) {
      val m = 1 + rnd.nextInt(60)
      check(mk(Seq.fill(m) {
        val n = 1L + rnd.nextInt(9)
        (n, (rnd.nextLong() % (n + 1)).abs)
      }))
    }
  }
}
