package graft.queries

import graft.SparkSpec

/** Pins for the q162 signal statistics: a hand-traced fixture plus a
  * property test of the whole sufficient-statistics algebra (dense
  * grid, covariance/variance numerators, lag-1 autocovariance) against
  * an exact BigInt reference on random sparse series.
  */
class SignalsSpec extends SparkSpec {
  import spark.implicits._

  private def reference(counts: Seq[(Long, Long, Long)]) = {
    val h0 = counts.map(_._1).min
    val h1 = counts.map(_._1).max
    val m = counts.map(t => t._1 -> (t._2, t._3)).toMap
    val xs = (h0 to h1).map(h => BigInt(m.get(h).map(_._1).getOrElse(0L)))
    val ys = (h0 to h1).map(h => BigInt(m.get(h).map(_._2).getOrElse(0L)))
    val n = BigInt(xs.size)
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val sll = xs.zip(xs.drop(1)).map { case (a, b) => a * b }.sum
    (xs.size.toLong,
      (n * sxy - sx * sy).toLong,
      (n * xs.map(a => a * a).sum - sx * sx).toLong,
      (n * ys.map(a => a * a).sum - sy * sy).toLong,
      ((n - 1) * sll - (sx - xs.last) * (sx - xs.head)).toLong)
  }

  test("signal stats: hand fixture with a gap hour") {
    // hours 10, 12 present; hour 11 zero-filled
    val counts = Seq((10L, 2L, 1L), (12L, 4L, 3L))
    val got = Signals.signalStatsOf(counts.toDF("hr", "x", "y")).collect().head
    val exp = reference(counts)
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3),
      got.getLong(4)) == exp, s"got $got exp $exp")
  }

  test("signal stats: single-hour series has zero numerators") {
    val got = Signals.signalStatsOf(Seq((5L, 3L, 7L)).toDF("hr", "x", "y"))
      .collect().head
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3),
      got.getLong(4)) == ((1L, 0L, 0L, 0L, 0L)))
  }

  test("property: signal stats equal the BigInt reference") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    val gen = for {
      n <- Gen.choose(1, 12)
      rows <- Gen.listOfN(n, for {
        hr <- Gen.choose(0L, 20L)
        x <- Gen.choose(0L, 9L)
        y <- Gen.choose(0L, 9L)
      } yield (hr, x, y))
    } yield rows.groupBy(_._1).map { case (h, vs) =>
      (h, vs.map(_._2).sum, vs.map(_._3).sum) }.toSeq
    val prop = Prop.forAll(gen) { counts =>
      counts.isEmpty || {
        val got = Signals.signalStatsOf(counts.toDF("hr", "x", "y"))
          .collect().head
        (got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3),
          got.getLong(4)) == reference(counts)
      }
    }
    val res = check(Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }
}
