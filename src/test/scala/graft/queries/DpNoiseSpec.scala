package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the q264 geometric-mechanism sampler: the integer map from
  * u ∈ [0, 3·2^B − 2) to a noise value draws EXACTLY the truncated
  * two-sided geometric with α = 1/2 — weight 2^(B−|k|) per (sign, |k|)
  * cell — verified exhaustively at a small B in pure Scala, and the
  * Spark SQL expression is pinned against the same map at the
  * production B over a dense u prefix plus every boundary value.
  */
class DpNoiseSpec extends SparkSpec {
  import spark.implicits._

  /** The sampler as specified in Privacy.q264, parameterized by B. */
  private def noiseOf(u: Long, b: Int): Long = {
    val half = 1L << b
    if (u < half) 0L
    else {
      val v2 = u - half
      val sign = 1 - 2 * (v2 % 2)
      val t = half - 1 - v2 / 2
      sign * (b + 1 - java.lang.Long.toBinaryString(t).length)
    }
  }

  test("exhaustive small-B histogram equals the closed-form weights") {
    val b = 6
    val total = 3L * (1L << b) - 2
    val hist = (0L until total).map(noiseOf(_, b))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(hist(0L) == (1L << b))
    for (j <- 1 to b) {
      assert(hist(j.toLong) == (1L << (b - j)), s"+$j")
      assert(hist(-j.toLong) == (1L << (b - j)), s"-$j")
    }
    assert(hist.values.sum == total) // partition of the u-range
  }

  test("Spark expression matches the reference map at B = 20") {
    val b = Privacy.DpB
    val half = 1L << b
    // dense prefix, the central/tail boundaries, and the range maximum
    val us = (0L until 4096L) ++
      Seq(half - 1, half, half + 1, 2 * half - 1, 2 * half,
        Privacy.DpT - 2, Privacy.DpT - 1)
    val got = us.toDF("u")
      .withColumn("noise", expr(
        s"""CASE WHEN u < $half THEN 0L ELSE
           |  (1 - 2 * ((u - $half) % 2))
           |  * ($b + 1 - length(bin($half - 1 - (u - $half) DIV 2)))
           |END""".stripMargin))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    us.foreach { u =>
      assert(got(u) == noiseOf(u, b), s"u=$u got ${got(u)}")
    }
    // extreme tails map to ±B, never beyond
    assert(got(Privacy.DpT - 1) == -b && got(Privacy.DpT - 2) == b)
  }
}
