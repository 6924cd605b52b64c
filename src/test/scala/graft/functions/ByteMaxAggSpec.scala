package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Equality spec for the packed-register merge (the r17 verdict asked
  * for "its own equality spec vs the current register layout"):
  * `bytemax` over byte-packed longs must equal the per-register
  * unsigned max of the 64-column layout it replaced, for every lane
  * value the contract admits (0..0x7F), including the lane-7 values
  * whose SWAR borrow crosses bit 63 — the signed-overflow inputs that
  * require LEGACY wrapping subtraction under the session's ANSI
  * default (the round-18 snapshot shipped without it and threw
  * ARITHMETIC_OVERFLOW from inside the codegen'd hash aggregate).
  */
class ByteMaxAggSpec extends SparkSpec {
  import spark.implicits._

  private def unpack(x: Long): Seq[Int] =
    (0 until 8).map(i => ((x >>> (8 * i)) & 0xff).toInt)
  private def pack(lanes: Seq[Int]): Long =
    lanes.zipWithIndex.map { case (v, i) => v.toLong << (8 * i) }
      .reduce(_ | _)

  private def refMax(xs: Seq[Long]): Long =
    pack((0 until 8).map(i => (xs.map(x => unpack(x)(i)) :+ 0).max))

  test("bytemax equals per-lane max of the unpacked layout (grouped, partial+final merge)") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(255)
    // full admitted lane range 0..0x7F; 11 groups across 4 shuffle
    // partitions so the DeclarativeAggregate's merge path runs too
    val rows = (1 to 4096).map { i =>
      (s"g${i % 11}", pack(Seq.fill(8)(rnd.nextInt(0x80))))
    }
    val got = rows.toDF("g", "p").groupBy($"g")
      .agg(expr("bytemax(p)").as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = rows.groupBy(_._1).map { case (g, rs) => g -> refMax(rs.map(_._2)) }
    assert(got == want)
  }

  test("lane-7 borrow crosses bit 63: extreme admitted values stay exact under ANSI default") {
    GraftFunctions.register(spark)
    // (a|H) - b crosses Long.MIN exactly when lane 7 is in play: all-7F
    // vs all-00 in both orders, single-populated words (the q255 root
    // shape emits one populated lane per row), and the HLL rho ceiling 55
    val vals: Seq[Long] = Seq(
      0x7f7f7f7f7f7f7f7fL, 0L, 0x7f00000000000000L, 0x007f000000000000L,
      pack(Seq(1, 0, 55, 0, 0x7f, 3, 0, 0x7f)),
      pack(Seq(0x7f, 55, 0, 2, 0, 0x7f, 1, 0)))
    // every ordered pair, each its own group — update order covered both ways
    val pairs = for {
      (a, i) <- vals.zipWithIndex; (b, j) <- vals.zipWithIndex
    } yield (s"$i-$j", a, b)
    val df = pairs.flatMap { case (g, a, b) => Seq((g, a), (g, b)) }.toDF("g", "p")
    val got = df.groupBy($"g").agg(expr("bytemax(p)").as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = pairs.map { case (g, a, b) => g -> refMax(Seq(a, b)) }.toMap
    assert(got == want)
  }

  test("nulls coalesce to the empty register word (0), matching max(r_i) over absent rows") {
    GraftFunctions.register(spark)
    val got = Seq(("a", Some(pack(Seq(9, 0, 55, 0, 0, 0, 0, 3)))), ("a", None),
        ("b", None), ("b", None))
      .toDF("g", "p").groupBy($"g").agg(expr("bytemax(p)").as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> pack(Seq(9, 0, 55, 0, 0, 0, 0, 3)), "b" -> 0L))
  }
}
