package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  test("kth-min matches a local sort; estimate within 30% at 10k distinct") {
    val k = 64
    val rnd = new scala.util.Random(5)
    val hashes = (1 to 20000).map(_ => rnd.nextLong().abs % (1L << 60)) // ~10-20k distinct
    val distinct = hashes.distinct
    val got = hashes.toDF("h").repartition(8)
      .agg(KmvSketch.kthMinHash(col("h"), k).as("kth")).as[Long].head()
    val want = distinct.sorted.apply(k - 1)
    assert(got == want)
    val est = (k - 1).toDouble * (1L << 60).toDouble / got
    val err = math.abs(est - distinct.size) / distinct.size
    assert(err < 0.3, s"estimate $est vs ${distinct.size} err $err")
  }

  test("sketch is exact-sentinel below k distinct and dedups") {
    val got = Seq(5L, 5L, 7L, 7L, 9L).toDF("h")
      .agg(KmvSketch.kthMinHash(col("h"), 64).as("kth")).as[Long].head()
    assert(got == -1L) // only 3 distinct < 64
    val got4 = Seq(5L, 5L, 7L, 9L, 11L, 1L).toDF("h")
      .agg(KmvSketch.kthMinHash(col("h"), 4).as("kth")).as[Long].head()
    assert(got4 == 9L) // 4th smallest of {1,5,7,9,11}
  }

  test("merge across many partitions equals single-partition result") {
    val vals = (1L to 5000L).map(i => i * 7919L % 100003L)
    val a = vals.toDF("h").repartition(32)
      .agg(KmvSketch.kthMinHash(col("h"), 32)).as[Long].head()
    val b = vals.toDF("h").coalesce(1)
      .agg(KmvSketch.kthMinHash(col("h"), 32)).as[Long].head()
    assert(a == b)
  }
}
