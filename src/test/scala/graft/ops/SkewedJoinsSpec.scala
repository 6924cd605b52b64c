package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SkewedJoinsSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals plain join on skewed data") {
    // 90% of rows share one hot key
    val big = (1 to 10000).map(i => (if (i % 10 == 0) i.toLong % 50 else 7L, i))
      .toDF("k", "v")
    val small = (0L until 50L).map(k => (k, s"dim_$k")).toDF("k2", "name")
    val plain = big.join(small, $"k" === $"k2").select($"v", $"name")
    val salted = SkewedJoins.saltedEquiJoin(big, small, $"k", $"k2")
      .select($"v", $"name")
    val a = plain.collect().map(r => (r.getInt(0), r.getString(1))).sorted.toSeq
    val b = salted.collect().map(r => (r.getInt(0), r.getString(1))).sorted.toSeq
    assert(a == b && a.nonEmpty)
  }

  test("salted left join preserves unmatched big-side rows exactly once") {
    val big = Seq((1L, "a"), (99L, "b"), (99L, "c")).toDF("k", "v")
    val small = Seq((1L, "dim")).toDF("k2", "name")
    val out = SkewedJoins.saltedEquiJoin(big, small, $"k", $"k2", 8, "left_outer")
      .select($"v", $"name").collect().map(r => (r.getString(0), Option(r.getString(1))))
    assert(out.sortBy(_._1).toSeq == Seq(("a", Some("dim")), ("b", None), ("c", None)))
  }
}
