package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RangeJoinsSpec extends SparkSpec {
  import spark.implicits._

  test("binned range join equals the naive non-equi join") {
    val rnd = new scala.util.Random(3)
    val probe = (1L to 300L).map(i => (i % 9, rnd.nextInt(100000).toLong, i))
      .toDF("k", "t", "id")
    val cand = (1L to 2000L).map(_ => (rnd.nextInt(9).toLong, rnd.nextInt(100000).toLong))
      .toDF("k", "t")
    val w = 7000L

    val binned = RangeJoins.countPreceding(probe, cand, "k", "t", "id", w)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

    val c2 = cand.toDF("ck", "ct")
    val naive = probe.join(c2,
        $"k" === $"ck" && $"ct" >= $"t" - w && $"ct" < $"t", "left_outer")
      .groupBy($"id").agg(count($"ct").as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

    assert(binned == naive)
    assert(binned.size == 300 && binned.values.sum > 0)
  }
}
