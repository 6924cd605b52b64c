package graft.plans

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.SparkSpec

class TopKSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("TopK.perKey equals the window row_number formulation") {
    val o = graft.Tables.orders(spark, sf)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
    val topk = TopK.perKey(o, Seq("o_orderpriority"),
      Seq(col("o_totalprice").desc, col("o_orderkey").asc), 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val win = o.withColumn("rk", row_number().over(w)).filter(col("rk") <= 3).drop("rk")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(topk == win)
  }

  test("TopK plans partial -> exchange -> final, with no sort anywhere") {
    val o = graft.Tables.orders(spark, sf)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
    val df = TopK.perKey(o, Seq("o_orderpriority"), Seq(col("o_totalprice").desc), 5)
    val plan = df.queryExecution.executedPlan.toString
    assert("TopKPerKey \\[".r.findAllIn(plan).size == 2, s"want partial+final:\n$plan")
    assert(plan.contains("Exchange hashpartitioning(o_orderpriority"), plan)
    assert(!plan.contains("Sort "), s"top-k must not sort:\n$plan")
    // the partial stage bounds shuffle volume at keys x k rows
    val shuffled = df.collect()
    assert(shuffled.length == 5 * o.select("o_orderpriority").distinct().count())
  }

  test("heap eviction keeps the k best under a total order with duplicates") {
    import spark.implicits._
    // many duplicate order keys: deterministic thanks to the tiebreaker
    val df = (0 until 1000).map(i => (i % 7, i % 10, i.toLong)).toDF("key", "score", "tie")
    val got = TopK.perKey(df, Seq("key"), Seq(col("score").desc, col("tie").asc), 4)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
    val w = Window.partitionBy(col("key")).orderBy(col("score").desc, col("tie").asc)
    val want = df.withColumn("rk", row_number().over(w)).filter(col("rk") <= 4).drop("rk")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == want)
  }
}
