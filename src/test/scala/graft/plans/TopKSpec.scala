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

  test("optimizer rule rewrites plain window rank filters to TopK automatically") {
    // the session has GraftExtensions: a query written the ordinary
    // DataFrame way must plan through the bounded-heap operator with
    // the rank recomputed over only keys x k pruned rows
    val o = graft.Tables.orders(spark, sf)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val df = o.withColumn("rk", row_number().over(w)).filter(col("rk") <= 2)
    val plan = df.queryExecution.executedPlan.toString
    assert("TopKPerKey \\[".r.findAllIn(plan).size == 2, s"rewrite did not fire:\n$plan")
    val got = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val want = o.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).toSeq.flatMap { case (_, rows) =>
        rows.toSeq.sortBy(t => (-t._3, t._2)).take(2).zipWithIndex
          .map { case ((p, k2, v), i) => (p, k2, v, i + 1) }
      }.toSet
    assert(got == want)
    // a whole-partition aggregate alongside the rank must still see
    // EVERY row of the key — prove the sums are the full-partition ones
    val mixed = o.withColumn("rk", row_number().over(w))
      .withColumn("total", sum(col("o_totalprice")).over(
        Window.partitionBy(col("o_orderpriority"))))
      .filter(col("rk") <= 2)
      .collect().map(r => (r.getString(0), r.getDouble(4))).toMap
    val fullSums = o.groupBy("o_orderpriority").agg(sum("o_totalprice"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    mixed.foreach { case (p, total) =>
      assert(math.abs(total - fullSums(p)) < 1e-6,
        s"$p: pruned sum $total vs full ${fullSums(p)}")
    }
  }

  test("partial-stage flush bound preserves exactness under memory pressure") {
    import spark.implicits._
    // flush after every 2 distinct keys in the partial stage: many
    // partial heap fragments per key, which the final stage re-reduces
    val df = (0 until 2000).map(i => (i % 37, i % 13, i.toLong)).toDF("key", "score", "tie")
    // AQE off so the metrics are readable from a flat executed plan
    // (AQE hides stage subtrees behind QueryStageExec leaves)
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val topk = TopK.perKey(df, Seq("key"),
        Seq(col("score").desc, col("tie").asc), 3, partialFlushKeys = 2)
      val got = topk.collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
      // operator metrics: flushes really happened, and the final stage
      // emitted exactly keys x k rows
      val execs = topk.queryExecution.executedPlan.collect { case t: TopKPerKeyExec => t }
      assert(execs.map(_.partial).sorted == Seq(false, true))
      assert(execs.find(_.partial).get.metrics("numHeapFlushes").value > 0)
      assert(execs.find(!_.partial).get.metrics("numOutputRows").value == 37 * 3)
      val w = Window.partitionBy(col("key")).orderBy(col("score").desc, col("tie").asc)
      val want = df.withColumn("rk", row_number().over(w)).filter(col("rk") <= 3).drop("rk")
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
      assert(got == want)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("global top-n (no PARTITION BY) rewrites and plans AllTuples, not a crash") {
    // regression: TopKPerKeyNode(Nil, ...) used to demand
    // ClusteredDistribution(Nil), which Spark rejects at planning
    val o = graft.Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_totalprice"))
    val w = Window.orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val df = o.withColumn("rk", row_number().over(w)).filter(col("rk") <= 7)
    val plan = df.queryExecution.executedPlan.toString
    assert("TopKPerKey \\[".r.findAllIn(plan).size == 2, s"rewrite did not fire:\n$plan")
    assert(plan.contains("Exchange SinglePartition"), plan)
    val got = df.collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSeq.sortBy(_._3)
    val want = o.collect().map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy(t => (-t._2, t._1)).take(7).zipWithIndex
      .map { case ((k2, v), i) => (k2, v, i + 1) }.toSeq
    assert(got == want)
    // the Scala API route works with empty keys too
    val api = TopK.perKey(o, Nil, Seq(col("o_totalprice").desc, col("o_orderkey").asc), 7)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(api == want.map(t => (t._1, t._2)).toSet)
  }

  test("pathological rank bounds do not rewrite or overflow") {
    val o = graft.Tables.orders(spark, sf)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    // rn < Int.MinValue must NOT wrap to top-Int.MaxValue: always-false
    // filter, zero rows, no TopK in the plan
    val df = o.withColumn("rk", row_number().over(w)).filter(col("rk") < Int.MinValue)
    assert(!df.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    assert(df.count() == 0)
    // rn <= 0 likewise stays an ordinary (empty) filter
    val z = o.withColumn("rk", row_number().over(w)).filter(col("rk") <= 0)
    assert(!z.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    assert(z.count() == 0)
  }

  test("SQL-text top-n (q76) plans through the bounded-heap operator") {
    val df = TopK.q76(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert("TopKPerKey \\[".r.findAllIn(plan).size == 2,
      s"SQL text did not reach the operator:\n$plan")
    // same rows as the Scala-API q72 (both gate on the same oracle)
    val sql = df.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val api = TopK.q72(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(sql == api)
  }

  test("final-stage sort-spill fallback is exact (q72 shape, forced threshold)") {
    import org.apache.spark.sql.functions.col
    // force the final stage past its key budget immediately: every
    // final task with > 2 distinct keys must degrade to the external
    // sort, and the output must still equal the window formulation of
    // q72's semantics
    val o = graft.Tables.orders(spark, sf)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevPart = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // one final task so it owns all 5 priority keys > the threshold of 2
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    try {
      val topk = TopK.perKey(o, Seq("o_orderpriority"),
        Seq(col("o_totalprice").desc, col("o_orderkey").asc), 3, finalSpillKeys = 2)
      val got = topk.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      val execs = topk.queryExecution.executedPlan.collect { case t: TopKPerKeyExec => t }
      assert(execs.find(!_.partial).get.metrics("numSpillFallbacks").value > 0,
        "fallback did not engage")
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      val want = o.withColumn("rk", row_number().over(w)).filter(col("rk") <= 3).drop("rk")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == want)
      assert(got.size == 15) // 5 priorities x 3
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.shuffle.partitions", prevPart)
    }
  }

  test("float keys canonicalize: -0.0/0.0 and NaN payload variants are ONE group, both paths") {
    import spark.implicits._
    // Spark's window PARTITION BY normalizes float keys (-0.0 == 0.0,
    // all NaNs equal); TopKStrategy must give the direct API the same
    // semantics on the hash-map path AND the sort-spill path — without
    // normalization the byte-distinct variants split into separate
    // groups (hash path) or reset the spill path's group counter
    val nan1 = java.lang.Double.longBitsToDouble(0x7ff8000000000000L)
    val nan2 = java.lang.Double.longBitsToDouble(0x7ff8000000000001L)
    val df = Seq((0.0, 1L), (-0.0, 2L), (0.0, 3L), (-0.0, 4L),
      (nan1, 5L), (nan2, 6L), (1.5, 7L)).toDF("k", "v")
    def values(rows: Array[org.apache.spark.sql.Row]): Set[Long] =
      rows.map(_.getLong(1)).toSet
    val hm = TopK.perKey(df, Seq("k"), Seq(col("v").asc), 2)
    assert(values(hm.collect()) == Set(1L, 2L, 5L, 6L, 7L),
      "hash-map path: expected 3 ordering-distinct key groups")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevPart = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    try {
      val sp = TopK.perKey(df, Seq("k"), Seq(col("v").asc), 2, finalSpillKeys = 1)
      val execs = sp.queryExecution.executedPlan.collect { case t: TopKPerKeyExec => t }
      val got = values(sp.collect())
      assert(execs.find(!_.partial).get.metrics("numSpillFallbacks").value > 0,
        "fallback did not engage")
      assert(got == Set(1L, 2L, 5L, 6L, 7L),
        "spill path must group ordering-equal float keys like the hash path")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.shuffle.partitions", prevPart)
    }
  }

  test("map-typed keys plan and group correctly (normalizeFloats passes float-free maps)") {
    // regression: normalizeFloats delegated to NormalizeFloatingNumbers,
    // whose needNormalize throws IllegalStateException for MapType; a
    // float-free map key must instead pass through untouched and take
    // the hash-map grouping path TopKPerKeyExec promises for
    // non-orderable types
    val o = graft.Tables.orders(spark, sf)
      .select(map(col("o_orderpriority"), lit(1)).as("kmap"),
        col("o_orderkey"), col("o_totalprice"))
    val topk = TopK.perKey(o, Seq("kmap"),
      Seq(col("o_totalprice").desc, col("o_orderkey").asc), 3)
      .select(element_at(map_keys(col("kmap")), 1).as("prio"),
        col("o_orderkey"), col("o_totalprice"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val base = graft.Tables.orders(spark, sf)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val want = base.withColumn("rk", row_number().over(w)).filter(col("rk") <= 3).drop("rk")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(topk == want)
  }

  test("struct keys containing a map still normalize their float siblings") {
    import spark.implicits._
    // struct(map<string,int>, double): the map field passes through,
    // but the double sibling MUST still canonicalize — before the
    // subtree-wise rebuild, any map anywhere in the key type skipped
    // normalization entirely and 0.0 / -0.0 split into two byte-
    // distinct groups on TopKPerKeyExec's HashMap[UnsafeRow] path
    val df = Seq((0.0, 1L), (-0.0, 2L), (0.0, 3L), (1.5, 4L))
      .toDF("kf", "v")
      .select(struct(map(lit("m"), lit(1)).as("m"), col("kf").as("f")).as("k"), col("v"))
    val got = TopK.perKey(df, Seq("k"), Seq(col("v").asc), 2)
      .collect().map(_.getLong(1)).toSet
    assert(got == Set(1L, 2L, 4L),
      "0.0 and -0.0 inside a struct-with-map key must be one group")
  }

  test("map keys carrying floats are rejected loudly at planning") {
    import spark.implicits._
    // a map<string,double> key cannot be canonicalized byte-wise; the
    // old behavior silently split ordering-equal keys — it must throw
    val df = Seq((0.0, 1L)).toDF("kf", "v")
      .select(map(lit("m"), col("kf")).as("k"), col("v"))
    val e = intercept[Exception] {
      TopK.perKey(df, Seq("k"), Seq(col("v").asc), 2).collect()
    }
    def causes(t: Throwable): List[Throwable] =
      if (t == null) Nil else t :: causes(t.getCause)
    assert(causes(e).exists(_.isInstanceOf[UnsupportedOperationException]),
      s"expected UnsupportedOperationException in cause chain, got $e")
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
