package graft

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only A/B harness (r18, VERDICT item #6): the registered q234
  * union-of-six-subtrees form vs the r16 single-scan multi-countDistinct
  * form (one Expand x4/x2 pass per table). Measures, per variant over
  * warm reps: wall, executor CPU, shuffle write bytes and INPUT BYTES
  * READ — the 100 TB question is whether 4 column-pruned lineitem scans
  * cost more I/O than one full-width scan replicated 8x through Expand.
  * Usage: runMain graft.AbQ234 [sfDir] [reps]
  */
object AbQ234 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val cpuNs = new ConcurrentHashMap[String, AtomicLong]()
    val shW = new ConcurrentHashMap[String, AtomicLong]()
    val inB = new ConcurrentHashMap[String, AtomicLong]()
    val jobGroup = new ConcurrentHashMap[Int, String]()
    def acc(m: ConcurrentHashMap[String, AtomicLong], g: String, v: Long): Unit =
      m.computeIfAbsent(g, _ => new AtomicLong()).addAndGet(v)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val g = Option(js.properties.getProperty("spark.jobGroup.id")).getOrElse("?")
        js.stageIds.foreach(sid => jobGroup.put(sid, g))
      }
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val g = jobGroup.getOrDefault(sc.stageInfo.stageId, "?")
        val m = sc.stageInfo.taskMetrics
        if (m != null) {
          acc(cpuNs, g, m.executorCpuTime)
          acc(shW, g, m.shuffleWriteMetrics.bytesWritten)
          acc(inB, g, m.inputMetrics.bytesRead)
        }
      }
    })

    def lineitemDf = Tables.lineitem(spark, sfDir)
    def ordersDf = Tables.orders(spark, sfDir)

    // variant B: the r16 single-scan form — one multi-countDistinct
    // aggregate per table (Spark plans it as Expand x4 over lineitem,
    // x2 over orders)
    def expandForm: DataFrame = {
      val li = lineitemDf.agg(
        countDistinct(col("l_orderkey")).as("l1"),
        countDistinct(col("l_orderkey"), col("l_returnflag")).as("r1"),
        countDistinct(col("l_partkey")).as("l2"),
        countDistinct(col("l_partkey"), col("l_suppkey")).as("r2"),
        countDistinct(col("l_suppkey")).as("l3"),
        countDistinct(col("l_suppkey"), col("l_linestatus")).as("r3"),
        countDistinct(col("l_orderkey"), col("l_linenumber")).as("l4"),
        countDistinct(col("l_orderkey"), col("l_linenumber"), col("l_partkey")).as("r4"))
      val ord = ordersDf.agg(
        countDistinct(col("o_orderkey")).as("l5"),
        countDistinct(col("o_orderkey"), col("o_custkey")).as("r5"),
        countDistinct(col("o_custkey")).as("l6"),
        countDistinct(col("o_custkey"), col("o_orderpriority")).as("r6"))
      li.crossJoin(ord)
        .select(expr(
          """stack(6,
            |  'lineitem: l_orderkey -> l_returnflag', l1, r1,
            |  'lineitem: l_partkey -> l_suppkey', l2, r2,
            |  'lineitem: l_suppkey -> l_linestatus', l3, r3,
            |  'lineitem: l_orderkey,l_linenumber -> l_partkey', l4, r4,
            |  'orders: o_orderkey -> o_custkey', l5, r5,
            |  'orders: o_custkey -> o_orderpriority', l6, r6
            |) AS (fd, n_lhs, n_pairs)""".stripMargin))
        .select(col("fd"), col("n_lhs"), col("n_pairs"),
          (col("n_pairs") - col("n_lhs")).as("n_violations"),
          when(col("n_pairs") === col("n_lhs"), 1L).otherwise(0L).as("holds_fd"),
          expr("n_lhs * 1048576 DIV n_pairs").as("determinacy_fp"))
        .orderBy(col("fd"))
    }

    spark.read.parquet(s"$sfDir/nation.parquet").count()
    val variants: Seq[(String, () => DataFrame)] = Seq(
      "union6" -> (() => SparkEntry.queries("q234_fd_discovery")(spark, sfDir)),
      "expand" -> (() => expandForm))
    // warm both once (JIT/codegen), then measure
    variants.foreach { case (_, f) =>
      f().write.format("noop").mode("overwrite").save() }
    variants.foreach { case (name, f) =>
      (1 to reps).foreach { i =>
        val g = s"$name-$i"
        spark.sparkContext.setJobGroup(g, g)
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.clearJobGroup()
        Thread.sleep(300) // listener flush
        def g3(m: ConcurrentHashMap[String, AtomicLong]) =
          Option(m.get(g)).map(_.get).getOrElse(0L)
        println(f"[ab] $name rep$i wall=$wall%.2f s cpu=${g3(cpuNs) / 1e9}%.2f s " +
          f"shuffleW=${g3(shW) / 1048576.0}%.1f MB inputRead=${g3(inB) / 1048576.0}%.1f MB")
      }
    }
    spark.stop()
  }
}
