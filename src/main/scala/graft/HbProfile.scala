package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.Graph

/** Dev tool (round-14 verdict item 1): per-phase wall-clock profile of
  * q255 HyperBall, splitting the fixed job-barrier constants (edge
  * checkpoint, init checkpoint, per-round merge barrier) from the
  * per-round shuffle work, to settle the r12-vs-r13 isolated-cost
  * discrepancy (3.8 s claimed vs 10.6 s measured). Usage:
  *   runMain graft.HbProfile [sfDir] [reps]
  * Prints one line per phase per rep plus a min-of-reps summary.
  */
object HbProfile {
  // Driver-side Janino compile-time counter (codahale histogram in
  // CodegenMetrics): the delta across a phase separates "generated-code
  // compile constant" from actual execution — the r12-vs-r13 isolated
  // discrepancy hypothesis is that a 267-query sweep evicts q255's
  // uniquely large 64-column classes from the bounded codegen cache.
  private def compileStat: (Long, Long) = {
    import scala.jdk.CollectionConverters._
    val reg = org.apache.spark.metrics.source.CodegenMetrics.metricRegistry
    reg.getHistograms.asScala.collectFirst {
      case (name, h) if name.contains("compilationTime") =>
        // count is exact; the value sum is reservoir-sampled (fine for
        // a short window where all samples are retained)
        (h.getCount, h.getSnapshot.getValues.sum)
    }.getOrElse((0L, 0L))
  }

  private def timed[A](label: String)(body: => A): (A, Double) = {
    val (n0, ms0) = compileStat
    val t0 = System.nanoTime()
    val a = body
    val s = (System.nanoTime() - t0) / 1e9
    val (n1, ms1) = compileStat
    println(f"[hbprof] $label%-28s $s%7.3f s  (codegen: +${n1 - n0} compiles, ~${ms1 - ms0} ms)")
    (a, s)
  }

  private def drain(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // static conf: the default 100-entry codegen cache thrashes on a
      // 267-query session (q255's 64-column classes re-Janino+re-JIT
      // every run: 3.4 s warm vs 12 s evicted - see BASELINE.md r14)
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/nation.parquet").count()

    val phases = scala.collection.mutable.LinkedHashMap
      .empty[String, List[Double]].withDefaultValue(Nil)
    def rec(label: String, s: Double): Unit = phases(label) = phases(label) :+ s

    for (rep <- 1 to reps) {
      println(s"[hbprof] --- rep $rep ---")
      // phase 1: edge build — distinct + union + repartition, eager ckpt
      val (edges, t1) = timed("edges_ckpt")(Graph.hbEdges(spark, sfDir))
      rec("edges_ckpt", t1)
      // phase 2: init registers — distinct nodes + 64-col fanout, ckpt
      val (r0, t2) = timed("init_ckpt")(Graph.hbInit(edges))
      rec("init_ckpt", t2)
      // phase 3: summary(t=0) alone — 1-row reduction over |V| state
      val (_, t3) = timed("summary0")(drain(Graph.hbSummary(r0, 0)))
      rec("summary0", t3)
      // phase 4: merge round 1 (join+union+64-max groupBy, eager ckpt)
      val (r1, t4) = timed("merge1_ckpt")(Graph.hbMerge(r0, edges, last = false))
      rec("merge1_ckpt", t4)
      val (_, t5) = timed("summary1")(drain(Graph.hbSummary(r1, 1)))
      rec("summary1", t5)
      // phase 5: merge round 2 fused with its summary (as q255 runs it)
      val (_, t6) = timed("merge2+summary2")(
        drain(Graph.hbSummary(Graph.hbMerge(r1, edges, last = true), 2)))
      rec("merge2+summary2", t6)
      // reference: the registered query end-to-end (3 summaries unioned)
      val (_, t7) = timed("q255_full")(drain(SparkEntry.queries(
        "q255_hyperball")(spark, sfDir)))
      rec("q255_full", t7)
    }
    println("[hbprof] === min of reps ===")
    phases.foreach { case (l, ts) =>
      println(f"[hbprof] $l%-28s min=${ts.min}%7.3f s  all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
