package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print formatted physical plans for the named queries (or a
  * default set) so pushdown/pruning/broadcast/codegen can be inspected.
  * Usage: runMain graft.Explain [sfDir] [q1,q2,...|--audit]
  *
  * `--audit` instead emits one summary row per registered query —
  * exchange/broadcast/nested-loop/sort/codegen counts — the compact
  * form of the per-round plan audit recorded in BASELINE.md.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val positional = args.filterNot(_.startsWith("--"))
    val sfDir = positional.headOption.getOrElse("/root/testdata/sf0.01")
    val audit = args.contains("--audit")
    // --audit alone audits the whole registry; --audit plus a name list
    // audits the subset (the cross-SF plan-diff workflow)
    val names = positional.lift(1).map(_.split(",").toSeq)
      .getOrElse(if (audit) SparkEntry.queries.keys.toSeq.sorted
      else Seq("q01_pricing_summary", "q02_filter_project", "q03_top_revenue",
        "q05_star_join", "q06_filter_agg", "q26_tumbling_window", "q32_minhash_lsh"))
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (audit) {
      def count(hay: String, needle: String): Int =
        needle.r.findAllIn(hay).size
      println("| query | exchanges | broadcasts | bnlj | cartesian | sorts |")
      println("|---|---|---|---|---|---|")
      names.foreach { n =>
        try {
          val p = SparkEntry.queries(n)(spark, sfDir).queryExecution.executedPlan.toString
          println(s"| $n | ${count(p, "Exchange (hash|range|Single)")} | " +
            s"${count(p, "BroadcastExchange")} | ${count(p, "BroadcastNestedLoopJoin")} | " +
            s"${count(p, "CartesianProduct")} | ${count(p, "\\+- Sort ")} |")
        } catch {
          case e: Throwable => println(s"| $n | plan failed: ${e.getClass.getSimpleName} |")
        }
      }
    } else names.foreach { n =>
      println(s"\n===================== $n =====================")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
