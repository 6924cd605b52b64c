package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Manual probe (Test/runMain graft.queries.BpeExprBlowupProbe), not a
  * test: measures how the expression-fold BPE apply scales with merge
  * count — the evidence behind ExprFoldMaxMerges and the data-driven
  * dispatch. Prints plan-construction + execution wall time per merge
  * count for both paths; numbers recorded in BASELINE.md round 16.
  */
object BpeExprBlowupProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val wc = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(explode(graft.functions.TextFns.tokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val words = wc.select(col("w")).localCheckpoint()
    // chained merges that actually fire (frequent-word char chains)
    val frequent = wc.orderBy(col("cnt").desc, col("w"))
      .limit(800).collect().map(_.getString(0)).toSeq
    val seen = scala.collection.mutable.LinkedHashSet[(String, String)]()
    frequent.foreach { w =>
      var acc = w.take(1)
      w.drop(1).foreach { c => seen += ((acc, c.toString)); acc += c }
      seen += ((w, "</w>"))
    }
    val filler = for (a <- 'a' to 'z'; b <- 'a' to 'z')
      yield (s"$a$b", s"$b$a")
    filler.foreach(seen += _)
    // deep filler family for table-only probes past ~800 ranks
    val filler3 = for (a <- 'a' to 'z'; b <- 'a' to 'z'; c <- 'a' to 'z')
      yield (s"$a$b$c", s"$c$b$a")
    filler3.foreach(seen += _)
    val all = seen.toSeq
    val tableOnly = args.contains("--table-only")
    for (n <- args.filterNot(_.startsWith("--")).headOption
        .map(_.split(",").map(_.toInt).toSeq)
        .getOrElse(Seq(8, 16, 32, 48, 64, 96))) {
      val merges = all.take(n)
      val exprPart = if (tableOnly) "expr: skipped" else {
        val t0 = System.nanoTime()
        val df = TextAnalysis.bpeApplyExpr(words, merges)
        val plan = df.queryExecution.executedPlan.toString
        val t1 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t2 = System.nanoTime()
        f"expr: plan ${(t1 - t0) / 1e9}%7.2f s exec ${(t2 - t1) / 1e9}%7.2f s " +
          f"(plan ${plan.length}%8d chars)"
      }
      val dfT = TextAnalysis.bpeApplyTable(words, merges)
      val t3 = System.nanoTime()
      dfT.write.format("noop").mode("overwrite").save()
      val t4 = System.nanoTime()
      println(f"merges=$n%5d  $exprPart   table: exec ${(t4 - t3) / 1e9}%6.2f s")
    }
    spark.stop()
  }
}
