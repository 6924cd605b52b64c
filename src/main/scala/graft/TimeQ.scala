package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timer for perf iteration: warm run + timed run
  * per named query, same session shape as Bench. Not part of the
  * driver contract.
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { n =>
      SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
      val t0 = System.nanoTime
      SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"TIMEQ $n ${(System.nanoTime - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
