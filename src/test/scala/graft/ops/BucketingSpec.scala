package graft.ops

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import graft.SparkSpec

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("join of co-bucketed tables runs without a shuffle exchange") {
    // a previous JVM's managed-table files survive in spark-warehouse/
    // while the in-memory catalog starts empty -> clear both
    Seq("bkt_left", "bkt_right").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val dir = new java.io.File(s"spark-warehouse/$t")
      if (dir.exists()) {
        dir.listFiles().foreach(_.delete())
        dir.delete()
      }
    }
    val left = (1L to 1000L).map(i => (i % 100, i)).toDF("k", "v")
    val right = (1L to 500L).map(i => (i % 100, s"r$i")).toDF("k", "w")
    Bucketing.writeBucketed(left, "bkt_left", "k", 8)
    Bucketing.writeBucketed(right, "bkt_right", "k", 8)

    val joined = spark.sql(
      """SELECT /*+ MERGE(bkt_right) */ l.k, l.v, r.w
        |FROM bkt_left l JOIN bkt_right r ON l.k = r.k""".stripMargin)
    assert(joined.count() == 5000) // 1000 x 500 / 100 keys

    val plan = joined.queryExecution.executedPlan
    val finalPlan = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val shuffles = finalPlan.collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.isEmpty, s"expected exchange-free bucketed join, got:\n$finalPlan")
  }
}
