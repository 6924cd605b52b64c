package graft.queries

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pipeline observability via Spark's Observation API (the
  * CollectMetrics operator): per-stage row/byte accounting captured as
  * a side effect of the SAME action that runs the query — no second
  * pass over the data, which is the only acceptable cost model for
  * counters at 100 TB. The reference's only observability is its log
  * sink (SURVEY.md §2.1 O11); this is the engine-native upgrade.
  */
class ObservabilitySpec extends SparkSpec {

  test("observe() captures admission-gate counters in one pass") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val inObs = Observation("ingest")
    val keptObs = Observation("kept")
    val kept = docs
      .observe(inObs, count(lit(1)).as("rows_in"),
        sum(col("n_chars")).as("chars_in"))
      .filter(col("n_chars") >= 100 && col("lang") === "en")
      .observe(keptObs, count(lit(1)).as("rows_kept"),
        sum(col("n_chars")).as("chars_kept"))
    val n = kept.count() // ONE action drives both observation points
    val in = inObs.get
    val out = keptObs.get
    assert(out("rows_kept") == n)
    assert(in("rows_in").asInstanceOf[Long] > n)
    // the counters must agree with a direct computation
    val expectIn = docs.agg(count(lit(1)), sum(col("n_chars"))).collect().head
    assert(in("rows_in") == expectIn.getLong(0))
    assert(in("chars_in") == expectIn.getLong(1))
    assert(out("chars_kept").asInstanceOf[Long] <= in("chars_in").asInstanceOf[Long])
  }
}
