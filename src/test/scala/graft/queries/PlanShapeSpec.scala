package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import graft.SparkSpec

/** Pins the scan-level optimizations the engine relies on at 100 TB:
  * predicate pushdown into the parquet reader (`PushedFilters`) and
  * column pruning (`ReadSchema`). These come free from declarative
  * plans — this spec exists so a refactor that breaks them (e.g. a UDF
  * wrapping a filter column, a select * materialization) fails loudly
  * instead of silently scanning everything. Assertions read the
  * FileSourceScanExec node itself: the plan's toString truncates long
  * filter lists.
  */
class PlanShapeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Leaf scans with AQE off for the planning only — the adaptive
    * wrapper hides its initial plan from collect, and scan-level
    * pushdown/pruning are decided before AQE anyway.
    */
  private def scans(mk: => DataFrame): Seq[FileSourceScanExec] = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try mk.queryExecution.executedPlan.collectLeaves().collect {
      case f: FileSourceScanExec => f
    }.toSeq
    finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  private def scanOf(name: String): FileSourceScanExec = {
    val s = scans(graft.SparkEntry.queries(name)(spark, sf))
    assert(s.nonEmpty, s"$name has no parquet scan")
    s.head
  }

  test("q02 scan pushes comparison filters and prunes to the used columns") {
    val scan = scanOf("q02_filter_project")
    val pushed = scan.metadata("PushedFilters")
    assert(pushed.contains("GreaterThanOrEqual(l_discount"), pushed)
    assert(pushed.contains("LessThan(l_quantity"), pushed)
    // pruning: only the 6 referenced columns, never the 16-col table
    val cols = scan.requiredSchema.fieldNames.toSet
    assert(cols == Set("l_orderkey", "l_linenumber", "l_shipdate",
      "l_discount", "l_quantity", "l_extendedprice"), s"read columns: $cols")
  }

  test("q06 scan pushes the discount range and quantity bound") {
    val pushed = scanOf("q06_filter_agg").metadata("PushedFilters")
    assert(pushed.contains("GreaterThanOrEqual(l_discount"), pushed)
    assert(pushed.contains("LessThanOrEqual(l_discount"), pushed)
    assert(pushed.contains("LessThan(l_quantity"), pushed)
  }

  test("documents scan prunes the text column when only metadata is needed") {
    val df = graft.Tables.documents(spark, sf).groupBy("lang").count()
    val cols = scans(df).head.requiredSchema.fieldNames.toSet
    assert(cols == Set("lang"), s"lang-only aggregate read: $cols")
  }

  test("q171's top-5 cut plans through the bounded-heap TopK operator") {
    // the docs claim the rank<=k rewrite fires here; pin it so a
    // refactor that reintroduces a corpus-sized rank window fails.
    // AQE off: the adaptive wrapper hides subtrees behind stage leaves
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = graft.SparkEntry.queries("q171_retrieval_eval")(spark, sf)
      val execs = df.queryExecution.executedPlan.collect {
        case t: graft.plans.TopKPerKeyExec => t
      }
      assert(execs.nonEmpty, "expected TopKPerKeyExec in the q171 plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("q259's per-percentile report joins broadcast at EVERY input size") {
    // the r14 cross-SF plan audit caught these 5-row joins flipping to
    // sort-merge at sf0.1 when left to stats — they are bounded by the
    // requested-percentile count, so the plan must pin the broadcast.
    // sf0.1 is the scale where the unpinned plan flipped.
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = graft.SparkEntry.queries("q259_qdigest_quantiles")(
        spark, "/root/testdata/sf0.1")
      val smj = df.queryExecution.executedPlan.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      }
      assert(smj.isEmpty, s"q259 planned ${smj.length} sort-merge join(s)")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }
}
