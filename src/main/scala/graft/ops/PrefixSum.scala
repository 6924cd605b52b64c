package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed running sum — the generic form of the cluster-carry
  * pattern `Sampling.tokenBudgetOver` / `Sampling.rankDistributed`
  * inline for their specific aggregates: a running SUM within `part`
  * in `order` WITHOUT a per-partition-value sort window (one giant
  * part value would serialize onto a single task at 100 TB).
  *
  * Range-partition on (part, order), sum locally per physical
  * partition, and add back a broadcast carry of preceding-partition
  * totals. The carry frame is one row per (physical partition, part)
  * — cluster-sized, not data-sized.
  */
object PrefixSum {

  /** Appends `cum`: the inclusive running sum of `value` over `order`
    * within `part`. `order` must be a total order within each part for
    * the result to be deterministic.
    */
  /** Working/output column names this helper claims on the input frame.
    * withColumn silently REPLACES an existing column of the same name —
    * an input already carrying e.g. `cum` or `__v` would get silently
    * wrong results — so their absence is asserted, not assumed. NOTE:
    * `rk` is deliberately NOT reserved here (only [[rankAndSum]] emits
    * it): ranked frames legitimately flow back through prefixSum
    * (q265's shape).
    */
  private val Reserved = Seq("cum", "__pid", "__v", "__lcum", "__carry")

  /** Builds the range-partitioned, pid-stamped, checkpointed working
    * frame both the carry and the main branch read, with the (true)
    * `RangePartitioning(__pid ASC)` of the checkpointed RDD re-asserted
    * via [[graft.plans.AssumePidRangePartitionedNode]] — localCheckpoint
    * erases partitioning metadata (`UnknownPartitioning`), which used to
    * cost a second FULL-data exchange to re-cluster by (`__pid`, part)
    * for the window, plus an exchanged partial/final aggregate pair for
    * the carry. With the assertion, the window needs only its
    * per-partition sort and the carry aggregate runs exchange-free.
    */
  private def partedCheckpoint(
      df: DataFrame, partCols: Seq[Column], order: Seq[Column],
      value: Column): DataFrame = {
    val s = df.sparkSession
    // NO explicit partition count: repartitionByRange(cols) shuffles as
    // REPARTITION_BY_COL, which AQE coalesces by advisory size (an
    // explicit N is BY_NUM and pinned). With the downstream exchange
    // gone (the pid-partitioning assertion below), the checkpoint's
    // partition count propagates to EVERY post-checkpoint stage — a
    // pinned 32 meant 32 tasks × per-task constants on kilobyte frames
    // at bench SF (measured on q265: 2.7 → 16.4 executor-CPU-s, the
    // post-checkpoint stages 1 task before, 32 after), while at 100 TB
    // AQE derives the count from the data size. Coalescing merges only
    // ADJACENT range partitions, so the pid-ascending range property
    // the assertion claims still holds. One __pid assignment shared by
    // both branches (see rankDistributed).
    val ck = df.repartitionByRange((partCols ++ order): _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__v", value)
      .localCheckpoint(false)
    val plan = org.apache.spark.sql.graft.PlanOps.analyzed(ck)
    val pid = plan.output.find(_.name == "__pid").getOrElse(
      sys.error("prefixSum: checkpointed frame lost its __pid column"))
    org.apache.spark.sql.graft.PlanOps.ofRows(s,
      graft.plans.AssumePidRangePartitionedNode(
        pid, org.apache.spark.sql.graft.PlanOps.numPartitions(ck), plan))
  }

  /** The carry body shared by [[prefixSum]] and [[prefixSumWithTotals]]
    * over an already-built [[partedCheckpoint]] frame.
    */
  private def carryJoin(
      parted: DataFrame, part: Seq[String], partCols: Seq[Column],
      order: Seq[Column]): DataFrame = {
    // explicit ROWS frame: the default frame for an ordered window is
    // RANGE, under which ORDER ties collapse to one cumulative value —
    // a running sum must advance per ROW (ties then break by physical
    // position, arbitrary-but-deterministic for a fixed layout, the
    // same contract row_number gave the pre-extraction copies)
    val wLocal = Window.partitionBy((col("__pid") +: partCols): _*)
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wCarry = Window.partitionBy(partCols: _*).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = parted.groupBy((col("__pid") +: partCols): _*)
      .agg(sum(col("__v")).as("__pt"))
      .withColumn("__carry", sum(col("__pt")).over(wCarry))
      .select((col("__pid") +: partCols :+ col("__carry")): _*)
    parted
      .withColumn("__lcum", sum(col("__v")).over(wLocal))
      .join(broadcast(carry), "__pid" +: part)
      .withColumn("cum", col("__lcum") + coalesce(col("__carry"), lit(0L)))
      .drop("__pid", "__v", "__lcum", "__carry")
  }

  def prefixSum(
      df: DataFrame, part: Seq[String], order: Seq[Column],
      value: Column): DataFrame = {
    val clash = Reserved.filter(df.columns.contains)
    require(clash.isEmpty,
      s"prefixSum reserves column names ${Reserved.mkString(", ")}; " +
        s"input frame already has ${clash.mkString(", ")} — rename before calling")
    val partCols = part.map(col)
    carryJoin(partedCheckpoint(df, partCols, order, value), part, partCols, order)
  }

  /** [[prefixSum]] plus the per-part TOTAL of `value`, both computed
    * from the SAME checkpointed frame: (main, totals) where totals has
    * columns `part :+ totalName` (one row per part value; one row total
    * when `part` is empty). Consumers that need per-part cardinalities
    * next to ranks (the q103/q170/q188 shape) previously re-aggregated
    * either the full ranked output (re-running the window + carry join)
    * or the pre-rank subtree (re-running e.g. tokenization); this
    * derives the same numbers with one window-free, join-free aggregate
    * over the already-materialized checkpoint. For a rank
    * (`value = 1`), the total IS the per-part row count.
    */
  def prefixSumWithTotals(
      df: DataFrame, part: Seq[String], order: Seq[Column],
      value: Column, totalName: String): (DataFrame, DataFrame) = {
    val clash = Reserved.filter(df.columns.contains)
    require(clash.isEmpty,
      s"prefixSumWithTotals reserves column names ${Reserved.mkString(", ")}; " +
        s"input frame already has ${clash.mkString(", ")} — rename before calling")
    val partCols = part.map(col)
    val parted = partedCheckpoint(df, partCols, order, value)
    val totals = parted.groupBy(partCols: _*)
      .agg(sum(col("__v")).as(totalName))
    (carryJoin(parted, part, partCols, order), totals)
  }

  /** Names [[rankAndSum]] claims on top of the prefixSum set. */
  private val ReservedRank =
    Seq("cum", "rk", "__pid", "__v", "__lcum", "__carry", "__pt",
      "__lrk", "__crk", "__ptn")

  /** Appends BOTH `rk` (1-based row number) and `cum` (inclusive
    * running sum of `value`) over the SAME `order` within `part`, in
    * ONE range exchange + checkpoint — a rank is the running sum of 1
    * in the same total order, so computing it alongside the value sum
    * is free, where chaining rankDistributed → prefixSum pays the
    * exchange, the checkpoint, and the carry twice (q285 did before
    * r17's fusion).
    */
  def rankAndSum(
      df: DataFrame, part: Seq[String], order: Seq[Column],
      value: Column): DataFrame = {
    val clash = ReservedRank.filter(df.columns.contains)
    require(clash.isEmpty,
      s"rankAndSum reserves column names ${ReservedRank.mkString(", ")}; " +
        s"input frame already has ${clash.mkString(", ")} — rename before calling")
    val partCols = part.map(col)
    val parted = partedCheckpoint(df, partCols, order, value)
    // same ROWS-frame rationale as prefixSum above
    val wLocal = Window.partitionBy((col("__pid") +: partCols): _*)
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wCarry = Window.partitionBy(partCols: _*).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = parted.groupBy((col("__pid") +: partCols): _*)
      .agg(sum(col("__v")).as("__pt"), count(lit(1)).as("__ptn"))
      .withColumn("__carry", sum(col("__pt")).over(wCarry))
      .withColumn("__crk", sum(col("__ptn")).over(wCarry))
      .select((col("__pid") +: partCols) ++
        Seq(col("__carry"), col("__crk")): _*)
    parted
      .withColumn("__lcum", sum(col("__v")).over(wLocal))
      .withColumn("__lrk",
        sum(lit(1L)).over(wLocal))
      .join(broadcast(carry), "__pid" +: part)
      .withColumn("cum", col("__lcum") + coalesce(col("__carry"), lit(0L)))
      .withColumn("rk", col("__lrk") + coalesce(col("__crk"), lit(0L)))
      .drop("__pid", "__v", "__lcum", "__carry", "__lrk", "__crk")
  }
}
