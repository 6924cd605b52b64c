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

  def prefixSum(
      df: DataFrame, part: Seq[String], order: Seq[Column],
      value: Column): DataFrame = {
    val clash = Reserved.filter(df.columns.contains)
    require(clash.isEmpty,
      s"prefixSum reserves column names ${Reserved.mkString(", ")}; " +
        s"input frame already has ${clash.mkString(", ")} — rename before calling")
    val s = df.sparkSession
    val nParts = s.conf.get("spark.sql.shuffle.partitions").toIntOption
      .getOrElse(s.sparkContext.defaultParallelism)
    val partCols = part.map(col)
    // one __pid assignment shared by both branches (see rankDistributed)
    val parted = df.repartitionByRange(nParts, (partCols ++ order): _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__v", value)
      .localCheckpoint(false)
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
    val s = df.sparkSession
    val nParts = s.conf.get("spark.sql.shuffle.partitions").toIntOption
      .getOrElse(s.sparkContext.defaultParallelism)
    val partCols = part.map(col)
    val parted = df.repartitionByRange(nParts, (partCols ++ order): _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__v", value)
      .localCheckpoint(false)
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
