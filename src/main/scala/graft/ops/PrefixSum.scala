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
    * wrong results — so their absence is asserted, not assumed.
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
}
