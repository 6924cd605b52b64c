package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Bridge into the `private[sql]` surface that custom logical plans
  * need: building a DataFrame from a plan (so it flows through the full
  * analyzer/optimizer/planner pipeline) and extracting the Catalyst
  * expression behind a public Column (Spark 4 splits the Column API
  * from its classic expression backing). This is the standard extension
  * seam — the same access path SparkSessionExtensions-based plugins
  * compile against — isolated here so the rest of graft stays in the
  * public API.
  */
object PlanOps {

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def expression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  def analyzed(df: DataFrame): LogicalPlan =
    df.queryExecution.analyzed

  /** Canonicalize float/double (-0.0 → 0.0, NaN payloads → one NaN)
    * inside `e`, recursively through structs and arrays; identity for
    * types that need no normalization. The same canonicalization Spark
    * applies to groupBy/join/window keys — custom operators that hash
    * or byte-compare grouping keys need it too, or ordering-equal keys
    * split across partitions/groups. Map-typed expressions are returned
    * unchanged: NormalizeFloatingNumbers.needNormalize throws for
    * MapType (maps are not orderable), and map keys take the
    * hash-map grouping path downstream, which never byte-compares.
    */
  def normalizeFloats(e: Expression): Expression = {
    val hasMap = e.dataType.existsRecursively(
      _.isInstanceOf[org.apache.spark.sql.types.MapType])
    if (hasMap) e
    else org.apache.spark.sql.catalyst.optimizer.NormalizeFloatingNumbers.normalize(e)
  }
}
