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

  /** Eager localCheckpoint that also RESETS the plan-size statistics at
    * the barrier.
    *
    * `Dataset.localCheckpoint` truncates the lineage to a LogicalRDD,
    * but (since Spark 3.4, `LogicalRDD.fromDataset`) the new leaf
    * carries `originStats` — the ESTIMATED statistics of the plan it
    * replaced. Inside a fixpoint loop that is a time bomb: every join
    * MULTIPLIES sizeInBytes estimates, so each iteration's estimate
    * compounds on the last one's, and a pointer-jumping loop (which
    * squares the mapping per jump) doubles the estimate's digit count
    * per squaring. After ~18 squarings the sizeInBytes BigInt has
    * millions of digits and the driver spends tens of minutes inside
    * BigInteger.multiply in join-strategy stats checks (observed: q112
    * connected components, >20 min planning a sub-second job at
    * sf0.001). Dropping originStats makes the leaf report the
    * (finite, constant) session default size, so estimates stay
    * bounded by the join depth BETWEEN barriers, not the loop's
    * history. The checkpointed data, partitioning, and ordering are
    * kept — only the inherited estimate is discarded.
    */
  def checkpointBarrier(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[classic.SparkSession]
    val ck = df.localCheckpoint(true)
    ck.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        classic.Dataset.ofRows(spark, lr.copy()(spark, None, None))
      case _ => ck
    }
  }

  def expression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  def analyzed(df: DataFrame): LogicalPlan =
    df.queryExecution.analyzed

  /** Actual partition count of the frame's execution RDD (metadata
    * only — no job). For a checkpointed frame this is the true physical
    * partition count the `__pid` column was stamped against.
    */
  def numPartitions(df: DataFrame): Int =
    df.queryExecution.toRdd.getNumPartitions

  /** Canonicalize float/double (-0.0 → 0.0, NaN payloads → one NaN)
    * inside `e`, recursively through structs and arrays; identity for
    * types that need no normalization. The same canonicalization Spark
    * applies to groupBy/join/window keys — custom operators that hash
    * or byte-compare grouping keys need it too (TopKPerKeyExec's
    * HashMap[UnsafeRow, _] equality IS a byte comparison), or
    * ordering-equal keys (0.0 vs -0.0, NaN payloads) silently split
    * into separate groups.
    *
    * Maps: NormalizeFloatingNumbers.normalize throws for any type
    * containing a MapType, so map-bearing keys are handled here —
    * float-free map subtrees pass through unchanged (their binary
    * encoding is already canonical per value), the non-map siblings
    * still get normalized (rebuilt field/element-wise, the same shape
    * Spark's own struct/array normalization uses), and a map whose
    * key/value types carry floats is REJECTED loudly at planning: its
    * float payloads cannot be canonicalized without rebuilding the map
    * (entry order is also unspecified), and letting it through would
    * silently split ordering-equal keys.
    */
  def normalizeFloats(e: Expression): Expression = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types._
    def hasMap(dt: DataType): Boolean = dt.existsRecursively(_.isInstanceOf[MapType])
    def hasFloat(dt: DataType): Boolean =
      dt.existsRecursively(t => t == FloatType || t == DoubleType)
    if (!hasMap(e.dataType)) {
      org.apache.spark.sql.catalyst.optimizer.NormalizeFloatingNumbers.normalize(e)
    } else if (!hasFloat(e.dataType)) {
      e
    } else e.dataType match {
      case m: MapType =>
        throw new UnsupportedOperationException(
          s"grouping key of type ${m.sql} carries floating-point values inside a map; " +
            "byte-compared grouping cannot canonicalize -0.0/NaN map entries — " +
            "restructure the key (e.g. map_entries + array_sort) before grouping")
      case st: StructType =>
        val fields = st.fields.zipWithIndex.flatMap { case (f, i) =>
          Seq(Literal(f.name): Expression,
            normalizeFloats(GetStructField(e, i, Some(f.name))))
        }
        val struct = CreateNamedStruct(fields.toSeq)
        If(IsNull(e), Literal(null, struct.dataType), struct)
      case ArrayType(et, containsNull) =>
        val lv = NamedLambdaVariable("arg", et, containsNull)
        ArrayTransform(e, LambdaFunction(normalizeFloats(lv), Seq(lv)))
      case _ => e
    }
  }
}
