package graft.plans

import org.apache.spark.SparkEnv
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode, UnsafeExternalRowSorter}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.graft.PlanOps
import org.apache.spark.sql.types.{StructField, StructType}
import org.apache.spark.util.collection.unsafe.sort.PrefixComparators

/** Top-k-per-key as a WHOLE custom operator — logical node + planner
  * strategy + partial/final physical operators, the (c) rung of the
  * custom-operator ladder (after composition and custom Expressions,
  * before mapPartitions): the reference has no such operator, and
  * Spark's built-in formulation (`row_number() OVER (PARTITION BY …
  * ORDER BY …)` then `rk <= k`) SORTS every key's entire group under a
  * window exchange.
  *
  * This operator never sorts: each task keeps a bounded k-element heap
  * per key, the partial stage reduces every input partition to ≤ k rows
  * per key BEFORE the shuffle (the map-side-combine shape of a partial
  * aggregate — shuffle volume is min(input, keys × k), not input), and
  * the final stage merges heaps after an EnsureRequirements-inserted
  * exchange on the keys. Cost O(n log k) vs the window's O(n log n),
  * with O(keysPerPartition × k) memory — bounded: past `finalSpillKeys`
  * distinct keys the final stage degrades to a disk-spilling external
  * sort (see doExecute), mirroring ObjectHashAggregate's fallback.
  *
  * "Top" = the first k rows of each key under `order` — pass a total
  * order (include a tiebreaker) for deterministic results.
  */
case class TopKPerKeyNode(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan,
    partialFlushKeys: Int = TopK.DefaultPartialFlushKeys,
    finalSpillKeys: Int = TopK.DefaultFinalSpillKeys) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan,
    partialFlushKeys: Int = TopK.DefaultPartialFlushKeys,
    finalSpillKeys: Int = TopK.DefaultFinalSpillKeys) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  // Empty keys = GLOBAL top-k: ClusteredDistribution(Nil) is rejected by
  // Spark, and the right contract is AllTuples — the partial stage has
  // already reduced every partition to k rows, so the single-partition
  // final merge sees at most partitions x k rows, not the input.
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else if (keys.isEmpty) Seq(AllTuples)
    else Seq(ClusteredDistribution(keys))
  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numHeapFlushes" -> SQLMetrics.createMetric(sparkContext, "partial heap-map flushes"),
    "numSpillFallbacks" -> SQLMetrics.createMetric(sparkContext, "final-stage sort-spill fallbacks"))

  override protected def doExecute(): RDD[InternalRow] = {
    val (keyExprs, ord, kk, childOutput) = (keys, order, k, child.output)
    val (isPartial, flushKeys, spillKeys) = (partial, partialFlushKeys, finalSpillKeys)
    val outputRows = longMetric("numOutputRows")
    val heapFlushes = longMetric("numHeapFlushes")
    val spillFallbacks = longMetric("numSpillFallbacks")
    child.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val cmp = GenerateOrdering.generate(ord, childOutput)
      // per key, a max-heap of the current k best: the head is the
      // WORST kept row, evicted when a better one arrives
      val worstFirst = new java.util.Comparator[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int = cmp.compare(b, a)
      }
      import scala.jdk.CollectionConverters._
      var heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      // Memory bound: the PARTIAL stage may see unboundedly many keys
      // per partition, so past `flushKeys` distinct keys the whole map
      // is emitted and reset — correct because partial output per key
      // only needs to CONTAIN its partition's top-k; the final stage
      // re-reduces however many partial heaps a key produced.
      def drain(): Iterator[InternalRow] = {
        val out = heaps
        heaps = new java.util.HashMap()
        out.values.asScala.iterator.flatMap(_.iterator().asScala)
          .map { r => outputRows += 1; r }
      }
      def insert(row: InternalRow, key: UnsafeRow): Unit = {
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](kk + 1, worstFirst)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kk) heap.add(row.copy())
        else if (cmp.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      // The FINAL stage's residency is its keys × k rows (the
      // operator's output) — fine until one task owns millions of
      // keys. Past `spillKeys` distinct keys it degrades to a
      // disk-spilling external sort on (keys, order): draining the
      // live heaps into the sorter is sufficient because each heap
      // holds its key's best k of the prefix, so every discarded row
      // is dominated by k rows that ARE in the sorter; the sorted run
      // then yields each key's rows best-first and the first k per
      // key byte-distinct group are exactly the top-k. Byte-distinct ==
      // ordering-distinct here because TopKStrategy normalized the key
      // expressions (no -0.0/NaN-payload splits). This mirrors
      // ObjectHashAggregate's sort-based fallback. Requires orderable
      // key types (always true for anything a window PARTITION BY
      // accepts); non-orderable keys keep the hash map.
      def spillPath(cur: InternalRow, rest: Iterator[InternalRow]): Iterator[InternalRow] = {
        val spillOrder = keyExprs.map(SortOrder(_, Ascending)) ++ ord
        val fullCmp = GenerateOrdering.generate(spillOrder, childOutput)
        val schema = StructType(childOutput.map(a =>
          StructField(a.name, a.dataType, a.nullable, a.metadata)))
        // constant prefix: every comparison falls through to the full
        // record comparator — no radix/prefix acceleration, which is
        // fine for a rare fallback path
        val prefixComputer = new UnsafeExternalRowSorter.PrefixComputer {
          private val result = new UnsafeExternalRowSorter.PrefixComputer.Prefix
          override def computePrefix(row: InternalRow): UnsafeExternalRowSorter.PrefixComputer.Prefix = {
            result.isNull = false; result.value = 0L; result
          }
        }
        val sorter = UnsafeExternalRowSorter.create(
          schema, fullCmp, PrefixComparators.LONG, prefixComputer,
          SparkEnv.get.memoryManager.pageSizeBytes, false)
        val fed = heaps.values.asScala.iterator.flatMap(_.iterator().asScala) ++
          Iterator(cur) ++ rest
        val sorted = sorter.sort(fed.asInstanceOf[Iterator[UnsafeRow]])
        heaps = new java.util.HashMap() // rows now owned by the sorter
        var curKey: UnsafeRow = null
        var n = 0
        sorted.filter { r =>
          val key = keyProj(r)
          if (curKey == null || key != curKey) { curKey = key.copy(); n = 0 }
          n += 1
          if (n <= kk) { outputRows += 1; true } else false
        }
      }
      if (isPartial) {
        val fed: Iterator[InternalRow] = it.flatMap { row =>
          val key = keyProj(row)
          val flushed: Iterator[InternalRow] =
            if (heaps.get(key) == null && heaps.size >= flushKeys) {
              heapFlushes += 1
              drain()
            } else Iterator.empty
          insert(row, key)
          flushed
        }
        fed ++ drain()
      } else {
        val spillable = keyExprs.forall(e => RowOrdering.isOrderable(e.dataType))
        var spilled: Iterator[InternalRow] = null
        while (it.hasNext && spilled == null) {
          val row = it.next()
          val key = keyProj(row)
          if (spillable && heaps.get(key) == null && heaps.size >= spillKeys) {
            spillFallbacks += 1
            spilled = spillPath(row, it)
          } else insert(row, key)
        }
        if (spilled == null) drain() else spilled
      }
    }
  }
}

/** Plans the logical node as final(exchange(partial(child))) — the
  * exchange comes from EnsureRequirements satisfying the final stage's
  * ClusteredDistribution, exactly how partial/final aggregates plan.
  */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, child, flushKeys, spillKeys) =>
      // Canonicalize float/double keys HERE, at the single point both
      // entry routes (TopK.perKey and the RankFilterToTopK rewrite)
      // funnel through: the exchange then hashes canonical bytes and
      // the hash-map/spill paths byte-compare canonical bytes, so
      // ordering-equal keys (0.0 vs -0.0, NaN payload variants) land in
      // one partition and one group — the same semantics Spark's own
      // NormalizeFloatingNumbers rule gives window PARTITION BY keys.
      val nkeys = keys.map(PlanOps.normalizeFloats)
      TopKPerKeyExec(nkeys, order, k, partial = false,
        TopKPerKeyExec(nkeys, order, k, partial = true, planLater(child), flushKeys),
        flushKeys, spillKeys) :: Nil
    case _ => Nil
  }
}

object TopK {

  /** Distinct keys a PARTIAL task holds before flush-and-reset. */
  val DefaultPartialFlushKeys: Int = 1 << 16

  /** Distinct keys a FINAL task holds before degrading to the
    * disk-spilling external-sort path.
    */
  val DefaultFinalSpillKeys: Int = 1 << 16

  /** q72 — the custom operator as a registered, oracle-checked query:
    * top-3 orders by price per priority class, bit-exact against
    * DuckDB's row_number formulation of the same semantics.
    */
  def q72(s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    perKey(
      graft.Tables.orders(s, d)
        .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice")),
      Seq("o_orderpriority"),
      Seq(col("o_totalprice").desc, col("o_orderkey").asc), 3)
      .orderBy(col("o_orderpriority"), col("o_totalprice").desc, col("o_orderkey"))
  }

  val q72Sql: String =
    """SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
      |  SELECT o_orderpriority, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_orderpriority
      |      ORDER BY o_totalprice DESC, o_orderkey) AS rk
      |  FROM orders) t
      |WHERE rk <= 3
      |ORDER BY o_orderpriority, o_totalprice DESC, o_orderkey""".stripMargin

  /** q76 — the same top-k semantics entered as SQL TEXT: proof the
    * parser route reaches the bounded-heap operator with no DataFrame
    * API involved. Predicate pushdown lands the rank filter directly on
    * the Window, RankFilterToTopK (session-injected via
    * GraftExtensions) rewrites it, and column pruning then removes the
    * Window itself because rk is unused downstream — the executed plan
    * is partial TopK → exchange → final TopK, nothing else
    * (plan-asserted in TopKSpec). Oracle: identical statement.
    */
  def q76(s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    graft.Tables.orders(s, d).createOrReplaceTempView("orders_v")
    s.sql(q72Sql.replace("FROM orders", "FROM orders_v"))
  }

  /** Top-k rows per key under `orderBy` (first-k in that order). */
  def perKey(
      df: DataFrame,
      keyCols: Seq[String],
      orderBy: Seq[Column],
      k: Int,
      partialFlushKeys: Int = DefaultPartialFlushKeys,
      finalSpillKeys: Int = DefaultFinalSpillKeys): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy)) {
      spark.experimental.extraStrategies = spark.experimental.extraStrategies :+ TopKStrategy
    }
    val keys = keyCols.map(c => PlanOps.expression(df.col(c)))
    val order = orderBy.map(c => PlanOps.expression(c) match {
      case so: SortOrder => so
      case e => SortOrder(e, Ascending)
    })
    PlanOps.ofRows(spark,
      TopKPerKeyNode(keys, order, k, PlanOps.analyzed(df), partialFlushKeys, finalSpillKeys))
  }
}
