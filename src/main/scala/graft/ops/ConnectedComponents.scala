package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by min-label propagation with POINTER JUMPING —
  * the last stage of a dedup pipeline: LSH candidate pairs → duplicate
  * CLUSTERS → keep the min-id representative per cluster.
  *
  * Each iteration does two shuffles: (1) neighbor-min — every node
  * takes the smallest label among itself and its neighbors; (2) pointer
  * jump — every node re-labels to its LABEL'S label. Plain propagation
  * needs O(diameter) rounds (a 10^6-node chain would need 10^6
  * shuffles); the jump makes label paths halve each round, so
  * convergence is O(log diameter) — the same round complexity as the
  * alternating small-star/large-star algorithm, with a simpler
  * invariant: a node's label is always a node id inside its own
  * component and only ever decreases, so the fixpoint is exactly the
  * component minimum. `localCheckpoint` after each step cuts the
  * exponentially growing loop lineage; the per-iteration driver round
  * trip is the convergence check (inherent to any fixpoint loop).
  */
object ConnectedComponents {

  /** @param edges two Long columns `a`, `b` (undirected pairs)
    * @return (id, comp): every vertex mapped to the min id reachable
    */
  def minLabel(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val und = edges.select(col("a"), col("b"))
      .union(edges.select(col("b").as("a"), col("a").as("b")))
      .localCheckpoint(true)
    var labels = und.select(col("a").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint(true)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val neigh = und.join(labels, und("b") === labels("id"))
        .groupBy(und("a").as("nid"))
        .agg(min(col("comp")).as("ncomp"))
      val stepped = labels.join(neigh, labels("id") === neigh("nid"), "left_outer")
        .select(col("id"), col("comp").as("pcomp"),
          least(col("comp"), coalesce(col("ncomp"), col("comp"))).as("c1"))
      // pointer jump: comp := comp(comp). Every c1 value is itself a
      // node id carrying a c1 row (labels are always node ids), so the
      // self-join is total; jcomp <= c1 keeps monotonicity.
      val jump = stepped.select(col("id").as("jid"), col("c1").as("jcomp"))
      val jumped = stepped.join(jump, stepped("c1") === jump("jid"))
        .select(col("id"), col("pcomp"), col("jcomp").as("comp"))
        .localCheckpoint(true)
      converged = jumped.filter(col("comp") < col("pcomp")).isEmpty
      labels = jumped.select(col("id"), col("comp"))
      i += 1
    }
    labels
  }
}
