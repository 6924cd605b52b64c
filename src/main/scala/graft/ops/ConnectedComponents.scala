package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by min-label propagation — the last stage of a
  * dedup pipeline: LSH candidate pairs → duplicate CLUSTERS → keep the
  * min-id representative per cluster.
  *
  * Each iteration is one shuffle (join labels to neighbors + min-agg);
  * labels converge to the component minimum in at most diameter
  * iterations, and near-dup clusters have tiny diameters in practice.
  * `localCheckpoint` after each step cuts the exponentially growing
  * loop lineage. At extreme scale the alternating small-star/large-star
  * algorithm (or GraphX `connectedComponents`, same jar) halves the
  * round count; this implementation favors plan transparency.
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
      val updated = labels.join(neigh, labels("id") === neigh("nid"), "left_outer")
        .select(col("id"), col("comp"),
          least(col("comp"), coalesce(col("ncomp"), col("comp"))).as("comp2"))
        .localCheckpoint(true)
      converged = updated.filter(col("comp2") < col("comp")).isEmpty
      labels = updated.select(col("id"), col("comp2").as("comp"))
      i += 1
    }
    labels
  }
}
