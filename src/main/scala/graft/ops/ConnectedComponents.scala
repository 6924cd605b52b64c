package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.PlanOps

/** Connected components by min-label propagation with POINTER JUMPING —
  * the last stage of a dedup pipeline: LSH candidate pairs → duplicate
  * CLUSTERS → keep the min-id representative per cluster.
  *
  * Each iteration does two shuffles: (1) neighbor-min — every node
  * takes the smallest label among itself and its neighbors; (2) pointer
  * jump — every node re-labels to its LABEL'S label. Plain propagation
  * needs O(diameter) rounds (a 10^6-node chain would need 10^6
  * shuffles); the jump makes label paths halve each round, so
  * convergence is O(log diameter).
  *
  * Extreme-diameter escape hatch: past `escalateAfter` un-converged
  * rounds the jump count doubles each round (capped at 8 per round) —
  * label paths then shrink by 2^jumps per round, so a graph that is
  * still converging after the first rounds (the deep-chain regime)
  * finishes in fewer TOTAL rounds, and each avoided round also avoids
  * its neighbor-min join shuffle and driver convergence check. This is
  * the same round-count reduction the alternating small-star/large-star
  * algorithm buys past ~10^9-edge components, kept on the simpler
  * invariant: a node's label is always a node id inside its own
  * component and only ever decreases (the jump map is monotone:
  * comp(x) <= x), so any number of extra jumps is safe and the fixpoint
  * is exactly the component minimum. [[PlanOps.checkpointBarrier]]
  * after each round cuts the exponentially growing loop lineage AND
  * resets the inherited size estimates (a plain localCheckpoint keeps
  * `originStats`, which compound multiplicatively across rounds — see
  * the barrier's scaladoc); the per-iteration driver round trip is the
  * convergence check (inherent to any fixpoint loop).
  */
object ConnectedComponents {

  /** Edge-count gate below which [[minLabel]] finishes with a local
    * union-find instead of the iterative distributed loop. A dedup
    * edge list is O(duplicate pairs) — overwhelmingly smaller than the
    * corpus that produced it — and each distributed round costs several
    * scheduled jobs (neighbor join, jumps, barrier, convergence probe),
    * so below this bound the loop is pure fixed overhead: measured 19 s
    * for a 1.3k-edge graph at local[32] vs <0.1 s locally. 4M edges is
    * ~64 MB of packed longs — comfortably driver-safe; override (or set
    * 0 to force the distributed path) via `graft.cc.localMaxEdges`.
    */
  val LocalMaxEdges = 4000000L

  /** @param edges two Long columns `a`, `b` (undirected pairs)
    * @return (id, comp): every vertex mapped to the min id reachable
    */
  def minLabel(edges: DataFrame, maxIter: Int = 20, escalateAfter: Int = 4): DataFrame = {
    val spark = edges.sparkSession
    val e0 = edges.select(col("a"), col("b")).transform(PlanOps.checkpointBarrier)
    val gate = spark.conf.getOption("graft.cc.localMaxEdges")
      .flatMap(_.toLongOption).getOrElse(LocalMaxEdges)
    if (e0.count() <= gate) localMinLabel(e0)
    else minLabelWithRounds(e0, maxIter, escalateAfter)._1
  }

  /** Driver-side union-find (path compression + union-by-min), labels
    * normalized to the component minimum — bit-identical to the
    * distributed fixpoint. Only reached under the [[LocalMaxEdges]]
    * gate, so the collect is bounded.
    */
  private def localMinLabel(e0: DataFrame): DataFrame = {
    val spark = e0.sparkSession
    import spark.implicits._
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = parent.getOrElseUpdate(x, x)
      while (parent(r) != r) r = parent(r)
      var c = x // path compression
      while (parent(c) != r) { val nxt = parent(c); parent(c) = r; c = nxt }
      r
    }
    e0.collect().foreach { row =>
      val (ra, rb) = (find(row.getLong(0)), find(row.getLong(1)))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keysIterator.map(k => (k, find(k))).toSeq.toDF("id", "comp")
  }

  /** As [[minLabel]], also returning the rounds taken to converge —
    * observable for the escalation specs.
    */
  def minLabelWithRounds(
      edges: DataFrame,
      maxIter: Int = 20,
      escalateAfter: Int = 4): (DataFrame, Int) = {
    // Materialize the edge list BEFORE mirroring it: the union
    // references the (often expensive — LSH / winnow candidate
    // generation) edge subtree once per side, and without the barrier
    // Spark computes it twice.
    val e0 = edges.select(col("a"), col("b")).transform(PlanOps.checkpointBarrier)
    val und = e0
      .union(e0.select(col("b").as("a"), col("a").as("b")))
      .transform(PlanOps.checkpointBarrier)
    var labels = und.select(col("a").as("id")).distinct()
      .withColumn("comp", col("id"))
      .transform(PlanOps.checkpointBarrier)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val neigh = und.join(labels, und("b") === labels("id"))
        .groupBy(und("a").as("nid"))
        .agg(min(col("comp")).as("ncomp"))
      val stepped = labels.join(neigh, labels("id") === neigh("nid"), "left_outer")
        .select(col("id"), col("comp").as("pcomp"),
          least(col("comp"), coalesce(col("ncomp"), col("comp"))).as("comp"))
      // pointer jump: comp := comp(comp), repeated `jumps` times. Every
      // comp value is itself a node id carrying a row (labels are
      // always node ids), so the self-join is total; comp(x) <= x keeps
      // monotonicity through any number of applications.
      // clamp the EXPONENT, not the result: a raw `1 << n` wraps (and a
      // min over it picks the negative) once n reaches 31, which a
      // caller with large maxIter / small escalateAfter can hit
      val jumps = if (i < escalateAfter) 1
        else 1 << math.min(i - escalateAfter + 1, 3)
      var cur = stepped
      for (j <- 1 to jumps) {
        val jump = cur.select(col("id").as("jid"), col("comp").as("jcomp"))
        cur = cur.join(jump, cur("comp") === jump("jid"))
          .select(cur("id"), cur("pcomp"), col("jcomp").as("comp"))
        // Each jump SELF-joins the live plan, so the logical tree
        // doubles per jump — 2^jumps copies of the round's subtree by
        // the end, and the size-only stats visitor SQUARES the
        // sizeInBytes estimate per jump on top of that. A barrier every
        // 2 jumps caps the un-truncated tree at 4 subtree copies, so
        // planning cost stays constant per segment; the extra
        // materializations only occur in escalated (jumps > 2) rounds,
        // on the small label frame.
        if (j % 2 == 0 && j < jumps) cur = PlanOps.checkpointBarrier(cur)
      }
      val jumped = cur.transform(PlanOps.checkpointBarrier)
      converged = jumped.filter(col("comp") < col("pcomp")).isEmpty
      labels = jumped.select(col("id"), col("comp"))
      i += 1
    }
    (labels, i)
  }
}
