package graft.queries

import graft.SparkSpec

/** Reproducibility contract: every registered query must be
  * deterministic — same input, same session, same rows — because the
  * driver's correctness gate hashes results and a training pipeline
  * must be re-runnable bit-for-bit (epoch shuffles, samplers and
  * k-means included: all randomness in the engine is seeded hashing,
  * never an RNG). The sweep enumerates the WHOLE registry (it used to
  * be a hand-curated "looks stochastic" list, which silently missed
  * new queries), re-executes each query and requires identical row
  * sets both times. Comparison is on sorted row renderings — the
  * driver's own canonicalization — so queries whose ORDER BY is not a
  * total order cannot flake here. sf0.001 keeps the double execution
  * of all ~174 queries inside a test-suite-friendly budget.
  */
class DeterminismSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def canon(rows: Array[org.apache.spark.sql.Row]): Seq[String] =
    rows.map(_.toString).sorted.toSeq

  test("every registered query is bit-deterministic across re-runs") {
    val bad = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val a = canon(fn(spark, sf).collect())
      val b = canon(fn(spark, sf).collect())
      if (a == b) None else Some(name)
    }
    assert(bad.isEmpty, s"non-deterministic queries: $bad")
  }
}
