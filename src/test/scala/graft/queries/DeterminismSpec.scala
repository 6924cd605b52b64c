package graft.queries

import graft.SparkSpec

/** Reproducibility contract: every registered query must be
  * deterministic — same input, same session, same rows — because the
  * driver's correctness gate hashes results and a training pipeline
  * must be re-runnable bit-for-bit (epoch shuffles, samplers and
  * k-means included: all randomness in the engine is seeded hashing,
  * never an RNG). This spec re-executes the queries whose
  * implementations LOOK stochastic (sampling, clustering, LSH,
  * iterative fixed points, distributed prefix machinery) and requires
  * identical row sets both times. Comparison is on sorted row
  * renderings — the driver's own canonicalization — so queries whose
  * ORDER BY is not a total order cannot flake here.
  */
class DeterminismSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private val targets = Seq(
    "q32_minhash_lsh", "q34_embed_neardup", "q35_dedup_clusters",
    "q36_simhash", "q41_knn_ivf", "q43_sample_hash",
    "q78_reservoir_stratified", "q79_mixture_sample", "q86_substring_winnow",
    "q87_kcenter_diversity", "q89_split_assign", "q95_srp_lsh",
    "q101_pq_codes", "q104_epoch_shuffle", "q105_repetition_schedule",
    "q112_semdedup", "q115_dsir_weights", "q117_pagerank",
    "q125_length_batching", "q129_shard_balance", "q131_dsir_resample",
    "q137_triangle_count", "q138_priority_sample", "q141_incremental_lsh",
    "q153_skyline", "q157_kcore_peel", "q158_trimmed_mean",
    "q163_label_propagation", "q167_join_advisor", "q170_percentile_rank",
    "q173_bootstrap_ci", "q174_randomization_test", "q176_drift_monitor",
    "q178_trending_terms")

  private def canon(rows: Array[org.apache.spark.sql.Row]): Seq[String] =
    rows.map(_.toString).sorted.toSeq

  test("stochastic-looking queries are bit-deterministic across re-runs") {
    val bad = targets.flatMap { name =>
      val fn = graft.SparkEntry.queries(name)
      val a = canon(fn(spark, sf).collect())
      val b = canon(fn(spark, sf).collect())
      if (a == b) None else Some(name)
    }
    assert(bad.isEmpty, s"non-deterministic queries: $bad")
  }
}
