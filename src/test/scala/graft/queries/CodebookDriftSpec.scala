package graft.queries

import graft.SparkSpec

/** Pins the q270 codebook drift monitor on planted fixtures: identical
  * epochs must read `keep` with exactly zero occupancy TVD; a current
  * epoch whose traffic moved to a region the reference-epoch codebook
  * never saw must read `retrain` on BOTH codebooks (occupancy collapses
  * into one cell AND the mean assigned cosine drops). Epochs are vec_id
  * parity (half 0 = reference/training), the q183 convention.
  */
class CodebookDriftSpec extends SparkSpec {
  import spark.implicits._

  /** 64-dim unit-ish vector on `axis` with a small deterministic jitter
    * on the next axis — all within the first 16 dims so the truncated
    * d16 codebook sees the same cluster structure (and no slice is ever
    * the zero vector, which cosine_sim maps to NULL).
    */
  private def vec(axis: Int, jitter: Float): Seq[Float] = {
    val a = Array.fill(64)(0f)
    a(axis) = 1f
    a(axis + 1) = jitter
    a.toIndexedSeq
  }

  // two clusters (axes 0 and 8); pair (2k, 2k+1) shares a cluster so
  // both halves have the same 10/10 composition; ids 0 and 2 seed the
  // 2-cell codebook with one vector from each cluster
  private def refEpoch(i: Int): Seq[Float] =
    vec(if ((i / 2) % 2 == 0) 0 else 8, 0.05f * (i % 3))

  test("identical epochs read keep, with exactly zero occupancy TVD") {
    val emb = (0 until 40).map(i => (i.toLong, refEpoch(i)))
      .toDF("vec_id", "embedding")
    val got = Similarity.codebookDriftOf(emb, cellsN = 2, itersN = 2)
      .collect()
    assert(got.map(_.getString(0)).toSeq == Seq("ivf_d16", "ivf_d64"))
    got.foreach { r =>
      assert(r.getAs[String]("action") == "keep", r.toString)
      assert(r.getAs[Long]("occ_tvd_fp") == 0L, r.toString)
      assert(r.getAs[Long]("n_ref") == 20 && r.getAs[Long]("n_cur") == 20)
    }
  }

  test("current epoch in an unseen region reads retrain on both codebooks") {
    val emb = (0 until 40).map { i =>
      val v = if (i % 2 == 0) refEpoch(i) else vec(12, 0.05f * (i % 3))
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
    val got = Similarity.codebookDriftOf(emb, cellsN = 2, itersN = 2)
      .collect()
    got.foreach { r =>
      assert(r.getAs[String]("action") == "retrain", r.toString)
      // the drifted epoch collapses into one cell: TVD = 1/2 exactly
      assert(r.getAs[Long]("occ_tvd_fp") == Similarity.FixScale / 2, r.toString)
      // and sits far from every reference centroid: the mean assigned
      // cosine drops well past the 0.02 threshold
      assert(r.getAs[Long]("dist_ref_fp") - r.getAs[Long]("dist_cur_fp") >
        Similarity.DriftDistFp, r.toString)
    }
  }
}
