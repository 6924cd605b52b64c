package graft.queries

import graft.SparkSpec

/** Fixture pin for q145: exact fixed-point centroids, the
  * truncation-toward-zero division law on negative dimensions (Spark
  * DIV == DuckDB integer //), and the per-member dot stats.
  */
class LabelCentroidSpec extends SparkSpec {
  import spark.implicits._

  test("label centroids: exact quantized means, dots, and negative truncation") {
    val tiny = 3.0f / 1048576.0f // quantizes to exactly 3
    val vecs = Seq(
      (1L, Seq(1.0f, -1.0f), 7), (2L, Seq(0.0f, 1.0f), 7),
      (3L, Seq(-tiny, 0.0f), 9), (4L, Seq(0.0f, 0.0f), 9))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.labelCentroidAudit(vecs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val s = 524288L // 2^19: c for label 7 = (2^19, 0)
    val d1 = 1048576L * s // vec 1 dot the label-7 centroid
    // label 9: per-dim sums (-3, 0) over n=2 -> c = (-3 DIV 2, 0) =
    // (-1, 0) by truncation toward zero (floor would give -2)
    assert(got.toSeq == Seq(
      (7L, 2L, s * s, d1, 0L, d1),
      (9L, 2L, 1L, 3L, 0L, 3L)), s"got ${got.toSeq}")
  }
}
