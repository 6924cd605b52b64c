package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Product quantization (PQ) over the `embeddings` table — the
  * memory-compression layout behind billion-scale ANN serving: each
  * 64-dim vector is split into [[PqSub]] contiguous subvectors, each
  * subvector is vector-quantized against a per-subspace codebook of
  * [[PqK]] centroids (k-means, [[PqIters]] Lloyd iterations), and the
  * vector is stored as [[PqSub]] one-byte codes instead of 64 floats
  * (64× compression here; the production knob is PqSub × log2(PqK)
  * bits per vector). Queries then rank candidates with asymmetric
  * distance computation (ADC): a per-query lookup table of
  * query-subvector→centroid distances, so scoring a vector is PqSub
  * table lookups + adds — no float math against the corpus at all.
  *
  * Bit-exactness across engines (the q41 recipe, taken further — the
  * whole pipeline is INTEGER arithmetic):
  *  - components quantize to 2^20 fixed-point longs
  *    ([[Similarity.FixScale]]) once, up front;
  *  - distances are exact integer L2 over those longs (max term
  *    ~2^42 × 16 dims ≈ 2^46 — no overflow, no FP rounding, so
  *    argmin/tie decisions cannot drift between engines);
  *  - centroid updates are round(sum/count) back to longs — one
  *    IEEE-exact double division of 64-bit-exact integer sums, with
  *    round-half-away-from-zero identical in Spark and DuckDB.
  * Empty cells drop out of the codebook deterministically in both
  * engines (the standard k-means empty-cluster shrink).
  *
  * Scale shape: codebooks are O(PqSub × PqK × subdim) — broadcast-only
  * plan constants; each Lloyd iteration is ONE scan of the subvector
  * frame (PqSub rows per vector) with a per-(sub, cell, pos) aggregate
  * whose cardinality is codebook-sized; the ADC join brokers
  * per-(query, sub, cell) lookup rows (|queries| × PqSub × PqK — tiny,
  * broadcast) against the code frame, and the candidate ranking runs
  * through the bounded-heap TopK operator, so nothing corpus-sized is
  * ever sorted or broadcast. The corpus never shuffles; only
  * (query_id, vec_id) partial sums do — O(|queries| × N) rows with
  * map-side combine.
  *
  * Reference scope note: the reference engine (affo/ssp) has no vector
  * surface at all — this is beyond-reference LLM-pipeline capability
  * per the build brief, sibling to q41 (IVF) and q95 (SRP codes).
  */
object ProductQuant {

  /** Subspace count (codes per vector). */
  val PqSub = 4
  /** Dimensions per subspace (PqSub × PqSubDim = 64). */
  val PqSubDim = 16
  /** Centroids per subspace codebook. */
  val PqK = 8
  /** Lloyd iterations. */
  val PqIters = 2
  /** Queries for the ADC search (vec_id < PqQueries). */
  val PqQueries = 5
  /** Neighbors returned per query. */
  val PqTopK = 5

  import Similarity.FixScale

  /** Exact integer L2 between two array<long> columns. */
  private def l2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0L), (acc, t) => acc + t)

  private def l2Sql(a: String, b: String): String =
    s"list_sum(list_transform(range($PqSubDim), i -> ($a[i+1] - $b[i+1]) * ($a[i+1] - $b[i+1])))"

  /** (vec_id, sub, sv): the fixed-point subvector frame — PqSub rows
    * per vector, sv = array<long> of length PqSubDim.
    */
  private def subvecs(s: SparkSession, d: String): DataFrame = {
    val eq = graft.Tables.embeddings(s, d).select(col("vec_id"),
      transform(col("embedding"),
        x => round(x.cast("double") * FixScale).cast("long")).as("qv"))
    eq.select(col("vec_id"),
        posexplode(array((0 until PqSub).map(m =>
          slice(col("qv"), m * PqSubDim + 1, PqSubDim)): _*)).as(Seq("sub", "sv")))
  }

  /** argmin cell per (vec_id, sub) by (dist asc, cell asc) as a hash
    * aggregate (map-side partial combine — the q41 argmax pattern; no
    * N×PqK-row sort window). `scored` must have columns
    * (vec_id, sub, cell, dist, *keep).
    */
  private def argminCell(scored: DataFrame, keep: Column*): DataFrame =
    scored.groupBy(col("vec_id"), col("sub"))
      .agg(max_by(col("cell"), struct((-col("dist")).as("nd"), (-col("cell")).as("nc"))).as("cell"),
        (min(col("dist")).as("dist") +: keep.map(c => first(c).as(c.toString))): _*)

  /** Train the per-subspace codebooks and assign every subvector.
    * Returns (codebook, assignments): codebook = (sub, cell, cvec);
    * assignments = (vec_id, sub, cell, dist).
    */
  private[queries] def pqAssign(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    // materialize the subvector frame once (each Lloyd iteration plus
    // the final assignment scans it) and cut each iteration's codebook
    // lineage (64 rows) — otherwise iteration k re-evaluates the whole
    // iteration-(k-1) chain from the raw scan
    val sv = subvecs(s, d).localCheckpoint()
    var cents = sv.filter(col("vec_id") < PqK)
      .select(col("sub"), col("vec_id").cast("int").as("cell"), col("sv").as("cvec"))
    for (_ <- 1 to PqIters) {
      val assigned = argminCell(
        sv.join(broadcast(cents), Seq("sub"))
          .withColumn("dist", l2(col("sv"), col("cvec"))), col("sv"))
        .select(col("sub"), col("cell"), col("sv"))
      cents = assigned
        .select(col("sub"), col("cell"), posexplode(col("sv")).as(Seq("pos", "q")))
        .groupBy(col("sub"), col("cell"), col("pos"))
        .agg(sum(col("q")).as("sq"), count(lit(1)).as("cnt"))
        .withColumn("m",
          round(col("sq").cast("double") / col("cnt").cast("double")).cast("long"))
        .groupBy(col("sub"), col("cell"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("sub"), col("cell"), transform(col("pm"), p => p.getField("m")).as("cvec"))
        .localCheckpoint()
    }
    val fin = argminCell(
      sv.join(broadcast(cents), Seq("sub"))
        .withColumn("dist", l2(col("sv"), col("cvec"))))
      .select(col("vec_id"), col("sub"), col("cell"), col("dist"))
    (cents, fin)
  }

  // q101 — PQ codes + quantization distortion: every vector's PqSub
  // codes (subspace-ordered, dash-joined into one string so the
  // top-level output stays scalar — the driver oracle canonicalizes
  // by sorting columns, and array-typed cells are unsortable there)
  // and its total integer-L2 reconstruction error. One row per
  // vector; the distortion column is the quality gauge a PQ
  // deployment monitors (rising qerr = codebook drift).
  private def q101(s: SparkSession, d: String): DataFrame = {
    val (_, fin) = pqAssign(s, d)
    fin.groupBy(col("vec_id"))
      .agg(array_sort(collect_list(struct(col("sub"), col("cell"), col("dist")))).as("scd"))
      .select(col("vec_id"),
        concat_ws("-",
          transform(col("scd"), t => t.getField("cell").cast("string"))).as("codes"),
        aggregate(transform(col("scd"), t => t.getField("dist")),
          lit(0L), (acc, x) => acc + x).as("qerr"))
      .orderBy(col("vec_id"))
  }

  /** DuckDB mirror of one Lloyd iteration over (sub, sv) subvectors:
    * assign to `prevC`, update into CTE pair (aName, cName).
    */
  private def pqIterSql(prevC: String, aName: String, cName: String): String =
    s"""$aName AS (
      |  SELECT sub, cell, sv FROM (
      |    SELECT s.vec_id, s.sub, s.sv, c.cell,
      |      row_number() OVER (PARTITION BY s.vec_id, s.sub
      |        ORDER BY ${l2Sql("s.sv", "c.cvec")} ASC, c.cell ASC) AS rk
      |    FROM sv s JOIN $prevC c ON s.sub = c.sub) t
      |  WHERE rk = 1),
      |$cName AS (
      |  SELECT sub, cell, list(m ORDER BY pos) AS cvec FROM (
      |    SELECT sub, cell, r.i AS pos,
      |      CAST(round(CAST(sum(sv[r.i + 1]) AS DOUBLE) /
      |        CAST(count(*) AS DOUBLE)) AS BIGINT) AS m
      |    FROM $aName, range($PqSubDim) r(i)
      |    GROUP BY sub, cell, r.i) y
      |  GROUP BY sub, cell)""".stripMargin

  private def pqBaseSql: String = {
    val iters = (1 to PqIters)
      .map(k => pqIterSql(s"c${k - 1}", s"a$k", s"c$k"))
      .mkString(",\n")
    s"""eq AS (
      |  SELECT vec_id, list_transform(embedding,
      |      x -> CAST(round(CAST(x AS DOUBLE) * $FixScale) AS BIGINT)) AS qv
      |  FROM embeddings),
      |sv AS (
      |  SELECT vec_id, m.m AS sub,
      |    qv[(m.m * $PqSubDim + 1):(m.m * $PqSubDim + $PqSubDim)] AS sv
      |  FROM eq, (SELECT unnest(range($PqSub)) AS m) m),
      |c0 AS (
      |  SELECT sub, CAST(vec_id AS INT) AS cell, sv AS cvec
      |  FROM sv WHERE vec_id < $PqK),
      |$iters,
      |fin AS (
      |  SELECT vec_id, sub, cell, dist FROM (
      |    SELECT s.vec_id, s.sub, c.cell, ${l2Sql("s.sv", "c.cvec")} AS dist,
      |      row_number() OVER (PARTITION BY s.vec_id, s.sub
      |        ORDER BY ${l2Sql("s.sv", "c.cvec")} ASC, c.cell ASC) AS rk
      |    FROM sv s JOIN c$PqIters c ON s.sub = c.sub) t
      |  WHERE rk = 1)""".stripMargin
  }

  private val q101Sql =
    s"""WITH $pqBaseSql
      |SELECT vec_id,
      |  array_to_string(list(CAST(cell AS INT) ORDER BY sub), '-') AS codes,
      |  CAST(sum(dist) AS BIGINT) AS qerr
      |FROM fin GROUP BY vec_id
      |ORDER BY vec_id""".stripMargin

  // q102 — ADC top-k search over the PQ codes: each query (vec_id <
  // PqQueries) builds its per-(sub, cell) integer-L2 lookup table
  // against the trained codebook, every corpus vector's approximate
  // distance is the sum of PqSub LUT entries addressed by its codes,
  // and the PqTopK nearest candidates per query rank through the
  // bounded-heap TopK operator (exact rk recomputed on the ≤
  // queries×k survivor rows). Self-matches excluded. This is the
  // standard IVF-PQ serving read path minus the IVF routing (q41
  // covers that axis).
  private def q102(s: SparkSession, d: String): DataFrame = {
    val (cents, fin) = pqAssign(s, d)
    val sq = subvecs(s, d).filter(col("vec_id") < PqQueries)
      .select(col("vec_id").as("query_id"), col("sub"), col("sv"))
    val lut = sq.join(broadcast(cents), Seq("sub"))
      .withColumn("ldist", l2(col("sv"), col("cvec")))
      .select(col("query_id"), col("sub"), col("cell"), col("ldist"))
    val adist = fin.join(broadcast(lut), Seq("sub", "cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("ldist")).as("adist"))
    val top = graft.plans.TopK.perKey(adist, Seq("query_id"),
      Seq(col("adist").asc, col("vec_id").asc), PqTopK)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adist").asc, col("vec_id").asc)
    top.withColumn("rk", row_number().over(w))
      .select(col("query_id"), col("rk"), col("vec_id"), col("adist"))
      .orderBy(col("query_id"), col("rk"))
  }

  private val q102Sql =
    s"""WITH $pqBaseSql,
      |lut AS (
      |  SELECT s.vec_id AS query_id, s.sub, c.cell,
      |    ${l2Sql("s.sv", "c.cvec")} AS ldist
      |  FROM sv s JOIN c$PqIters c ON s.sub = c.sub
      |  WHERE s.vec_id < $PqQueries),
      |adist AS (
      |  SELECT l.query_id, f.vec_id, CAST(sum(l.ldist) AS BIGINT) AS adist
      |  FROM fin f JOIN lut l ON f.sub = l.sub AND f.cell = l.cell
      |  WHERE f.vec_id <> l.query_id
      |  GROUP BY l.query_id, f.vec_id)
      |SELECT query_id, rk, vec_id, adist FROM (
      |  SELECT query_id, vec_id, adist,
      |    row_number() OVER (PARTITION BY query_id
      |      ORDER BY adist ASC, vec_id ASC) AS rk
      |  FROM adist) t
      |WHERE rk <= $PqTopK
      |ORDER BY query_id, rk""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q101_pq_codes", q101, Some(q101Sql)),
    Q("q102_pq_adc", q102, Some(q102Sql)),
  )
}
