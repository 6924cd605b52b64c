package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.Tables._
import graft.functions.GraftFunctions

/** Similarity search over the `embeddings` table (64-dim float
  * vectors): brute-force cosine top-k as the exactness baseline, an
  * IVF-style partitioned variant as the 100 TB scale path, and
  * per-vector nearest-neighbor as the embedding-dedup primitive.
  *
  * Scale design: the brute-force path broadcasts the (tiny) query set
  * against the full table — one scan, no shuffle of the big side, cost
  * O(N·Q·dim) spread across executors, with the distance computed by the
  * codegen'd native [[graft.functions.CosineSimilarity]] expression.
  * The IVF path (q41) first clusters vectors into coarse cells
  * (elementwise-mean centroids), then probes only the closest cells —
  * the standard inverted-file ANN layout where each cell is a Spark
  * partition-pruned subset.
  *
  * Oracle bit-exactness: cosine = ordered-fold double arithmetic —
  * identical in DuckDB's `list_reduce` form (see CosineSimilarity
  * scaladoc) — so no rounding is applied anywhere.
  */
object Similarity {

  /** DuckDB fragment: cosine over two list<float> columns, same
    * arithmetic order as CosineSimilarity.
    */
  private[queries] def cosSql(a: String, b: String): String = {
    def dot(u: String, v: String) =
      s"list_reduce(list_transform(range(64), i -> CAST($u[i+1] AS DOUBLE) * CAST($v[i+1] AS DOUBLE)), (x, y) -> x + y)"
    s"(${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)})))"
  }

  // q40 — brute-force cosine top-5 for query vectors vec_id 0..4
  // against the whole table (self excluded). Exact k-NN baseline.
  private def q40(s: SparkSession, d: String): DataFrame = {
    GraftFunctions.register(s)
    val e = embeddings(s, d)
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    e.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("cos", expr("cosine_sim(qvec, embedding)"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("query_id"), col("rk"), col("vec_id"), col("cos"))
      .orderBy(col("query_id"), col("rk"))
  }

  private val q40Sql =
    s"""SELECT query_id, rk, vec_id, cos FROM (
      |  SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
      |    ${cosSql("q.embedding", "e.embedding")} AS cos,
      |    row_number() OVER (PARTITION BY q.vec_id
      |      ORDER BY ${cosSql("q.embedding", "e.embedding")} DESC, e.vec_id) AS rk
      |  FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
      |  WHERE q.vec_id < 5) t
      |WHERE rk <= 5
      |ORDER BY query_id, rk""".stripMargin

  /** q34 pivot count / probed cells per vector — DEFAULTS; override per
    * session via `graft.neardup.pivots` / `graft.neardup.probe` (the
    * oracle SQL is templated from the defaults, so Verify runs
    * unconfigured sessions). PivotCount should scale as √(N/labels):
    * at 100× data, set the conf instead of recompiling.
    */
  val NearDupPivots = 16
  val NearDupProbe = 2

  private def confInt(s: SparkSession, key: String, default: Int): Int =
    s.conf.getOption(key).map(_.trim.toInt).getOrElse(default)

  // q34 — embedding-level near-duplicate detection: each vector's
  // nearest CANDIDATE neighbor, where candidates share the label AND a
  // coarse-quantizer cell (nearest-of-NearDupPivots pivot vectors,
  // multi-probed to the top NearDupProbe cells). Label-only blocking is
  // all-pairs within each label — quadratic in corpus size per label;
  // the cell sub-block bounds the expected pair count per (label, cell)
  // bucket at (probe·N / (labels·pivots))², and PivotCount scales as
  // √(N/labels) at 100 TB so total pairs stay ~linear per label. The
  // quantizer is deterministic and SQL-expressible (pivots = vec_id <
  // NearDupPivots, assignment = argmax ordered-fold cosine, ties to the
  // smaller pivot id), so DuckDB computes the identical blocked
  // semantics — bit-exact, no recall gap in the gate.
  /** The candidate-pair + nearest-neighbor back half of q34, factored
    * so the adversarial spec can drive it with a degenerate frame.
    * `assigned` must have columns (vec_id, label, embedding, cell).
    *
    * Skew design: a plain `a.join(b, Seq("label","cell"))` lands each
    * (label, cell) block's all-pairs work on ONE task — and a
    * near-dup-heavy cell (many near-identical vectors, exactly what
    * this query exists to find) is the degenerate case. So blocks above
    * [[Dedup.HotBucketThreshold]] rows get triangle-split
    * (ops/SelfJoins) over [[Dedup.TriangleSplit]] row-groups while cold
    * blocks keep replication 1 — the q32 hot-bucket pattern. The
    * nearest-NEIGHBOR relation is directional, so each unordered pair
    * feeds both orientations; cosine is bit-exactly commutative (the
    * per-element products and the fold order are identical either way),
    * so one evaluation serves both.
    */
  private[graft] def nearestWithinBlocks(assigned: DataFrame): DataFrame = {
    val hot = assigned.groupBy(col("label"), col("cell"))
      .agg(count(lit(1)).as("__bn"))
      .filter(col("__bn") > Dedup.HotBucketThreshold)
      .select(col("label"), col("cell"), lit(true).as("__hot"))
    val graded = assigned.join(broadcast(hot), Seq("label", "cell"), "left")
    val pairs = graft.ops.SelfJoins
      .pairsWithinBlocks(graded, Seq("label", "cell"), "vec_id",
        when(col("__hot"), lit(Dedup.TriangleSplit)).otherwise(lit(1)))
      .withColumn("cos", expr("cosine_sim(embedding_l, embedding_r)"))
      .select(col("vec_id_l"), col("vec_id_r"), col("label"), col("cos"))
    val w = Window.partitionBy(col("id_a")).orderBy(col("cos").desc, col("id_b"))
    // both orientations from ONE pass: exploding a constant 2-flag
    // array keeps the join subtree (hot-count + triangle split + cosine
    // eval) planned once — a unionAll of two selects over `pairs` would
    // plan and EXECUTE the whole subtree twice. The generator is below
    // the orientation projection, so cosine_sim still evaluates once
    // per unordered pair; Generate cannot collapse with the projection
    // above it.
    pairs
      .select(col("vec_id_l"), col("vec_id_r"), col("label"), col("cos"),
        explode(array(lit(true), lit(false))).as("fwd"))
      .select(
        when(col("fwd"), col("vec_id_l")).otherwise(col("vec_id_r")).as("id_a"),
        col("label"),
        when(col("fwd"), col("vec_id_r")).otherwise(col("vec_id_l")).as("id_b"),
        col("cos"))
      .distinct() // a pair can co-occur in both probed cells
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("id_a").as("vec_id"), col("label"), col("id_b").as("nn_id"),
        col("cos").as("nn_cos"),
        when(col("cos") > 0.35, 1).otherwise(0).as("near_dup"))
      .orderBy(col("vec_id"))
  }

  private def q34(s: SparkSession, d: String): DataFrame = {
    GraftFunctions.register(s)
    val pivotN = confInt(s, "graft.neardup.pivots", NearDupPivots)
    val probeN = confInt(s, "graft.neardup.probe", NearDupProbe)
    val e = embeddings(s, d)
    val pivots = e.filter(col("vec_id") < pivotN)
      .select(col("vec_id").as("pivot_id"), col("embedding").as("pvec"))
    val wCell = Window.partitionBy(col("vec_id")).orderBy(col("pcos").desc, col("pivot_id"))
    val assigned = e.join(broadcast(pivots))
      .withColumn("pcos", expr("cosine_sim(embedding, pvec)"))
      .withColumn("prk", row_number().over(wCell))
      .filter(col("prk") <= probeN)
      .select(col("vec_id"), col("label"), col("embedding"), col("pivot_id").as("cell"))
    nearestWithinBlocks(assigned)
  }

  private val q34Sql =
    s"""WITH assigned AS (
      |  SELECT vec_id, label, embedding, cell FROM (
      |    SELECT e.vec_id, e.label, e.embedding, p.vec_id AS cell,
      |      row_number() OVER (PARTITION BY e.vec_id
      |        ORDER BY ${cosSql("e.embedding", "p.embedding")} DESC, p.vec_id) AS prk
      |    FROM embeddings e JOIN embeddings p ON p.vec_id < $NearDupPivots) t
      |  WHERE prk <= $NearDupProbe),
      |pairs AS (
      |  SELECT DISTINCT a.vec_id AS id_a, a.label AS label, b.vec_id AS id_b,
      |    ${cosSql("a.embedding", "b.embedding")} AS cos
      |  FROM assigned a JOIN assigned b
      |    ON a.label = b.label AND a.cell = b.cell AND a.vec_id <> b.vec_id)
      |SELECT vec_id, label, nn_id, nn_cos,
      |  CASE WHEN nn_cos > 0.35 THEN 1 ELSE 0 END AS near_dup
      |FROM (
      |  SELECT id_a AS vec_id, label, id_b AS nn_id, cos AS nn_cos,
      |    row_number() OVER (PARTITION BY id_a ORDER BY cos DESC, id_b) AS rk
      |  FROM pairs) t
      |WHERE rk = 1
      |ORDER BY vec_id""".stripMargin

  /** q41 codebook size / Lloyd iterations / probed cells — DEFAULTS;
    * override per session via `graft.ivf.cells` / `graft.ivf.iters` /
    * `graft.ivf.probe` (cells should scale as √N at 100× data — set
    * the conf, don't recompile; the oracle SQL is templated from the
    * defaults).
    */
  val IvfCells = 16
  val IvfIters = 3
  val IvfProbe = 6
  /** Fixed-point scale (2^20) for portable, order-independent centroid
    * sums — see q41 scaladoc.
    */
  val FixScale = 1048576L

  // q41 — IVF ANN with a REAL (iterated Lloyd/k-means) codebook that is
  // nonetheless bit-reproducible across engines, so the whole query has
  // a hash-exact DuckDB oracle:
  //  - init: the embeddings of vec_id 0..IvfCells-1 (k-means++-style
  //    seeding replaced by fixed seeds for determinism);
  //  - each iteration assigns every vector to its max-cosine cell (ties
  //    to the smaller cell id) and recomputes centroids as elementwise
  //    means of the vectors QUANTIZED to 2^20 fixed-point longs: the
  //    per-dimension sum is exact 64-bit integer arithmetic —
  //    order-independent, so Spark's partial aggregation order cannot
  //    perturb it — and sum/count/2^20 is a single deterministic double
  //    division identical in DuckDB. (A plain float mean would be
  //    FP-order-dependent and unverifiable, which is what kept the old
  //    q41 oracle-less.) round() ties resolve away-from-zero in both
  //    engines; ×2^20 is exponent-exact.
  //  - queries probe the IvfProbe nearest cells, exact top-5 within.
  // Scale: every centroid structure is O(IvfCells × dim) — broadcast;
  // the corpus is scanned once per iteration and once for the final
  // assignment, all shuffle-free except the tiny per-cell aggregates.
  // Recall/probe is the standard IVF knob (QueryPackSpec pins >= 0.9
  // vs q40 at IvfProbe=6 of 16 cells).
  /** argmax by (cos desc, cell asc) via max_by on (ccos, -cell): a
    * hash aggregate with map-side partial combine — one shuffle of N
    * rows — instead of a row_number window's sort-shuffle of N×cells
    * rows. Result identical (cell is unique per candidate, so the
    * ordering key has no ties); the oracles state it as row_number.
    */
  private def argmaxCell(scored: DataFrame, keep: Column*): DataFrame =
    scored.groupBy(col("vec_id"))
      .agg(max_by(col("cell"), struct(col("ccos"), (-col("cell")).as("nc"))).as("cell"),
        keep.map(c => first(c).as(c.toString)): _*)

  /** Iterated Lloyd/k-means on `eq` rows (vec_id, embedding, qv) from
    * the `init` (cell, cvec) codebook — the q41 recipe, shared with
    * q270's drift monitor: assignments are max-cosine (ties to the
    * smaller cell), centroid updates are elementwise means over the
    * 2^20 fixed-point quantized vectors, so the per-dimension sums are
    * exact 64-bit integers (order-independent — Spark's partial
    * aggregation order cannot perturb them) and the final division is
    * one deterministic double op identical in DuckDB. Every centroid
    * frame is O(cells × dim) — broadcast; the corpus is scanned once
    * per iteration.
    */
  private def ivfTrainOn(eq: DataFrame, init: DataFrame, itersN: Int): DataFrame = {
    var centroids = init
    for (_ <- 1 to itersN) {
      val assigned = argmaxCell(
        eq.join(broadcast(centroids))
          .withColumn("ccos", expr("cosine_sim(embedding, cvec)")), col("qv"))
        .select(col("cell"), col("qv"))
      centroids = assigned
        .select(col("cell"), posexplode(col("qv")).as(Seq("pos", "q")))
        .groupBy(col("cell"), col("pos"))
        .agg(sum(col("q")).as("sq"), count(lit(1)).as("cnt"))
        .withColumn("m", (col("sq").cast("double") /
          (col("cnt").cast("double") * FixScale.toDouble)).cast("float"))
        .groupBy(col("cell"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cell"), transform(col("pm"), p => p.getField("m")).as("cvec"))
    }
    centroids
  }

  private def q41(s: SparkSession, d: String): DataFrame = {
    GraftFunctions.register(s)
    val cellsN = confInt(s, "graft.ivf.cells", IvfCells)
    val itersN = confInt(s, "graft.ivf.iters", IvfIters)
    val probeN = confInt(s, "graft.ivf.probe", IvfProbe)
    val e = embeddings(s, d)
    val eq = e.select(col("vec_id"), col("embedding"),
      transform(col("embedding"),
        x => round(x.cast("double") * FixScale).cast("long")).as("qv"))
    val init = eq.filter(col("vec_id") < cellsN)
      .select(col("vec_id").cast("int").as("cell"),
        transform(col("qv"),
          q => (q.cast("double") / FixScale.toDouble).cast("float")).as("cvec"))
    val centroids = ivfTrainOn(eq, init, itersN)
    val assigned = argmaxCell(
      e.join(broadcast(centroids))
        .withColumn("ccos", expr("cosine_sim(embedding, cvec)")), col("embedding"))
      .select(col("vec_id"), col("cell"), col("embedding"))
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val wProbe = Window.partitionBy(col("query_id")).orderBy(col("qcos").desc, col("cell"))
    val probed = q.join(broadcast(centroids))
      .withColumn("qcos", expr("cosine_sim(qvec, cvec)"))
      .withColumn("prk", row_number().over(wProbe))
      .filter(col("prk") <= probeN)
      .select(col("query_id"), col("qvec"), col("cell"))
    val wTop = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    assigned.join(broadcast(probed), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", expr("cosine_sim(qvec, embedding)"))
      .withColumn("rk", row_number().over(wTop))
      .filter(col("rk") <= 5)
      .select(col("query_id"), col("rk"), col("vec_id"), col("cos"))
      .orderBy(col("query_id"), col("rk"))
  }

  /** DuckDB mirror of one Lloyd iteration: assign to `prevC`, update
    * into centroid CTE pair (aName, cName).
    */
  private def kmIterSql(prevC: String, aName: String, cName: String): String =
    s"""$aName AS (
      |  SELECT cell, qv FROM (
      |    SELECT e.vec_id, c.cell, e.qv,
      |      row_number() OVER (PARTITION BY e.vec_id
      |        ORDER BY ${cosSql("e.embedding", "c.cvec")} DESC, c.cell) AS crk
      |    FROM eq e CROSS JOIN $prevC c) t
      |  WHERE crk = 1),
      |$cName AS (
      |  SELECT cell, list(m ORDER BY pos) AS cvec FROM (
      |    SELECT cell, pos,
      |      CAST(CAST(sum(q) AS DOUBLE) /
      |        (CAST(count(*) AS DOUBLE) * $FixScale.0) AS REAL) AS m
      |    FROM (SELECT cell, r.i AS pos, qv[r.i + 1] AS q
      |          FROM $aName, range(64) r(i)) x
      |    GROUP BY cell, pos) y
      |  GROUP BY cell)""".stripMargin

  /** Shared DuckDB prefix (q41 + q275): the fixed-point Lloyd chain to
    * the final codebook `cFin`, plus the corpus `assigned` CTE.
    */
  private val ivfCFin = s"c$IvfIters"
  private val ivfAssignedPrefixSql = {
    val iters = (1 to IvfIters)
      .map(k => kmIterSql(s"c${k - 1}", s"a$k", s"c$k"))
      .mkString(",\n")
    s"""eq AS (
      |  SELECT vec_id, embedding,
      |    list_transform(embedding,
      |      x -> CAST(round(CAST(x AS DOUBLE) * $FixScale) AS BIGINT)) AS qv
      |  FROM embeddings),
      |c0 AS (
      |  SELECT CAST(vec_id AS INT) AS cell,
      |    list_transform(qv,
      |      q -> CAST(CAST(q AS DOUBLE) / $FixScale.0 AS REAL)) AS cvec
      |  FROM eq WHERE vec_id < $IvfCells),
      |$iters,
      |assigned AS (
      |  SELECT vec_id, cell, embedding FROM (
      |    SELECT e.vec_id, c.cell, e.embedding,
      |      row_number() OVER (PARTITION BY e.vec_id
      |        ORDER BY ${cosSql("e.embedding", "c.cvec")} DESC, c.cell) AS crk
      |    FROM embeddings e CROSS JOIN $ivfCFin c) t
      |  WHERE crk = 1)""".stripMargin
  }

  private val q41Sql = {
    val cFin = ivfCFin
    s"""WITH $ivfAssignedPrefixSql,
      |probed AS (
      |  SELECT query_id, qvec, cell FROM (
      |    SELECT q.vec_id AS query_id, q.embedding AS qvec, c.cell,
      |      row_number() OVER (PARTITION BY q.vec_id
      |        ORDER BY ${cosSql("q.embedding", "c.cvec")} DESC, c.cell) AS prk
      |    FROM embeddings q CROSS JOIN $cFin c
      |    WHERE q.vec_id < 5) t
      |  WHERE prk <= $IvfProbe)
      |SELECT query_id, rk, vec_id, cos FROM (
      |  SELECT p.query_id, a.vec_id, ${cosSql("p.qvec", "a.embedding")} AS cos,
      |    row_number() OVER (PARTITION BY p.query_id
      |      ORDER BY ${cosSql("p.qvec", "a.embedding")} DESC, a.vec_id) AS rk
      |  FROM assigned a JOIN probed p ON a.cell = p.cell
      |  WHERE a.vec_id <> p.query_id) t
      |WHERE rk <= 5
      |ORDER BY query_id, rk""".stripMargin
  }

  // q74 — int8 scalar quantization round-trip: per-vector absmax scale,
  // quantize to [-127, 127], dequantize, and measure retained cosine —
  // the embedding-compression step of a vector pipeline (4× smaller
  // than float32 at ~1e-2 cosine loss), single scan, no shuffle, no
  // explode. Portability: round() ties resolve away-from-zero in both
  // engines, the divide/multiply chains are written in identical
  // association order, and the retained cosine reuses the ordered-fold
  // cosine_sim parity.
  private def q74(s: SparkSession, d: String): DataFrame = {
    GraftFunctions.register(s)
    embeddings(s, d)
      .select(col("vec_id"), col("embedding"),
        array_max(transform(col("embedding"), x => abs(x.cast("double")))).as("scale"))
      .select(col("vec_id"), col("embedding"), col("scale"),
        transform(col("embedding"), x =>
          when(col("scale") === 0d, lit(0L))
            .otherwise(round(x.cast("double") / col("scale") * 127).cast("long"))).as("qv"))
      .select(col("vec_id"), col("embedding"), col("scale"), col("qv"),
        transform(col("qv"), q =>
          (q.cast("double") * col("scale") / 127d).cast("float")).as("deq"))
      .select(col("vec_id"), col("scale"), col("qv"),
        expr("cosine_sim(embedding, deq)").as("cos_keep"))
      .select(col("vec_id"), col("scale"),
        array_min(col("qv")).as("q_min"), array_max(col("qv")).as("q_max"),
        col("cos_keep"))
      .orderBy(col("vec_id"))
  }

  private val q74Sql =
    s"""WITH q AS (
      |  SELECT vec_id, embedding,
      |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS scale
      |  FROM embeddings),
      |qq AS (
      |  SELECT vec_id, scale, embedding,
      |    list_transform(embedding, x -> CASE WHEN scale = 0 THEN 0
      |      ELSE CAST(round(CAST(x AS DOUBLE) / scale * 127) AS BIGINT) END) AS qv
      |  FROM q),
      |dq AS (
      |  SELECT vec_id, scale, qv, embedding,
      |    list_transform(qv, v -> CAST(CAST(v AS DOUBLE) * scale / 127 AS REAL)) AS deq
      |  FROM qq)
      |SELECT vec_id, scale, list_min(qv) AS q_min, list_max(qv) AS q_max,
      |  ${cosSql("embedding", "deq")} AS cos_keep
      |FROM dq
      |ORDER BY vec_id""".stripMargin

  /** q87 — greedy k-center diversity selection: pick KCenter vectors
    * that maximize pairwise spread (the farthest-point heuristic, a 2-
    * approximation of the k-center objective) — the "select maximally
    * diverse examples" stage of training-data curation. Seed = min
    * vec_id; each round adds the vector whose HIGHEST cosine to the
    * chosen set is lowest (tie → smaller vec_id).
    *
    * Scale shape: k−1 rounds; each round is ONE corpus scan with the
    * chosen set inlined as literal vectors (O(k·dim) plan constants —
    * no join, no shuffle) + a 1-row argmin collect. The driver loop is
    * bounded by the constant k, the same per-iteration pattern as
    * q41's k-means. Output is integer-only (step, vec_id); doubles
    * drive the argmin internally and are bit-identical across engines
    * (ordered-fold cosine, see CosineSimilarity scaladoc).
    */
  val KCenter = 8

  private def q87(s: SparkSession, d: String): DataFrame =
    kCenterSelect(embeddings(s, d), KCenter)

  /** The q87 greedy over any (vec_id, embedding, ...) frame — split out
    * so specs can drive constructed geometries through the production
    * path.
    */
  private[graft] def kCenterSelect(embDf: DataFrame, k: Int): DataFrame = {
    val s = embDf.sparkSession
    GraftFunctions.register(s)
    val e = embDf.select(col("vec_id"), col("embedding"))
    def collectOne(df: DataFrame): (Long, Seq[Float]) = {
      val r = df.limit(1).collect().head
      (r.getLong(0), r.getSeq[Float](1))
    }
    var chosen = Vector(collectOne(e.orderBy(col("vec_id"))))
    while (chosen.length < k) {
      val maxSim = chosen.map { case (_, vec) =>
        call_function("cosine_sim", col("embedding"),
          array(vec.map(lit): _*))
      }.reduce(greatest(_, _))
      chosen :+= collectOne(
        e.filter(!col("vec_id").isin(chosen.map(_._1): _*))
          .select(col("vec_id"), col("embedding"))
          .orderBy(maxSim.asc, col("vec_id").asc))
    }
    import s.implicits._
    chosen.map(_._1).zipWithIndex
      .map { case (id, i) => (i + 1, id) }
      .toDF("step", "vec_id")
      .orderBy(col("step"))
  }

  // The candidate×chosen max runs as a join + GROUP BY (not a
  // correlated scalar subquery): DuckDB cannot resolve a correlated
  // column inside list_reduce's nested lambda, and the join form keeps
  // both embedding columns bound in one FROM scope.
  private val q87Sql =
    s"""WITH RECURSIVE sel(step, ids) AS (
      |  SELECT 1, [(SELECT min(vec_id) FROM embeddings)]
      |  UNION ALL
      |  SELECT s.step + 1, list_append(s.ids, (
      |    SELECT m.vec_id FROM (
      |      SELECT e.vec_id AS vec_id, max(${cosSql("e.embedding", "c.embedding")}) AS ms
      |      FROM embeddings e CROSS JOIN embeddings c
      |      WHERE list_contains(s.ids, c.vec_id) AND NOT list_contains(s.ids, e.vec_id)
      |      GROUP BY e.vec_id) m
      |    ORDER BY m.ms ASC, m.vec_id ASC
      |    LIMIT 1))
      |  FROM sel s WHERE s.step < $KCenter)
      |SELECT CAST(t.i AS INT) AS step, t.id AS vec_id
      |FROM (SELECT unnest(ids) AS id, generate_subscripts(ids, 1) AS i
      |      FROM sel WHERE step = $KCenter) t
      |ORDER BY step""".stripMargin

  /** Random-hyperplane (sign-random-projection) LSH: number of sign
    * bits per code. 2^SrpBits possible buckets; P[bit collision] =
    * 1 − θ/π, so Hamming distance between codes estimates angular
    * distance (Charikar '02 SimHash-for-vectors — the embedding-side
    * sibling of q36's text SimHash).
    */
  val SrpBits = 16
  val SrpDim = 64

  // q95 — SRP-LSH codes over the embeddings: each vector gets a
  // SrpBits-bit sign code (bit b = sign of <v, h_b> for a
  // deterministic LCG-derived hyperplane h_b), plus its code-bucket
  // occupancy — the binary sketch that powers sub-linear ANN (probe
  // same/near buckets instead of the corpus) and embedding-level dedup
  // grouping.
  //
  // Scale shape: one corpus scan; the whole code computes inside the
  // codegen'd [[graft.functions.SrpCode]] expression (one fused
  // integer loop per row — no per-bit row explosion, no interpreted
  // HOFs), and the bucket histogram is a tiny aggregate broadcast
  // back. The dot products run on 2^20 fixed-point quantized
  // components in exact 64-bit integer arithmetic — sign decisions
  // cannot drift between engines (oracle: Similarity.q95Sql).
  private def q95(s: SparkSession, d: String): DataFrame = {
    GraftFunctions.register(s)
    val codes = embeddings(s, d)
      .select(col("vec_id"), expr("srp_code(embedding)").as("code"))
    val buckets = codes.groupBy(col("code")).agg(count(lit(1)).as("bucket_n"))
    codes.join(broadcast(buckets), "code")
      .select(col("vec_id"), col("code"), col("bucket_n"))
      .orderBy(col("vec_id"))
  }

  private val q95Sql =
    s"""WITH q AS (SELECT vec_id,
      |    list_transform(embedding,
      |      x -> CAST(round(CAST(x AS DOUBLE) * $FixScale) AS BIGINT)) AS qe
      |  FROM embeddings),
      |pb AS (SELECT vec_id, b,
      |    list_sum(list_transform(range($SrpDim), i ->
      |      ((1103515245 * (b * $SrpDim + i) + 12345) % 2147483647 - 1073741823)
      |        * qe[i+1])) AS dot
      |  FROM q, (SELECT unnest(range($SrpBits)) AS b) bs),
      |codes AS (SELECT vec_id,
      |    CAST(sum(CASE WHEN dot >= 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)
      |      AS BIGINT) AS code
      |  FROM pb GROUP BY vec_id),
      |buckets AS (SELECT code, CAST(count(*) AS BIGINT) AS bucket_n
      |  FROM codes GROUP BY code)
      |SELECT c.vec_id, c.code, b.bucket_n
      |FROM codes c JOIN buckets b USING (code)
      |ORDER BY vec_id""".stripMargin

  /** q112 pivot floor / probed cells / cosine threshold — the
    * SemDeDup-style semantic-dedup knobs. The pivot count DEFAULTS to
    * max(SemPivots, ceil(√N)) so cell population — and with it the
    * within-cell pair work — scales as √N instead of N as the corpus
    * grows (the right 100× behavior without touching a knob); the
    * oracle computes the same bound from a COUNT subquery, and sqrt is
    * IEEE-correctly-rounded in both engines so the ceil can never
    * disagree. Override per session via `graft.semdedup.pivots` /
    * `graft.semdedup.probe` (the q34 pattern; Verify runs unconfigured
    * sessions). τ = 0.35 matches q34's near-dup threshold so the two
    * operators agree on what "semantically same" means.
    */
  val SemPivots = 8
  val SemProbe = 2
  val SemTau = 0.35

  // q112 — semantic dedup (the SemDeDup recipe, Abbas et al. 2023):
  // cluster the embedding space coarsely, call within-cluster pairs
  // above a cosine threshold duplicates, and keep ONE representative
  // per duplicate group — the min-id member, every other member is
  // dropped. Output is corpus-sized: every vector with its duplicate
  // group (singletons are their own group) and the keep verdict.
  //
  // Scale shape: the coarse quantizer is the q34 pivot-cell pattern
  // (broadcast O(pivots×dim) table, multi-probed assignment), the
  // within-cell pair generation triangle-splits hot cells
  // (ops/SelfJoins — a semantic-dup-heavy cell is exactly the hot
  // case), and the group labels come from the pointer-jumping
  // connected components over the O(dup pairs) edge list — the corpus
  // itself never self-joins and never shuffles beyond the final
  // left join of the (small) component frame.
  private def q112(s: SparkSession, d: String): DataFrame = {
    GraftFunctions.register(s)
    val probeN = confInt(s, "graft.semdedup.probe", SemProbe)
    val e = embeddings(s, d)
    val pivotN = confInt(s, "graft.semdedup.pivots", -1) match {
      case -1 => math.max(SemPivots, math.ceil(math.sqrt(e.count().toDouble)).toInt)
      case v => v
    }
    val pivots = e.filter(col("vec_id") < pivotN)
      .select(col("vec_id").as("pivot_id"), col("embedding").as("pvec"))
    val wCell = Window.partitionBy(col("vec_id")).orderBy(col("pcos").desc, col("pivot_id"))
    // Materialize the cell assignment once: four downstream branches
    // (hot-cell census, graded frame, both self-join sides) would
    // otherwise each re-run the O(N × pivots) assignment join.
    val assigned = e.join(broadcast(pivots))
      .withColumn("pcos", expr("cosine_sim(embedding, pvec)"))
      .withColumn("prk", row_number().over(wCell))
      .filter(col("prk") <= probeN)
      .select(col("vec_id"), col("embedding"), col("pivot_id").as("cell"))
      .localCheckpoint(true)
    val hot = assigned.groupBy(col("cell"))
      .agg(count(lit(1)).as("__bn"))
      .filter(col("__bn") > Dedup.HotBucketThreshold)
      .select(col("cell"), lit(true).as("__hot"))
    val graded = assigned.join(broadcast(hot), Seq("cell"), "left")
    val edges = graft.ops.SelfJoins
      .pairsWithinBlocks(graded, Seq("cell"), "vec_id",
        when(col("__hot"), lit(Dedup.TriangleSplit)).otherwise(lit(1)))
      .withColumn("cos", expr("cosine_sim(embedding_l, embedding_r)"))
      .filter(col("cos") >= SemTau)
      // cross-row-group pair orientation is arbitrary; canonicalize,
      // and dedup pairs seen in both probed cells
      .select(least(col("vec_id_l"), col("vec_id_r")).as("a"),
        greatest(col("vec_id_l"), col("vec_id_r")).as("b"))
      .distinct()
    val comp = graft.ops.ConnectedComponents.minLabel(edges)
    val wSize = Window.partitionBy(col("group_id"))
    e.select(col("vec_id"))
      .join(comp.withColumnRenamed("id", "vec_id"), Seq("vec_id"), "left")
      .select(col("vec_id"), coalesce(col("comp"), col("vec_id")).as("group_id"))
      .withColumn("group_size", count(lit(1)).over(wSize))
      .withColumn("keep",
        when(col("vec_id") === col("group_id"), 1L).otherwise(0L))
      .orderBy(col("vec_id"))
  }

  private val q112Sql =
    s"""WITH RECURSIVE assigned AS (
      |  SELECT vec_id, embedding, cell FROM (
      |    SELECT e.vec_id, e.embedding, p.vec_id AS cell,
      |      row_number() OVER (PARTITION BY e.vec_id
      |        ORDER BY ${cosSql("e.embedding", "p.embedding")} DESC, p.vec_id) AS prk
      |    FROM embeddings e JOIN embeddings p ON p.vec_id <
      |      greatest($SemPivots,
      |        CAST(ceil(sqrt((SELECT count(*) FROM embeddings))) AS BIGINT))) t
      |  WHERE prk <= $SemProbe),
      |pairs AS (
      |  SELECT DISTINCT a.vec_id AS a, b.vec_id AS b
      |  FROM assigned a JOIN assigned b
      |    ON a.cell = b.cell AND a.vec_id < b.vec_id
      |  WHERE ${cosSql("a.embedding", "b.embedding")} >= $SemTau),
      |undirected(a, b) AS (
      |  SELECT a, b FROM pairs UNION SELECT b, a FROM pairs
      |  UNION SELECT a, a FROM pairs UNION SELECT b, b FROM pairs),
      |reach(a, b) AS (
      |  SELECT a, b FROM undirected
      |  UNION
      |  SELECT r.a, u.b FROM reach r JOIN undirected u ON r.b = u.a),
      |comp AS (SELECT a AS vec_id, min(b) AS gid FROM reach GROUP BY a)
      |SELECT vec_id, group_id,
      |  count(*) OVER (PARTITION BY group_id) AS group_size,
      |  CAST(CASE WHEN vec_id = group_id THEN 1 ELSE 0 END AS BIGINT) AS keep
      |FROM (
      |  SELECT e.vec_id, coalesce(c.gid, e.vec_id) AS group_id
      |  FROM embeddings e LEFT JOIN comp c USING (vec_id)) t
      |ORDER BY vec_id""".stripMargin

  // ---- q135: margin-based bitext mining ----------------------------------

  /** Neighborhood size for the margin denominator (Artetxe & Schwenk's
    * ratio margin). Power of two so the /k normalization is exact in
    * binary floating point.
    */
  val MarginK = 4

  /** Ratio-margin scoring over a candidate pair frame (a_id, b_id,
    * cos): each a-side query's best b-side match, scored by
    * cos(x,y) / ((avg_kNN(x) + avg_kNN(y)) / 2) — the margin criterion
    * that separates true translation pairs from hubness artifacts
    * (a vector that is everyone's near-neighbor gets a high denominator
    * and a low margin). Factored from q135 so the scorer runs over ANY
    * candidate generator — the brute-force frame here, an IVF (q41) or
    // SRP-LSH (q95) candidate frame at 100 TB.
    *
    * Bit-exactness: the two k-NN sums fold in RANK order (collect the
    * top-k as (rank, cos) structs, array_sort, sequential aggregate) —
    * the same (((0+x1)+x2)+x3)+x4 association DuckDB's ordered
    * list_reduce produces, so the margin hash-compares exactly.
    */
  def marginTopPairs(pairs: DataFrame, k: Int): DataFrame = {
    val wA = Window.partitionBy(col("a_id")).orderBy(col("cos").desc, col("b_id"))
    val wB = Window.partitionBy(col("b_id")).orderBy(col("cos").desc, col("a_id"))
    val rk = pairs
      .withColumn("rka", row_number().over(wA))
      .withColumn("rkb", row_number().over(wB))
      .localCheckpoint() // three consumers below; the frame is (ids, cos, ranks) only
    def rankedSum(rkCol: String, id: String, out: String) =
      rk.filter(col(rkCol) <= k)
        .groupBy(col(id))
        .agg(expr(s"aggregate(array_sort(collect_list(struct($rkCol, cos))), " +
          s"cast(0.0 as double), (a, x) -> a + x.cos)").as(out))
    rk.filter(col("rka") === 1)
      .join(rankedSum("rka", "a_id", "suma"), "a_id")
      .join(rankedSum("rkb", "b_id", "sumb"), "b_id")
      .withColumn("margin", col("cos") * lit(2.0 * k) / (col("suma") + col("sumb")))
      .withColumn("accepted", (col("margin") > lit(1.0)).cast("int"))
      .select(col("a_id"), col("b_id"), col("cos"), col("margin"), col("accepted"))
      .orderBy(col("a_id"))
  }

  // q135 — bitext mining between the label<5 and label>=5 halves of the
  // embedding table (standing in for source/target language encodings):
  // a fixed ~64-vector query batch (vec_id < 128 on the a-side — scale-
  // independent, the "shard of new documents" being aligned) is scored
  // against the WHOLE b-side. Scale shape: the query batch broadcasts,
  // the b-side corpus is scanned once and never shuffled at corpus
  // width — the pair frame (ids + cos only, 24 B/row) is what the two
  // rank windows exchange; at 100 TB the cross join is replaced by an
  // IVF/LSH candidate generator feeding the same marginTopPairs scorer.
  private def q135(s: SparkSession, d: String): DataFrame = {
    GraftFunctions.register(s)
    val e = embeddings(s, d)
    val qs = e.filter(col("label") < 5 && col("vec_id") < 128)
      .select(col("vec_id").as("a_id"), col("embedding").as("avec"))
    val tgt = e.filter(col("label") >= 5)
      .select(col("vec_id").as("b_id"), col("embedding").as("bvec"))
    val pairs = tgt.join(broadcast(qs))
      .withColumn("cos", expr("cosine_sim(avec, bvec)"))
      .select(col("a_id"), col("b_id"), col("cos"))
    marginTopPairs(pairs, MarginK)
  }

  private val q135Sql = {
    val fold = "(a, b) -> a + b"
    s"""WITH qs AS (SELECT vec_id AS a_id, embedding AS avec FROM embeddings
      |            WHERE label < 5 AND vec_id < 128),
      |tgt AS (SELECT vec_id AS b_id, embedding AS bvec FROM embeddings WHERE label >= 5),
      |p AS (SELECT a_id, b_id, ${cosSql("avec", "bvec")} AS cos FROM qs CROSS JOIN tgt),
      |rk AS (SELECT *,
      |    row_number() OVER (PARTITION BY a_id ORDER BY cos DESC, b_id) AS rka,
      |    row_number() OVER (PARTITION BY b_id ORDER BY cos DESC, a_id) AS rkb
      |  FROM p),
      |sa AS (SELECT a_id,
      |    list_reduce(list_prepend(0.0::DOUBLE, list(cos ORDER BY rka)), $fold) AS suma
      |  FROM rk WHERE rka <= $MarginK GROUP BY a_id),
      |sb AS (SELECT b_id,
      |    list_reduce(list_prepend(0.0::DOUBLE, list(cos ORDER BY rkb)), $fold) AS sumb
      |  FROM rk WHERE rkb <= $MarginK GROUP BY b_id)
      |SELECT rk.a_id, rk.b_id, rk.cos,
      |  rk.cos * ${2.0 * MarginK} / (suma + sumb) AS margin,
      |  CAST(rk.cos * ${2.0 * MarginK} / (suma + sumb) > 1.0 AS INT) AS accepted
      |FROM rk JOIN sa USING (a_id) JOIN sb USING (b_id)
      |WHERE rka = 1
      |ORDER BY a_id""".stripMargin
  }

  // q145 — label-centroid audit: per-label embedding centroids plus
  // the distribution of each member's dot product against its own
  // centroid — the "class purity" report that catches mislabeled or
  // drifted clusters before they poison contrastive training (the
  // same audit SemDeDup-style pipelines run on cluster assignments).
  // All arithmetic is the q41 fixed-point discipline: vectors quantize
  // to 2^20 longs (exact float→double widening, exponent-exact ×2^20,
  // round half-away-from-zero in both engines), per-dimension sums are
  // order-invariant int64, and the per-dim mean is integral division —
  // both Spark's DIV and DuckDB's integer // truncate toward zero, so
  // negative centroid dimensions agree bit-for-bit. Dots accumulate in
  // DECIMAL(38,0) so the per-label sum cannot wrap at corpus scale.
  //
  // Scale: one exploded pass builds the centroids (64·|labels| rows
  // out of the map-side combine); the centroid table is
  // labels-sized → broadcast; every member's dot is computed IN-ROW
  // (zip_with + aggregate, codegen'd), so the corpus is scanned twice
  // and shuffled only by the final labels-sized aggregation.
  /** Core: per-label centroid/purity stats. Fixture-testable. */
  private[graft] def labelCentroidAudit(e: DataFrame): DataFrame = {
    val eq = e.select(col("vec_id"), col("label"),
      transform(col("embedding"),
        x => round(x.cast("double") * FixScale).cast("long")).as("qv"))
    val cent = eq.select(col("label"), posexplode(col("qv")).as(Seq("pos", "q")))
      .groupBy(col("label"), col("pos"))
      .agg(sum(col("q")).as("sq"), count(lit(1)).as("n"))
      .withColumn("c", expr("sq DIV n"))
    val carr = cent.groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
          x => x.getField("c")).as("cvec"),
        first(col("n")).as("n_vecs"))
    val dots = eq.join(broadcast(carr.select(col("label"), col("cvec"))), "label")
      .select(col("label"),
        aggregate(zip_with(col("qv"), col("cvec"), (x, y) => x * y),
          lit(0L), (acc, x) => acc + x).as("dot"))
      .groupBy(col("label"))
      .agg(expr("CAST(sum(CAST(dot AS DECIMAL(38,0))) AS BIGINT)").as("sum_dot"),
        min(col("dot")).as("min_dot"), max(col("dot")).as("max_dot"))
    carr.join(dots, "label")
      .select(col("label").cast("long").as("label"), col("n_vecs"),
        aggregate(col("cvec"), lit(0L), (acc, x) => acc + x * x).as("centroid_norm2"),
        col("sum_dot"), col("min_dot"), col("max_dot"))
      .orderBy(col("label"))
  }

  private def q145(s: SparkSession, d: String): DataFrame =
    labelCentroidAudit(embeddings(s, d))

  private val q145Sql =
    s"""WITH q AS (
      |  SELECT vec_id, label,
      |    list_transform(embedding,
      |      x -> CAST(round(CAST(x AS DOUBLE) * $FixScale) AS BIGINT)) AS qv
      |  FROM embeddings),
      |cent AS (
      |  SELECT label, r.i AS pos, sum(qv[r.i + 1]) // count(*) AS c,
      |    count(*) AS n
      |  FROM q, range(64) r(i)
      |  GROUP BY label, r.i),
      |carr AS (
      |  SELECT label, list(c ORDER BY pos) AS cvec, max(n) AS n_vecs
      |  FROM cent GROUP BY label),
      |d AS (
      |  SELECT q.label,
      |    CAST(list_sum(list_transform(range(64),
      |      i -> qv[i + 1] * cvec[i + 1])) AS BIGINT) AS dot
      |  FROM q JOIN carr USING (label)),
      |ds AS (
      |  SELECT label, CAST(sum(dot) AS BIGINT) AS sum_dot,
      |    min(dot) AS min_dot, max(dot) AS max_dot
      |  FROM d GROUP BY label)
      |SELECT CAST(carr.label AS BIGINT) AS label, n_vecs,
      |  CAST(list_sum(list_transform(cvec, x -> x * x)) AS BIGINT)
      |    AS centroid_norm2,
      |  sum_dot, min_dot, max_dot
      |FROM carr JOIN ds USING (label)
      |ORDER BY label""".stripMargin

  // q166 — embedding-matrix health: per-dimension count, mean,
  // variance, and absolute range of the whole embedding table — the
  // ML-observability audit that catches dead dimensions (a projection
  // that collapsed to ~0 everywhere), scale drift between ingest
  // batches, and un-normalized columns before they poison ANN recall.
  // Values enter fixed point as trunc(v·2^20) — a power-of-two scale,
  // so the float→fixed step is EXACT (only the exponent changes) and
  // identical across engines; moments then follow the q160 sufficient-
  // statistics discipline (DECIMAL(38,0) sums, integer DIV, variance
  // emitted as (n·Σq²−(Σq)²) DIV n² so the output fits a BIGINT at any
  // corpus size). One posexplode scan, 64 grouped rows, map-side
  // combined.
  private val DimDeadMax = 1024L // |v| < 2^-10 everywhere => dead

  private def q166(s: SparkSession, d: String): DataFrame =
    embeddings(s, d)
      .select(posexplode(col("embedding")).as(Seq("dim", "v")))
      .select(col("dim").cast("long").as("dim"),
        expr("CAST(CAST(v AS DOUBLE) * 1048576 AS BIGINT)").as("q"))
      .groupBy(col("dim")).agg(
        count(lit(1)).as("n_vecs"),
        sum(col("q")).as("sq"),
        sum((col("q") * col("q")).cast(DecimalType(38, 0))).as("sqq"),
        max(abs(col("q"))).as("maxabs_fp"))
      .select(col("dim"), col("n_vecs"),
        expr("sq DIV n_vecs").as("mean_fp"),
        expr(s"""CAST((CAST(n_vecs AS DECIMAL(38,0)) * sqq
                |  - CAST(sq AS DECIMAL(38,0)) * sq)
                |  DIV (CAST(n_vecs AS DECIMAL(38,0)) * n_vecs) AS BIGINT)"""
          .stripMargin).as("var_fp2"),
        col("maxabs_fp"),
        (col("maxabs_fp") < DimDeadMax).as("is_dead"))
      .orderBy(col("dim"))

  private val q166Sql =
    s"""WITH q AS (
      |  SELECT i.i AS dim,
      |    CAST(trunc(CAST(embedding[i.i + 1] AS DOUBLE) * 1048576) AS BIGINT)
      |      AS q
      |  FROM embeddings, (SELECT unnest(range(64)) AS i) i),
      |a AS (
      |  SELECT dim, count(*) AS n_vecs, sum(q) AS sq, sum(q * q) AS sqq,
      |    max(abs(q)) AS maxabs_fp
      |  FROM q GROUP BY dim)
      |SELECT dim, n_vecs, CAST(sq // n_vecs AS BIGINT) AS mean_fp,
      |  CAST((n_vecs * sqq - sq * sq) // (n_vecs * n_vecs) AS BIGINT)
      |    AS var_fp2,
      |  maxabs_fp, maxabs_fp < $DimDeadMax AS is_dead
      |FROM a ORDER BY dim""".stripMargin

  // q183 — embedding-centroid drift between corpus halves (vec_id
  // parity as the batch proxy; production compares embedder version N
  // to N−1 or crawl batch to crawl batch): per label, the exact
  // fixed-point L2 between the two halves' centroids plus the worst
  // single dimension — the embedding-pipeline regression gate that
  // catches a silently retrained/renormalized encoder before it
  // poisons ANN recall (q176 plays this role for quality scores;
  // this is the vector-space analogue). Arithmetic is the q145
  // centroid recipe: components quantize to 2^20 fixed-point longs,
  // centroid components are integer DIV of 64-bit-exact sums (Spark
  // DIV and DuckDB // both truncate toward zero, so negative
  // components agree), and the distance is exact integer math — at
  // most 64·(2^21)² ≈ 2^48, no overflow.
  //
  // Scale shape: one posexplode scan into a (label × half × 64)-row
  // aggregate (map-side combined); everything downstream is
  // codebook-sized. Nothing corpus-shaped shuffles or broadcasts.
  private def q183(s: SparkSession, d: String): DataFrame = {
    val q = embeddings(s, d)
      .select(col("label").cast("long").as("label"),
        pmod(col("vec_id"), lit(2)).as("half"),
        posexplode(col("embedding")).as(Seq("pos", "v")))
      .select(col("label"), col("half"), col("pos"),
        expr(s"CAST(round(CAST(v AS DOUBLE) * $FixScale) AS BIGINT)").as("q"))
    val cent = q.groupBy(col("label"), col("half"), col("pos"))
      .agg(sum(col("q")).as("sq"), count(lit(1)).as("cnt"))
      .select(col("label"), col("half"), col("pos"),
        expr("sq DIV cnt").as("m"), col("cnt"))
    val a = cent.filter(col("half") === 0)
      .select(col("label"), col("pos"), col("m").as("ma"), col("cnt").as("na"))
    val b = cent.filter(col("half") === 1)
      .select(col("label"), col("pos"), col("m").as("mb"), col("cnt").as("nb"))
    a.join(b, Seq("label", "pos"))
      .groupBy(col("label"))
      .agg(max(col("na")).as("n_a"), max(col("nb")).as("n_b"),
        sum((col("ma") - col("mb")) * (col("ma") - col("mb"))).as("dist2_fp2"),
        max(abs(col("ma") - col("mb"))).as("maxdim_fp"))
      .orderBy(col("label"))
  }

  private val q183Sql =
    s"""WITH q AS (
      |  SELECT CAST(label AS BIGINT) AS label, vec_id % 2 AS half,
      |    r.i AS pos,
      |    CAST(round(CAST(embedding[r.i + 1] AS DOUBLE) * $FixScale)
      |      AS BIGINT) AS q
      |  FROM embeddings, range(64) r(i)),
      |c AS (
      |  SELECT label, half, pos, sum(q) // count(*) AS m, count(*) AS cnt
      |  FROM q GROUP BY label, half, pos)
      |SELECT a.label, CAST(max(a.cnt) AS BIGINT) AS n_a,
      |  CAST(max(b.cnt) AS BIGINT) AS n_b,
      |  CAST(sum((a.m - b.m) * (a.m - b.m)) AS BIGINT) AS dist2_fp2,
      |  CAST(max(abs(a.m - b.m)) AS BIGINT) AS maxdim_fp
      |FROM (SELECT * FROM c WHERE half = 0) a
      |JOIN (SELECT * FROM c WHERE half = 1) b
      |  ON a.label = b.label AND a.pos = b.pos
      |GROUP BY a.label ORDER BY a.label""".stripMargin


  // q171 — retrieval EVALUATION as a first-class query: MRR and
  // recall@5 of cosine search against label ground truth, for query
  // vectors 0..9 — the metrics harness every embedding-search change
  // ships behind. The rank of the first relevant hit is computed
  // WITHOUT ranking the corpus: it equals 1 + |candidates strictly
  // better than the best relevant one| — an argmax plus a conditional
  // count, both plain aggregates — and the top-5 cut plans through the
  // bounded-heap TopK operator (the row_number<=k rewrite), so nothing
  // corpus-sized ever sits in one window partition. The oracle states
  // the naive full ranking; the two derivations agree because the
  // (cos desc, vec_id) order is total. Metrics ship in 2^20 fixed
  // point (rank arithmetic only — the only floats compared are raw
  // cosine values inside max/argmax).
  private def q171(s: SparkSession, d: String): DataFrame = {
    GraftFunctions.register(s)
    val e = embeddings(s, d)
    val qs = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"),
        col("label").as("qlabel"))
    val scored = e.join(broadcast(qs), col("vec_id") =!= col("query_id"))
      .withColumn("cos", expr("cosine_sim(qvec, embedding)"))
      .select(col("query_id"), col("qlabel"), col("vec_id"), col("label"),
        col("cos"))
      .repartition(col("query_id")) // one materialization, three consumers
      .localCheckpoint()
    val best = scored.filter(col("label") === col("qlabel"))
      .groupBy(col("query_id"))
      .agg(max(struct(col("cos"), (-col("vec_id")).as("nv"))).as("b"),
        count(lit(1)).as("n_rel"))
      .select(col("query_id"), col("n_rel"), col("b.cos").as("bcos"),
        (-col("b.nv")).as("bvid"))
    val better = scored.join(broadcast(best), Seq("query_id"))
      .filter(col("cos") > col("bcos") ||
        (col("cos") === col("bcos") && col("vec_id") < col("bvid")))
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_better"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    val rel5 = scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .filter(col("label") === col("qlabel"))
      .groupBy(col("query_id")).agg(count(lit(1)).as("rel5"))
    best.join(better, Seq("query_id"), "left")
      .join(rel5, Seq("query_id"), "left")
      .select(col("query_id"), col("n_rel"),
        (coalesce(col("n_better"), lit(0L)) + 1).as("first_rel_rank"),
        expr("1048576 DIV (coalesce(n_better, 0L) + 1)").as("rr_fp"),
        coalesce(col("rel5"), lit(0L)).as("rel5"),
        expr("coalesce(rel5, 0L) * 1048576 DIV least(5L, n_rel)")
          .as("recall5_fp"))
      .orderBy(col("query_id"))
  }

  private val q171Sql =
    s"""WITH qs AS (
      |  SELECT vec_id AS query_id, embedding AS qvec, label AS qlabel
      |  FROM embeddings WHERE vec_id < 10),
      |sc AS (
      |  SELECT query_id, qlabel, e.vec_id, e.label,
      |    ${cosSql("qvec", "e.embedding")} AS cos
      |  FROM embeddings e JOIN qs ON e.vec_id <> qs.query_id),
      |r AS (
      |  SELECT *, row_number() OVER (PARTITION BY query_id
      |    ORDER BY cos DESC, vec_id) AS rk FROM sc),
      |rel AS (
      |  SELECT query_id, count(*) AS n_rel, min(rk) AS frr
      |  FROM r WHERE label = qlabel GROUP BY query_id),
      |r5 AS (
      |  SELECT query_id, count(*) AS rel5
      |  FROM r WHERE rk <= 5 AND label = qlabel GROUP BY query_id)
      |SELECT query_id, n_rel, CAST(frr AS BIGINT) AS first_rel_rank,
      |  CAST(1048576 // frr AS BIGINT) AS rr_fp,
      |  CAST(coalesce(rel5, 0) AS BIGINT) AS rel5,
      |  CAST(coalesce(rel5, 0) * 1048576 // least(5, n_rel) AS BIGINT)
      |    AS recall5_fp
      |FROM rel LEFT JOIN r5 USING (query_id)
      |ORDER BY query_id""".stripMargin

  /** Power-iteration rounds for q212. */
  val PowerIters = 3

  // q212 — distributed power iteration: the dominant eigenvector of
  // the (uncentered) embedding second-moment matrix A = Σ x·xᵀ — the
  // first principal direction, the statistic behind "is the embedding
  // space collapsing onto one axis" (anisotropy) audits and
  // PCA-whitening decisions. The 64×64 matrix is NEVER materialized:
  // each round is two matvec passes expressed on the rows —
  // s_x = ⟨q_x, v⟩ per vector (v broadcast as one 64-long array,
  // folded inside codegen), then u_j = Σ_x q_xj·s_x (a 64-group
  // aggregate, map-side combined) — followed by an max-abs
  // renormalization to the 2^20 grid. All arithmetic is exact
  // integers: vectors quantize once to the FixScale grid (the q41
  // round()-ties-away-from-zero contract), per-term products stage
  // through DECIMAL(38,0)/HUGEINT (q_j·s is O(2^66) already at these
  // norms), and DIV truncates toward zero identically in both
  // engines — so three rounds land on bit-identical fixed-point
  // components, sign pinned by the all-ones start vector. The oracle
  // unrolls the same three rounds as chained CTEs.
  //
  // Scale shape: K rounds × one scan each (the quantized frame is
  // re-derived from the parquet scan per round — nothing corpus-sized
  // is cached or shuffled); per round the shuffle carries 64 partial
  // sums per map task and the broadcasts are one 64-element array and
  // one 1-row max. This is how a first PC is computed at 100 TB:
  // matvec-as-aggregate, eigvec state broadcast.
  /** Quantized embedding frame (vec_id, qv: array<long> on the
    * FixScale grid) — the shared input of the q212/q213 family.
    */
  private def quantized(s: SparkSession, d: String): DataFrame =
    embeddings(s, d).select(col("vec_id"),
      transform(col("embedding"),
        x => round(x.cast("double") * FixScale).cast("long")).as("qv"))

  /** [[PowerIters]] rounds of exact fixed-point power iteration over
    * the quantized frame; returns the 1-row (varr: array<long>) frame.
    */
  private def powerVec(qv: DataFrame): DataFrame = {
    var varr = qv.sparkSession.range(1).select(
      expr(s"array_repeat(CAST($FixScale AS BIGINT), 64)").as("varr"))
    for (_ <- 1 to PowerIters) {
      val sx = qv.crossJoin(broadcast(varr))
        .select(col("qv"), expr(
          "aggregate(zip_with(qv, varr, (a, b) -> a * b), 0L, (acc, x) -> acc + x)")
          .as("s"))
      val u = sx.select(posexplode(col("qv")).as(Seq("j", "qj")), col("s"))
        .groupBy(col("j"))
        .agg(sum(col("qj").cast(DecimalType(38, 0)) * col("s")).as("u"))
      val m = u.agg(max(abs(col("u"))).as("m"))
      // 1-row checkpoint per round: without it every downstream
      // reference re-plans the whole preceding chain (q213 planned 58
      // exchanges; with per-round materialization each round scans the
      // corpus exactly once)
      varr = u.crossJoin(broadcast(m))
        .select(col("j"), expr(s"CAST(u * $FixScale DIV m AS BIGINT)").as("v"))
        .agg(expr("transform(array_sort(collect_list(struct(j, v))), x -> x.v)")
          .as("varr"))
        .localCheckpoint(false)
    }
    varr
  }

  private def q212(s: SparkSession, d: String): DataFrame =
    powerVec(quantized(s, d))
      .select(posexplode(col("varr")).as(Seq("dim", "v_fp")))
      .select(col("dim"), col("v_fp"))
      .orderBy(col("dim"))

  // q213 — anisotropy audit: how much of the embedding cloud's total
  // second moment lives along the q212 dominant direction?
  // λ1 = vᵀAv / vᵀv (Rayleigh quotient at the converged v, exact
  // integer: Σ⟨q,v⟩² DIV Σv²) against trace(A) = Σ‖q‖², reported as
  // anisotropy_fp = λ1·2^20 DIV trace. A share near 2^20 means the
  // space has collapsed onto one axis (the known representation-
  // degeneration failure that breaks cosine retrieval); an isotropic
  // 64-dim cloud sits near 2^20/64. The two-step DIV keeps every
  // intermediate inside DECIMAL(38,0)/HUGEINT at any corpus size, at
  // identical (deterministic) truncation in both engines.
  //
  // Scale shape: the q212 rounds plus two more single-scan aggregates
  // (Σ⟨q,v⟩² with v broadcast; Σ‖q‖² scan-side) — K+2 scans total,
  // nothing corpus-sized shuffles.
  private def q213(s: SparkSession, d: String): DataFrame = {
    val qv = quantized(s, d)
    val varr = powerVec(qv)
    val vv = varr.select(expr(
      "aggregate(transform(varr, v -> v * v), 0L, (acc, x) -> acc + x)").as("vv"))
    val sx = qv.crossJoin(broadcast(varr))
      .select(expr(
        "aggregate(zip_with(qv, varr, (a, b) -> a * b), 0L, (acc, x) -> acc + x)")
        .as("s"))
    val a = sx.agg(count(lit(1)).as("n_vecs"),
      sum(col("s").cast(DecimalType(38, 0)) * col("s")).as("ss"))
    val tr = qv.select(explode(col("qv")).as("q"))
      .agg(sum(col("q").cast(DecimalType(38, 0)) * col("q")).as("tr"))
    a.crossJoin(broadcast(vv)).crossJoin(broadcast(tr))
      .select(col("n_vecs"),
        expr("CAST(ss DIV vv AS BIGINT)").as("lambda1_scaled"),
        expr("CAST(tr AS BIGINT)").as("trace_scaled"),
        // Spark `div` yields BIGINT even on DECIMAL inputs — re-stage
        // through DECIMAL(38,0) before the ×2^20 (matches HUGEINT oracle)
        expr(s"CAST(CAST(ss DIV vv AS DECIMAL(38,0)) * $FixScale DIV tr AS BIGINT)")
          .as("anisotropy_fp"))
  }

  /** Shared CTE chain for q212/q213: quantize, then [[PowerIters]]
    * unrolled rounds ending in the 1-row `v3` vector.
    */
  private val powerCtes = {
    def round_(k: Int) =
      s"""s$k AS (
         |  SELECT vec_id, list_reduce(list_transform(range(64),
         |    i -> qd.qv[i+1] * v${k - 1}.v[i+1]), (x, y) -> x + y) AS s
         |  FROM qd, v${k - 1}),
         |u$k AS (
         |  SELECT j, sum(CAST(qd.qv[j+1] AS HUGEINT) * s$k.s) AS u
         |  FROM qd JOIN s$k USING (vec_id), unnest(range(64)) t(j)
         |  GROUP BY j),
         |v$k AS (
         |  SELECT list(CAST(u * $FixScale
         |      // (SELECT max(abs(u)) FROM u$k) AS BIGINT) ORDER BY j) AS v
         |  FROM u$k)""".stripMargin
    s"""qd AS (
      |  SELECT vec_id, list_transform(embedding,
      |    x -> CAST(round(CAST(x AS DOUBLE) * $FixScale) AS BIGINT)) AS qv
      |  FROM embeddings),
      |v0 AS (SELECT list_transform(range(64),
      |  j -> CAST($FixScale AS BIGINT)) AS v),
      |${round_(1)},
      |${round_(2)},
      |${round_(3)}""".stripMargin
  }

  private val q212Sql =
    s"""WITH $powerCtes
      |SELECT CAST(j AS INT) AS dim, v[j+1] AS v_fp
      |FROM v3, unnest(range(64)) t(j)
      |ORDER BY dim""".stripMargin

  private val q213Sql =
    s"""WITH $powerCtes,
      |vv AS (
      |  SELECT list_reduce(list_transform(range(64), i -> v[i+1] * v[i+1]),
      |    (x, y) -> x + y) AS vv
      |  FROM v3),
      |sx AS (
      |  SELECT list_reduce(list_transform(range(64),
      |    i -> qd.qv[i+1] * v3.v[i+1]), (x, y) -> x + y) AS s
      |  FROM qd, v3),
      |a AS (
      |  SELECT count(*) AS n_vecs, sum(CAST(s AS HUGEINT) * s) AS ss
      |  FROM sx),
      |tr AS (
      |  SELECT sum(CAST(q AS HUGEINT) * q) AS tr
      |  FROM (SELECT unnest(qv) AS q FROM qd))
      |SELECT n_vecs,
      |  CAST(ss // vv AS BIGINT) AS lambda1_scaled,
      |  CAST(tr AS BIGINT) AS trace_scaled,
      |  CAST((ss // vv) * $FixScale // tr AS BIGINT) AS anisotropy_fp
      |FROM a, vv, tr""".stripMargin

  /** q265 constants — eval-set bound, K of the K-NN utility, fixed
    * point scale, and the released top-N. The eval set is SMALL BY
    * CONSTRUCTION (an eval set is curated, not scraped), which is what
    * bounds the crossJoin fan-out to |eval| × corpus.
    */
  val SvTestIds = 8L
  val SvK = 5
  val SvTopN = 100

  // q265 — KNN-Shapley data valuation (Jia et al., VLDB 2019,
  // "Efficient Task-Specific Data Valuation for Nearest Neighbor
  // Algorithms"): the EXACT Shapley value of every training vector for
  // a K-NN classifier's accuracy on a small eval set, via the
  // closed-form O(n log n) recursion instead of the 2^n definition:
  // with train points sorted by similarity to a test point
  // (α_1 nearest), s_{α_n} = 1[y_{α_n}=y]/n and
  // s_{α_j} = s_{α_{j+1}} + (1[y_{α_j}=y] − 1[y_{α_{j+1}}=y])
  //           · min(K,j)/(K·j).
  // Data valuation is the curation question the dedup/quality gates
  // can't answer — WHICH examples actually help the model — and
  // KNN-Shapley is its published tractable estimator. Summed over the
  // eval set, the top-N most valuable points are released.
  //
  // Fixed point: every division has nonnegative operands (the
  // recursion term is split into its two indicator halves, each
  // truncating-DIV'd separately, then subtracted), so trunc-vs-floor
  // can never diverge between the engines; cosine is the ordered-fold
  // double of q40 (bit-identical in DuckDB's list_reduce form).
  //
  // Scale shape: the corpus-sized work is the |eval| × corpus distance
  // pass (a broadcast of the 8-row eval frame — the q40 pattern) and
  // the per-test global sort, which runs through rankDistributed
  // (range exchange + carry, never a single-task per-test window);
  // the suffix sums run through the generic ops.PrefixSum carry
  // pattern in rank-desc order. The neighbor-successor indicator
  // comes from an equi-join on (test_id, rk+1) — the q262 adjacency
  // rule — not a lead() window. Final top-N is TakeOrdered.
  /** The KNN-Shapley recursion over a scored frame (test_id, vec_id,
    * label, cos, ind) — extracted so ShapleySpec can drive it with a
    * fixture and pin it against both a sequential fold of the same
    * fixed-point recurrence AND the 2^n Shapley definition. Returns
    * per (vec_id, label) the summed sv_fp.
    */
  private[graft] def knnShapleyOf(scored: DataFrame, k: Int): DataFrame = {
    val S = 1048576L
    // per-test cardinality n rides on the ranked rows as a column (r18
    // fused operator; for a dense 1..n rank, count ≡ max(rk)) — no
    // separate aggregate + broadcast join
    val ranked = Sampling.rankDistributedWithCounts(scored,
        Seq("test_id"), Seq(col("cos").desc, col("vec_id")), "n")
      .select(col("test_id"), col("vec_id"), col("label"), col("rk"),
        col("ind"), col("n"))
      .localCheckpoint()
    val nxt = ranked.select(col("test_id"), (col("rk") - 1).as("rk"),
      col("ind").as("ind1"))
    val contrib = ranked.join(nxt, Seq("test_id", "rk"), "left")
      .withColumn("c", when(col("rk") === col("n"),
          expr(s"ind * $S DIV n"))
        .otherwise(expr(
          s"ind * $S * least($k, rk) DIV ($k * rk)" +
            s" - ind1 * $S * least($k, rk) DIV ($k * rk)")))
    graft.ops.PrefixSum.prefixSum(contrib,
        Seq("test_id"), Seq(col("rk").desc), col("c"))
      .groupBy(col("vec_id"), col("label"))
      .agg(sum(col("cum")).as("sv_fp"))
  }

  private def q265(s: SparkSession, d: String): DataFrame = {
    GraftFunctions.register(s)
    val e = embeddings(s, d)
    val tests = e.filter(col("vec_id") < SvTestIds)
      .select(col("vec_id").as("test_id"), col("embedding").as("tvec"),
        col("label").as("tlabel"))
    val train = e.filter(col("vec_id") >= SvTestIds)
    val scored = train.crossJoin(broadcast(tests))
      .select(col("test_id"), col("vec_id"), col("label"),
        expr("cosine_sim(tvec, embedding)").as("cos"),
        when(col("label") === col("tlabel"), 1L).otherwise(0L).as("ind"))
    knnShapleyOf(scored, SvK)
      .orderBy(col("sv_fp").desc, col("vec_id"))
      .limit(SvTopN)
      .orderBy(col("sv_fp").desc, col("vec_id"))
  }

  private val q265Sql =
    s"""WITH tests AS (
      |  SELECT vec_id AS test_id, embedding AS tvec, label AS tlabel
      |  FROM embeddings WHERE vec_id < $SvTestIds),
      |train AS (
      |  SELECT vec_id, embedding, label FROM embeddings
      |  WHERE vec_id >= $SvTestIds),
      |scored AS (
      |  SELECT t.test_id, e.vec_id, e.label,
      |    ${cosSql("t.tvec", "e.embedding")} AS cos,
      |    CASE WHEN e.label = t.tlabel THEN 1 ELSE 0 END AS ind
      |  FROM train e CROSS JOIN tests t),
      |ranked AS (
      |  SELECT *, row_number() OVER (
      |      PARTITION BY test_id ORDER BY cos DESC, vec_id) AS rk,
      |    count(*) OVER (PARTITION BY test_id) AS n
      |  FROM scored),
      |nxt AS (
      |  SELECT r.*, lead(ind) OVER (
      |      PARTITION BY test_id ORDER BY rk) AS ind1
      |  FROM ranked r),
      |contrib AS (
      |  SELECT test_id, vec_id, label, rk,
      |    CASE WHEN rk = n THEN ind * 1048576 // n
      |    ELSE ind * 1048576 * least($SvK, rk) // ($SvK * rk)
      |      - ind1 * 1048576 * least($SvK, rk) // ($SvK * rk) END AS c
      |  FROM nxt),
      |sv AS (
      |  SELECT test_id, vec_id, label, sum(c) OVER (
      |    PARTITION BY test_id ORDER BY rk DESC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
      |  FROM contrib)
      |SELECT vec_id, label, CAST(sum(s) AS BIGINT) AS sv_fp
      |FROM sv GROUP BY 1, 2
      |ORDER BY sv_fp DESC, vec_id
      |LIMIT $SvTopN""".stripMargin

  /** q268 — truncation prefix dims audited against the full 64. */
  val TruncDims = Seq(8, 16, 32)

  // q268 — embedding dimension-truncation retrieval audit (the
  // Matryoshka question, Kusupati et al. 2022: how many leading
  // dimensions does retrieval actually need?): for each query vector,
  // top-5 by cosine over the first-d prefix (d ∈ 8/16/32) compared to
  // the full-64 top-5; emitted per (d, query) as overlap@5 and its
  // fixed-point recall. This is the audit run before shipping
  // truncated embeddings to a serving tier — q74 measures QUANT error
  // per vector, this measures what truncation does to the RANKING.
  //
  // One |queries|×corpus pass computes all four cosines (slice() +
  // the codegen cosine_sim — prefix norms are genuinely different
  // norms, not rescaled full ones), localCheckpointed once; each dim's
  // top-5 is a rank-filter the injected rewrite turns into the
  // bounded-heap TopK operator (the q40 pattern — no full sort). The
  // overlap join is 4 tiny top-5 frames.
  private def q268(s: SparkSession, d: String): DataFrame = {
    GraftFunctions.register(s)
    val e = embeddings(s, d)
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val scored = e.filter(col("vec_id") >= 5).crossJoin(broadcast(q))
      .select(Seq(col("query_id"), col("vec_id")) ++
        (TruncDims :+ 64).map(k => expr(
          s"cosine_sim(slice(qvec, 1, $k), slice(embedding, 1, $k))")
          .as(s"cos$k")): _*)
      .localCheckpoint()
    def top5(k: Int): DataFrame = {
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col(s"cos$k").desc, col("vec_id"))
      scored.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .select(lit(k.toLong).as("dim"), col("query_id"), col("vec_id"))
    }
    // left join, not semi: a (dim, query) with ZERO overlap must still
    // emit its row — that's the failing case the audit exists to catch
    val full = top5(64).select(col("query_id"), col("vec_id"),
      lit(1L).as("hit"))
    TruncDims.map(top5).reduce(_ unionAll _)
      .join(full, Seq("query_id", "vec_id"), "left")
      .groupBy(col("dim"), col("query_id"))
      .agg(sum(coalesce(col("hit"), lit(0L))).as("n_overlap"))
      .select(col("dim"), col("query_id"), col("n_overlap"),
        expr("CAST(n_overlap * 1048576 DIV 5 AS BIGINT)").as("recall_fp"))
      .orderBy(col("dim"), col("query_id"))
  }

  private val q268Sql = {
    def cosK(k: Int) = {
      def dot(u: String, v: String) =
        s"list_reduce(list_transform(range($k), i -> CAST($u[i+1] AS DOUBLE) * CAST($v[i+1] AS DOUBLE)), (x, y) -> x + y)"
      s"(${dot("q.qvec", "e.embedding")} / (sqrt(${dot("q.qvec", "q.qvec")}) * sqrt(${dot("e.embedding", "e.embedding")})))"
    }
    def topCte(k: Int) =
      s"""t$k AS (
        |  SELECT query_id, vec_id FROM (
        |    SELECT q.query_id, e.vec_id, row_number() OVER (
        |      PARTITION BY q.query_id
        |      ORDER BY ${cosK(k)} DESC, e.vec_id) AS rk
        |    FROM corpus e CROSS JOIN queries q) WHERE rk <= 5)""".stripMargin
    s"""WITH queries AS (
      |  SELECT vec_id AS query_id, embedding AS qvec
      |  FROM embeddings WHERE vec_id < 5),
      |corpus AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 5),
      |${(TruncDims :+ 64).map(topCte).mkString(",\n")}
      |SELECT dim, t.query_id,
      |  CAST(count(f.vec_id) AS BIGINT) AS n_overlap,
      |  CAST(count(f.vec_id) * 1048576 // 5 AS BIGINT) AS recall_fp
      |FROM (${TruncDims.map(k => s"SELECT CAST($k AS BIGINT) AS dim, * FROM t$k")
           .mkString(" UNION ALL ")}) t
      |LEFT JOIN t64 f ON f.query_id = t.query_id AND f.vec_id = t.vec_id
      |GROUP BY 1, 2
      |ORDER BY dim, t.query_id""".stripMargin
  }

  /** q270 retrain thresholds, 2^20 fixed point: occupancy TVD > 0.15,
    * mean assigned-cosine drop > 0.02, or one cell holding > 1/2 of
    * current traffic.
    */
  val DriftTvdFp = 157286L
  val DriftDistFp = 20972L
  val DriftShareFp = 524288L
  /** q270 codebooks: (name, prefix dims) — the full-dim q41 codebook
    * and the 16-dim truncated serving tier q268 audits.
    */
  val DriftBooks = Seq(("ivf_d16", 16), ("ivf_d64", 64))

  // q270 — ANN codebook DRIFT MONITOR (capability gap named by the
  // round-12 verdict: q41/q101 codebooks are static and
  // streamingIvfAssign assigns against them forever — nothing decided
  // WHEN a codebook must be retrained). For each serving codebook
  // (full-64 and the 16-dim truncated tier), train it on the reference
  // epoch (vec_id parity half 0 — the q183 epoch proxy; production
  // compares training crawl to current traffic), assign BOTH epochs,
  // and composes the two drift signals into a retrain/keep
  // recommendation per codebook (the q167 advisor pattern):
  //  - cell-occupancy TVD between the epochs' assignment histograms
  //    (q176's exact-integer TVD discipline — n_a·N_b − n_b·N_a cross
  //    products staged in DECIMAL(38,0) so no user count can overflow);
  //  - current-epoch top-cell share (q132's skew alarm — a codebook
  //    whose traffic collapses into one cell has stopped partitioning
  //    the space, whatever the TVD says);
  //  - assignment-distortion drift: mean assigned-cosine per epoch in
  //    2^20 fixed point; a drop means current vectors sit farther from
  //    every centroid — the quantizer no longer spans the data.
  // Scale shape: training is q41's (corpus scan per iteration, all
  // centroid structures broadcast); the monitor itself adds ONE extra
  // full-corpus assignment pass and everything downstream is
  // cells-sized. Nothing corpus-shaped shuffles beyond the N-row
  // argmax aggregates.
  private[graft] def codebookDriftOf(emb: DataFrame, cellsN: Int,
      itersN: Int): DataFrame = {
    val rows = DriftBooks.map { case (name, dim) =>
      val base =
        if (dim == 64) emb.select(col("vec_id"), col("embedding"))
        else emb.select(col("vec_id"),
          slice(col("embedding"), 1, dim).as("embedding"))
      val eq = base.select(col("vec_id"), col("embedding"),
        transform(col("embedding"),
          x => round(x.cast("double") * FixScale).cast("long")).as("qv"),
        pmod(col("vec_id"), lit(2)).as("half"))
      val ref = eq.filter(col("half") === 0)
      // seed like q41: the first cellsN reference vectors (even ids)
      val init = ref.filter(col("vec_id") < 2L * cellsN)
        .select(expr("CAST(vec_id DIV 2 AS INT)").as("cell"),
          transform(col("qv"),
            q => (q.cast("double") / FixScale.toDouble).cast("float")).as("cvec"))
      val cents = ivfTrainOn(ref.select("vec_id", "embedding", "qv"), init, itersN)
      // one assignment pass over BOTH epochs; the max_by carries the
      // WINNING cell's cosine along with it (a bare first(ccos) would
      // pick an arbitrary candidate's), kept in fixed point (round()
      // ties away-from-zero in both engines)
      val asg = eq.join(broadcast(cents))
        .withColumn("ccos", expr("cosine_sim(embedding, cvec)"))
        .groupBy(col("vec_id"))
        .agg(max_by(struct(col("cell"), col("ccos")),
            struct(col("ccos"), (-col("cell")).as("nc"))).as("a"),
          first(col("half")).as("half"))
        .select(col("half"), col("a.cell").as("cell"),
          expr(s"CAST(round(CAST(a.ccos AS DOUBLE) * $FixScale) AS BIGINT)").as("qcos"))
        .localCheckpoint() // cells + totals both read it; train plan ends here
      val cells = asg.groupBy(col("cell"))
        .agg(sum(when(col("half") === 0, 1L).otherwise(0L)).as("n_a"),
          sum(when(col("half") === 1, 1L).otherwise(0L)).as("n_b"))
      val tot = asg.agg(
        sum(when(col("half") === 0, 1L).otherwise(0L)).as("na_tot"),
        sum(when(col("half") === 1, 1L).otherwise(0L)).as("nb_tot"),
        sum(when(col("half") === 0, col("qcos")).otherwise(0L)).as("sqa"),
        sum(when(col("half") === 1, col("qcos")).otherwise(0L)).as("sqb"))
      cells.crossJoin(broadcast(tot))
        .agg(
          max(col("na_tot")).as("n_ref"), max(col("nb_tot")).as("n_cur"),
          // DECIMAL(38,0) staging before the cross multiply (the
          // Signals convention): n·N products cannot overflow BIGINT²
          sum(abs(col("n_a").cast(DecimalType(38, 0)) * col("nb_tot") -
            col("n_b").cast(DecimalType(38, 0)) * col("na_tot"))).as("sabs"),
          max(col("n_b")).as("max_b"),
          max(col("sqa")).as("sqa"), max(col("sqb")).as("sqb"))
        .select(lit(name).as("codebook"), col("n_ref"), col("n_cur"),
          expr(s"CAST((sabs * $FixScale) DIV " +
            "(2 * CAST(n_ref AS DECIMAL(38,0)) * n_cur) AS BIGINT)").as("occ_tvd_fp"),
          expr(s"(max_b * $FixScale) DIV n_cur").as("top_share_fp"),
          expr("sqa DIV n_ref").as("dist_ref_fp"),
          expr("sqb DIV n_cur").as("dist_cur_fp"))
        .withColumn("dist_drop_fp", col("dist_ref_fp") - col("dist_cur_fp"))
        .withColumn("action",
          when(col("occ_tvd_fp") > DriftTvdFp ||
            col("dist_drop_fp") > DriftDistFp ||
            col("top_share_fp") > DriftShareFp, lit("retrain"))
            .otherwise(lit("keep")))
    }
    rows.reduce(_ unionAll _).orderBy(col("codebook"))
  }

  private def q270(s: SparkSession, d: String): DataFrame = {
    GraftFunctions.register(s)
    codebookDriftOf(embeddings(s, d), IvfCells, IvfIters)
  }

  private val q270Sql = {
    def cosD(a: String, b: String, dim: Int) = {
      def dot(u: String, v: String) =
        s"list_reduce(list_transform(range($dim), i -> CAST($u[i+1] AS DOUBLE) * CAST($v[i+1] AS DOUBLE)), (x, y) -> x + y)"
      s"(${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)})))"
    }
    def kmIterD(dim: Int)(prevC: String, aName: String, cName: String) =
      s"""$aName AS (
        |  SELECT cell, qv FROM (
        |    SELECT e.vec_id, c.cell, e.qv,
        |      row_number() OVER (PARTITION BY e.vec_id
        |        ORDER BY ${cosD("e.embedding", "c.cvec", dim)} DESC, c.cell) AS crk
        |    FROM ref_$dim e CROSS JOIN $prevC c) t
        |  WHERE crk = 1),
        |$cName AS (
        |  SELECT cell, list(m ORDER BY pos) AS cvec FROM (
        |    SELECT cell, pos,
        |      CAST(CAST(sum(q) AS DOUBLE) /
        |        (CAST(count(*) AS DOUBLE) * $FixScale.0) AS REAL) AS m
        |    FROM (SELECT cell, r.i AS pos, qv[r.i + 1] AS q
        |          FROM $aName, range($dim) r(i)) x
        |    GROUP BY cell, pos) y
        |  GROUP BY cell)""".stripMargin
    def bookCtes(name: String, dim: Int) = {
      val sliced = if (dim == 64) "embedding" else s"embedding[1:$dim]"
      val iters = (1 to IvfIters)
        .map(k => kmIterD(dim)(s"c${k - 1}_$dim", s"a${k}_$dim", s"c${k}_$dim"))
        .mkString(",\n")
      s"""eq_$dim AS (
        |  SELECT vec_id, vec_id % 2 AS half, $sliced AS embedding,
        |    list_transform($sliced,
        |      x -> CAST(round(CAST(x AS DOUBLE) * $FixScale) AS BIGINT)) AS qv
        |  FROM embeddings),
        |ref_$dim AS (SELECT * FROM eq_$dim WHERE half = 0),
        |c0_$dim AS (
        |  SELECT CAST(vec_id // 2 AS INT) AS cell,
        |    list_transform(qv,
        |      q -> CAST(CAST(q AS DOUBLE) / $FixScale.0 AS REAL)) AS cvec
        |  FROM ref_$dim WHERE vec_id < ${2 * IvfCells}),
        |$iters,
        |asg_$dim AS (
        |  SELECT half, cell,
        |    CAST(round(CAST(ccos AS DOUBLE) * $FixScale) AS BIGINT) AS qcos
        |  FROM (
        |    SELECT e.half, c.cell,
        |      ${cosD("e.embedding", "c.cvec", dim)} AS ccos,
        |      row_number() OVER (PARTITION BY e.vec_id
        |        ORDER BY ${cosD("e.embedding", "c.cvec", dim)} DESC, c.cell) AS crk
        |    FROM eq_$dim e CROSS JOIN c${IvfIters}_$dim c) t
        |  WHERE crk = 1),
        |cells_$dim AS (
        |  SELECT cell,
        |    sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS n_a,
        |    sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS n_b
        |  FROM asg_$dim GROUP BY cell),
        |tot_$dim AS (
        |  SELECT sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS na_tot,
        |    sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS nb_tot,
        |    sum(CASE WHEN half = 0 THEN qcos ELSE 0 END) AS sqa,
        |    sum(CASE WHEN half = 1 THEN qcos ELSE 0 END) AS sqb
        |  FROM asg_$dim),
        |row_$dim AS (
        |  SELECT '$name' AS codebook,
        |    CAST(max(na_tot) AS BIGINT) AS n_ref,
        |    CAST(max(nb_tot) AS BIGINT) AS n_cur,
        |    CAST((sum(abs(CAST(n_a AS HUGEINT) * nb_tot
        |        - CAST(n_b AS HUGEINT) * na_tot)) * $FixScale)
        |      // (2 * CAST(max(na_tot) AS HUGEINT) * max(nb_tot)) AS BIGINT)
        |      AS occ_tvd_fp,
        |    CAST((max(n_b) * $FixScale) // max(nb_tot) AS BIGINT) AS top_share_fp,
        |    CAST(max(sqa) // max(na_tot) AS BIGINT) AS dist_ref_fp,
        |    CAST(max(sqb) // max(nb_tot) AS BIGINT) AS dist_cur_fp
        |  FROM cells_$dim, tot_$dim)""".stripMargin
    }
    s"""WITH ${DriftBooks.map { case (n, d) => bookCtes(n, d) }.mkString(",\n")}
      |SELECT codebook, n_ref, n_cur, occ_tvd_fp, top_share_fp,
      |  dist_ref_fp, dist_cur_fp,
      |  dist_ref_fp - dist_cur_fp AS dist_drop_fp,
      |  CASE WHEN occ_tvd_fp > $DriftTvdFp
      |      OR dist_ref_fp - dist_cur_fp > $DriftDistFp
      |      OR top_share_fp > $DriftShareFp
      |    THEN 'retrain' ELSE 'keep' END AS action
      |FROM (${DriftBooks.map { case (_, d) => s"SELECT * FROM row_$d" }
           .mkString(" UNION ALL ")}) books
      |ORDER BY codebook""".stripMargin
  }

  /** q275 audit knobs: query-set size, recall cutoff, and the audited
    * retrieval configurations (IVF probe depths nested up to q41's
    * serving default, SRP Hamming-probe radii over q95's 16-bit codes).
    */
  val RecallQueries = 20
  val RecallK = 10
  val RecallProbes: Seq[Int] = Seq(1, 2, 4, 6)
  val RecallHams: Seq[Int] = Seq(0, 1, 2)

  // q275 — ANN recall@k audit: the number an ANN index owner actually
  // watches. For a sampled query set (vec_id < RecallQueries) compute
  // the EXACT cosine top-k (q40's brute-force semantics, k = RecallK),
  // then replay each approximate retrieval policy — IVF at probe depth
  // p ∈ RecallProbes over q41's trained codebook, SRP Hamming-radius
  // probing at r ∈ RecallHams over q95's 16-bit sign codes — and report
  // per config: mean recall@5 / recall@10 (2^20 fixed point, integer-
  // exact), the WORST per-query recall@10 (tail queries are what pages
  // the on-call), and the mean candidate count (the cost axis recall is
  // traded against). A 'brute' row (all non-self candidates) pins the
  // harness: its recall is exactly 2^20 by construction.
  //
  // Scale shape: the exact ground truth and every candidate generator
  // are broadcast-the-queries scans — the corpus never self-joins and
  // never shuffles; per-family candidates are generated ONCE at the
  // deepest probe level and the nested shallower configs are derived by
  // filtering on the per-candidate level (prk for IVF cells, Hamming
  // distance for SRP), so adding a config costs a predicate, not a
  // corpus pass. The audit is an offline sampled job: O(|Q|·N) cosines
  // at |Q| = 20 is the documented budget, NOT a serving path.
  /** The audit body, parameterized on the codebook so AnnRecallSpec can
    * inject a deliberately bad one and assert the audit flags it.
    */
  private[graft] def recallAuditOn(e: DataFrame, centroids: DataFrame): DataFrame = {
    val s = e.sparkSession
    import s.implicits._
    val QN = RecallQueries
    val K = RecallK
    val q = e.filter(col("vec_id") < QN)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    // exact ground truth: rank re over ALL non-self corpus rows
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    val bruteScored = e.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("cos", expr("cosine_sim(qvec, embedding)"))
      .select(col("query_id"), col("vec_id"), col("cos"))
      .localCheckpoint() // feeds the exact cut AND the brute config rows
    val exact = bruteScored.withColumn("re", row_number().over(wq))
      .filter(col("re") <= K)
      .select(col("query_id"), col("vec_id"), col("re"))
    // IVF candidates at the deepest probe level, tagged with the cell's
    // probe rank so shallower configs filter instead of re-scanning
    val assigned = argmaxCell(
      e.join(broadcast(centroids))
        .withColumn("ccos", expr("cosine_sim(embedding, cvec)")), col("embedding"))
      .select(col("vec_id"), col("cell"), col("embedding"))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("qcos").desc, col("cell"))
    val probed = q.join(broadcast(centroids))
      .withColumn("qcos", expr("cosine_sim(qvec, cvec)"))
      .withColumn("prk", row_number().over(wProbe))
      .filter(col("prk") <= RecallProbes.max)
      .select(col("query_id"), col("qvec"), col("cell"), col("prk"))
    val ivfCand = assigned.join(broadcast(probed), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", expr("cosine_sim(qvec, embedding)"))
      .select(col("query_id"), col("vec_id"), col("cos"), col("prk").as("lvl"))
    // SRP candidates at the widest Hamming radius, tagged with distance
    val codes = e.select(col("vec_id"), col("embedding"),
      expr("srp_code(embedding)").as("code"))
    val qc = codes.filter(col("vec_id") < QN)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"),
        col("code").as("qcode"))
    val srpCand = codes.join(broadcast(qc), col("vec_id") =!= col("query_id"))
      .withColumn("lvl", expr("bit_count(code ^ qcode)").cast("long"))
      .filter(col("lvl") <= RecallHams.max)
      .withColumn("cos", expr("cosine_sim(qvec, embedding)"))
      .select(col("query_id"), col("vec_id"), col("cos"), col("lvl"))
    val ivfCfgs = RecallProbes.map(_.toLong).toDF("param")
    val srpCfgs = RecallHams.map(_.toLong).toDF("param")
    val cand = ivfCand.join(broadcast(ivfCfgs), col("lvl") <= col("param"))
      .select(lit("ivf").as("idx"), col("param"), col("query_id"),
        col("vec_id"), col("cos"))
      .unionAll(srpCand.join(broadcast(srpCfgs), col("lvl") <= col("param"))
        .select(lit("srp").as("idx"), col("param"), col("query_id"),
          col("vec_id"), col("cos")))
      .unionAll(bruteScored.select(lit("brute").as("idx"), lit(0L).as("param"),
        col("query_id"), col("vec_id"), col("cos")))
      .localCheckpoint() // feeds the ranked cut AND the candidate counts
    val wCfg = Window.partitionBy(col("idx"), col("param"), col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    val candN = cand.groupBy(col("idx"), col("param"), col("query_id"))
      .agg(count(lit(1)).as("cand_n"))
    val hits = cand.withColumn("ra", row_number().over(wCfg))
      .filter(col("ra") <= K)
      .join(exact, Seq("query_id", "vec_id"), "left")
      .groupBy(col("idx"), col("param"), col("query_id"))
      .agg(
        sum(when(col("re").isNotNull && col("ra") <= 5 && col("re") <= 5, 1L)
          .otherwise(0L)).as("hits5"),
        sum(when(col("re").isNotNull, 1L).otherwise(0L)).as("hits10"))
    // every (config, query) pair survives — a query with an EMPTY
    // candidate set is a recall-0 row, not a dropped row
    val cfgs = (Seq(("brute", 0L)) ++ RecallProbes.map(p => ("ivf", p.toLong)) ++
      RecallHams.map(r => ("srp", r.toLong))).toDF("idx", "param")
    cfgs.crossJoin(q.select(col("query_id")))
      .join(candN, Seq("idx", "param", "query_id"), "left")
      .join(hits, Seq("idx", "param", "query_id"), "left")
      .groupBy(col("idx"), col("param"))
      .agg(count(lit(1)).as("n_q"),
        sum(coalesce(col("hits5"), lit(0L))).as("sh5"),
        sum(coalesce(col("hits10"), lit(0L))).as("sh10"),
        min(coalesce(col("hits10"), lit(0L))).as("mh10"),
        sum(coalesce(col("cand_n"), lit(0L))).as("sc"))
      .select(col("idx"), col("param"), col("n_q"),
        expr(s"CAST(sh5 * $FixScale DIV (5 * $QN) AS BIGINT)").as("recall5_fp"),
        expr(s"CAST(sh10 * $FixScale DIV ($K * $QN) AS BIGINT)").as("recall10_fp"),
        expr(s"CAST(mh10 * $FixScale DIV $K AS BIGINT)").as("min_recall10_fp"),
        expr(s"CAST(sc DIV $QN AS BIGINT)").as("mean_cand"))
      .orderBy(col("idx"), col("param"))
  }

  private def q275(s: SparkSession, d: String): DataFrame = {
    GraftFunctions.register(s)
    val e = embeddings(s, d)
    val eq = e.select(col("vec_id"), col("embedding"),
      transform(col("embedding"),
        x => round(x.cast("double") * FixScale).cast("long")).as("qv"))
    val init = eq.filter(col("vec_id") < IvfCells)
      .select(col("vec_id").cast("int").as("cell"),
        transform(col("qv"),
          q => (q.cast("double") / FixScale.toDouble).cast("float")).as("cvec"))
    recallAuditOn(e, ivfTrainOn(eq, init, IvfIters))
  }

  private val q275Sql = {
    val QN = RecallQueries
    val K = RecallK
    val ivfVals = RecallProbes.map(p => s"($p)").mkString(", ")
    val srpVals = RecallHams.map(r => s"($r)").mkString(", ")
    val cfgVals = (Seq("('brute', 0)") ++ RecallProbes.map(p => s"('ivf', $p)") ++
      RecallHams.map(r => s"('srp', $r)")).mkString(", ")
    s"""WITH $ivfAssignedPrefixSql,
      |qset AS (
      |  SELECT vec_id AS query_id, embedding AS qvec
      |  FROM embeddings WHERE vec_id < $QN),
      |brutecand AS (
      |  SELECT q.query_id, e.vec_id,
      |    ${cosSql("q.qvec", "e.embedding")} AS cos
      |  FROM embeddings e JOIN qset q ON e.vec_id <> q.query_id),
      |exact AS (
      |  SELECT query_id, vec_id, re FROM (
      |    SELECT query_id, vec_id,
      |      row_number() OVER (PARTITION BY query_id
      |        ORDER BY cos DESC, vec_id) AS re
      |    FROM brutecand) t
      |  WHERE re <= $K),
      |probed AS (
      |  SELECT query_id, qvec, cell, prk FROM (
      |    SELECT q.query_id, q.qvec, c.cell,
      |      row_number() OVER (PARTITION BY q.query_id
      |        ORDER BY ${cosSql("q.qvec", "c.cvec")} DESC, c.cell) AS prk
      |    FROM qset q CROSS JOIN $ivfCFin c) t
      |  WHERE prk <= ${RecallProbes.max}),
      |ivfcand AS (
      |  SELECT p.query_id, a.vec_id,
      |    ${cosSql("p.qvec", "a.embedding")} AS cos, p.prk AS lvl
      |  FROM assigned a JOIN probed p ON a.cell = p.cell
      |  WHERE a.vec_id <> p.query_id),
      |sq AS (SELECT vec_id,
      |    list_transform(embedding,
      |      x -> CAST(round(CAST(x AS DOUBLE) * $FixScale) AS BIGINT)) AS qe
      |  FROM embeddings),
      |pb AS (SELECT vec_id, b,
      |    list_sum(list_transform(range($SrpDim), i ->
      |      ((1103515245 * (b * $SrpDim + i) + 12345) % 2147483647 - 1073741823)
      |        * qe[i+1])) AS dot
      |  FROM sq, (SELECT unnest(range($SrpBits)) AS b) bs),
      |codes AS (SELECT vec_id,
      |    CAST(sum(CASE WHEN dot >= 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)
      |      AS BIGINT) AS code
      |  FROM pb GROUP BY vec_id),
      |qcodes AS (
      |  SELECT c.vec_id AS query_id, e.embedding AS qvec, c.code AS qcode
      |  FROM codes c JOIN embeddings e ON e.vec_id = c.vec_id
      |  WHERE c.vec_id < $QN),
      |srpcand AS (
      |  SELECT q.query_id, c.vec_id,
      |    ${cosSql("q.qvec", "e.embedding")} AS cos,
      |    bit_count(xor(c.code, q.qcode)) AS lvl
      |  FROM codes c JOIN embeddings e ON e.vec_id = c.vec_id
      |  JOIN qcodes q ON c.vec_id <> q.query_id
      |  WHERE bit_count(xor(c.code, q.qcode)) <= ${RecallHams.max}),
      |cand AS (
      |  SELECT 'ivf' AS idx, CAST(f.param AS BIGINT) AS param,
      |    c.query_id, c.vec_id, c.cos
      |  FROM ivfcand c JOIN (VALUES $ivfVals) f(param) ON c.lvl <= f.param
      |  UNION ALL
      |  SELECT 'srp', CAST(f.param AS BIGINT), c.query_id, c.vec_id, c.cos
      |  FROM srpcand c JOIN (VALUES $srpVals) f(param) ON c.lvl <= f.param
      |  UNION ALL
      |  SELECT 'brute', 0, query_id, vec_id, cos FROM brutecand),
      |candn AS (
      |  SELECT idx, param, query_id, CAST(count(*) AS BIGINT) AS cand_n
      |  FROM cand GROUP BY 1, 2, 3),
      |hits AS (
      |  SELECT r.idx, r.param, r.query_id,
      |    sum(CASE WHEN x.re IS NOT NULL AND r.ra <= 5 AND x.re <= 5
      |      THEN 1 ELSE 0 END) AS hits5,
      |    sum(CASE WHEN x.re IS NOT NULL THEN 1 ELSE 0 END) AS hits10
      |  FROM (
      |    SELECT idx, param, query_id, vec_id,
      |      row_number() OVER (PARTITION BY idx, param, query_id
      |        ORDER BY cos DESC, vec_id) AS ra
      |    FROM cand) r
      |  LEFT JOIN exact x ON r.query_id = x.query_id AND r.vec_id = x.vec_id
      |  WHERE r.ra <= $K
      |  GROUP BY 1, 2, 3),
      |allq AS (
      |  SELECT CAST(f.idx AS VARCHAR) AS idx, CAST(f.param AS BIGINT) AS param,
      |    q.query_id
      |  FROM (VALUES $cfgVals) f(idx, param) CROSS JOIN qset q)
      |SELECT idx, param, n_q,
      |  CAST(sh5 * $FixScale // (5 * $QN) AS BIGINT) AS recall5_fp,
      |  CAST(sh10 * $FixScale // ($K * $QN) AS BIGINT) AS recall10_fp,
      |  CAST(mh10 * $FixScale // $K AS BIGINT) AS min_recall10_fp,
      |  CAST(sc // $QN AS BIGINT) AS mean_cand
      |FROM (
      |  SELECT a.idx, a.param, CAST(count(*) AS BIGINT) AS n_q,
      |    sum(coalesce(h.hits5, 0)) AS sh5,
      |    sum(coalesce(h.hits10, 0)) AS sh10,
      |    min(coalesce(h.hits10, 0)) AS mh10,
      |    sum(coalesce(c.cand_n, 0)) AS sc
      |  FROM allq a
      |  LEFT JOIN hits h ON a.idx = h.idx AND a.param = h.param
      |    AND a.query_id = h.query_id
      |  LEFT JOIN candn c ON a.idx = c.idx AND a.param = c.param
      |    AND a.query_id = c.query_id
      |  GROUP BY 1, 2) agg
      |ORDER BY idx, param""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q("q34_embed_neardup", q34, Some(q34Sql)),
    Q("q40_knn_brute", q40, Some(q40Sql)),
    Q("q41_knn_ivf", q41, Some(q41Sql)),
    Q("q74_embed_quant", q74, Some(q74Sql)),
    Q("q87_kcenter_diversity", q87, Some(q87Sql)),
    Q("q95_srp_lsh", q95, Some(q95Sql)),
    Q("q112_semdedup", q112, Some(q112Sql)),
    Q("q135_bitext_margin", q135, Some(q135Sql)),
    Q("q145_label_centroids", q145, Some(q145Sql)),
    Q("q166_embedding_stats", q166, Some(q166Sql)),
    Q("q171_retrieval_eval", q171, Some(q171Sql)),
    Q("q183_embedding_drift", q183, Some(q183Sql)),
    Q("q265_knn_shapley", q265, Some(q265Sql)),
    Q("q268_dim_truncation", q268, Some(q268Sql)),
    Q("q270_codebook_drift", q270, Some(q270Sql)),
    Q("q275_ann_recall", q275, Some(q275Sql)),
    Q("q212_power_iteration", q212, Some(q212Sql)),
    Q("q213_anisotropy", q213, Some(q213Sql)),
    Q("q218_cluster_ari", q218, Some(q218Sql)),
  )

  // NOTE: `all` is a def-typed lookup of q218/q218Sql declared below —
  // q218Sql must stay a lazy val so object-init order cannot capture a
  // null into the registration above.
  // q218 — external clustering validation: the Adjusted Rand Index of
  // the SRP-bucket "clustering" (q95's deterministic 8-bit sign codes)
  // against the ground-truth label column — the pair-counting answer
  // to "do my cheap hash buckets actually respect the labels?", which
  // is the go/no-go check before using bucket-local ops (dedup,
  // negatives mining) as if they were label-aware. ARI corrects raw
  // pair agreement for chance; computed in the overflow-safe staging
  //   expected = Sa·Sb DIV Npairs  (each term ≤ Npairs — no N⁴ blowup)
  //   ari_fp = (Sidx − expected)·2^20 DIV ((Sa+Sb) DIV 2 − expected)
  // with every C(n,2) and product staged through DECIMAL(38,0)/
  // HUGEINT. Exact integers end to end; both engines land on the same
  // truncated fixed point.
  //
  // Scale shape: one scan to (code, label) contingency cells —
  // ≤ 2^SrpBits·|labels| rows — then cell-sized arithmetic. Nothing
  // corpus-sized shuffles.
  private def q218(s: SparkSession, d: String): DataFrame = {
    GraftFunctions.register(s)
    val cells = embeddings(s, d)
      .select(expr("srp_code(embedding)").as("code"), col("label"))
      .groupBy(col("code"), col("label")).agg(count(lit(1)).as("nij"))
    val sidx = cells.agg(sum(expr(
      "CAST(nij AS DECIMAL(38,0)) * (nij - 1) DIV 2")).as("sidx"),
      sum(col("nij")).as("n"),
      countDistinct(col("code")).as("n_clusters"),
      countDistinct(col("label")).as("n_classes"))
    val sa = cells.groupBy(col("code")).agg(sum(col("nij")).as("a"))
      .agg(sum(expr("CAST(a AS DECIMAL(38,0)) * (a - 1) DIV 2")).as("sa"))
    val sb = cells.groupBy(col("label")).agg(sum(col("nij")).as("b"))
      .agg(sum(expr("CAST(b AS DECIMAL(38,0)) * (b - 1) DIV 2")).as("sb"))
    sidx.crossJoin(broadcast(sa)).crossJoin(broadcast(sb))
      .withColumn("npairs", expr("CAST(n AS DECIMAL(38,0)) * (n - 1) DIV 2"))
      .withColumn("expected", expr("CAST(sa * sb DIV npairs AS DECIMAL(38,0))"))
      .select(col("n").as("n_vecs"), col("n_clusters"), col("n_classes"),
        expr("""CAST((CAST(sidx AS DECIMAL(38,0)) - expected) * 1048576
               |  DIV (CAST(sa + sb AS DECIMAL(38,0)) DIV 2 - expected)
               |  AS BIGINT)""".stripMargin).as("ari_fp"))
  }

  private lazy val q218Sql =
    s"""WITH q AS (SELECT vec_id, label,
      |    list_transform(embedding,
      |      x -> CAST(round(CAST(x AS DOUBLE) * $FixScale) AS BIGINT)) AS qe
      |  FROM embeddings),
      |pb AS (SELECT vec_id, label, b,
      |    list_sum(list_transform(range($SrpDim), i ->
      |      ((1103515245 * (b * $SrpDim + i) + 12345) % 2147483647 - 1073741823)
      |        * qe[i+1])) AS dot
      |  FROM q, (SELECT unnest(range($SrpBits)) AS b) bs),
      |codes AS (SELECT vec_id, label,
      |    CAST(sum(CASE WHEN dot >= 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)
      |      AS BIGINT) AS code
      |  FROM pb GROUP BY vec_id, label),
      |cells AS (SELECT code, label, count(*) AS nij
      |  FROM codes GROUP BY code, label),
      |t AS (SELECT sum(CAST(nij AS HUGEINT) * (nij - 1) // 2) AS sidx,
      |    CAST(sum(nij) AS BIGINT) AS n,
      |    count(DISTINCT code) AS n_clusters,
      |    count(DISTINCT label) AS n_classes
      |  FROM cells),
      |ra AS (SELECT sum(CAST(a AS HUGEINT) * (a - 1) // 2) AS sa
      |  FROM (SELECT code, sum(nij) AS a FROM cells GROUP BY code)),
      |rb AS (SELECT sum(CAST(b AS HUGEINT) * (b - 1) // 2) AS sb
      |  FROM (SELECT label, sum(nij) AS b FROM cells GROUP BY label))
      |SELECT n AS n_vecs, n_clusters, n_classes,
      |  CAST((sidx - (sa * sb // (CAST(n AS HUGEINT) * (n - 1) // 2))) * 1048576
      |    // ((sa + sb) // 2 - (sa * sb // (CAST(n AS HUGEINT) * (n - 1) // 2)))
      |    AS BIGINT) AS ari_fp
      |FROM t, ra, rb""".stripMargin
}
