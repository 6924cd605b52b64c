package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Probabilistic record linkage — the entity-resolution scoring layer
  * the dedup family stops short of: q30-q36/q200 decide "same or not"
  * from ONE similarity signal, but production linkage (and cross-source
  * dedup of a training corpus) weighs SEVERAL weak agreement fields,
  * with per-field weights LEARNED from the data itself. q273 implements
  * the Fellegi-Sunter model (Fellegi & Sunter 1969, "A theory for
  * record linkage"; Winkler's EM formulation): candidate pairs are
  * compared on k binary agreement fields, and EM fits a two-class
  * mixture — P(agree_k | match) = m_k, P(agree_k | non-match) = u_k,
  * match prevalence p — over the 2^k agreement-pattern histogram.
  * The learned m/u ratios are the classic match/non-match weights a
  * linkage engine attaches to each field.
  *
  * Candidate pairs here are the deterministic doc_id offsets +1/+3
  * (the q263 schedule discipline: two narrow equi-joins of a 4-column
  * projection, never an all-pairs surface), compared on lang equality,
  * source equality, and length-bucket (n_chars DIV 100) equality.
  *
  * Bit-reproducibility: EM runs a FIXED 16 rounds in 2^20 fixed point
  * — per-pattern class likelihoods are staged products of S-scale
  * factors with truncating DIV after each multiply, posteriors one
  * staged DECIMAL(38,0) division, M-step sums DECIMAL-staged; m/u are
  * clamped to [1, S-1] each round so no product can collapse to an
  * absorbing zero in either engine.
  *
  * Scale shape: the corpus is touched by the two pair joins ONCE; all
  * EM state is the <=2^k-row pattern histogram (checkpointed) and a
  * 1-row parameter frame (the q271 convention) — at 100 TB the fit
  * costs 16 aggregations of an 8-row frame. The histogram counts stage
  * in DECIMAL(38,0): n_g*w*S <= 10^12 * 2^40 stays far under 10^38.
  */
object Linkage {

  /** Fixed-point scale (2^20), shared with the SQL oracle. */
  val FsScale = 1048576L

  /** Fixed EM round budget. */
  val FsRounds = 16

  /** Candidate-pair doc_id offsets (the q263 schedule discipline). */
  val FsOffsets = Seq(1, 3)

  /** Deterministic EM init (fixed point): optimistic match class
    * (m=0.9), coin-flip non-match (u=0.5), low prevalence (p=0.1) —
    * the standard Winkler starting point, baked identically into both
    * engines.
    */
  val FsInitM = 943718L // 0.9 * 2^20
  val FsInitU = 524288L // 0.5 * 2^20
  val FsInitP = 104858L // 0.1 * 2^20

  val FsFields = Seq("lang", "source", "lenb")

  /** Class likelihood of pattern (b1,b2,b3) under per-field probs
    * (c1,c2,c3): staged product of three S-scale factors, truncating
    * DIV after each multiply. `d` is the dialect's integer division,
    * `big` its wide-integer type.
    */
  private def prodExpr(d: String, big: String, c: Int => String): String = {
    def f(k: Int) = s"(b$k * ${c(k)} + (1 - b$k) * ($FsScale - ${c(k)}))"
    s"((CAST(${f(1)} AS $big) * ${f(2)} $d $FsScale) * ${f(3)} $d $FsScale)"
  }

  /** Posterior match weight of a pattern row against the parameter row:
    * w = p*mprod*S DIV (p*mprod + (S-p)*uprod), S-scale.
    */
  private def wExpr(d: String, big: String): String = {
    val mp = prodExpr(d, big, k => s"m$k")
    val up = prodExpr(d, big, k => s"u$k")
    s"""(CAST(p AS $big) * $mp * $FsScale
       | $d greatest(CAST(p AS $big) * $mp + ($FsScale - p) * $up, 1))"""
      .stripMargin.replace("\n", " ")
  }

  /** EM core over a pattern histogram with columns (b1,b2,b3,n):
    * returns the 1-row parameter frame (m1..m3, u1..u3, p) after
    * `rounds` fixed-point steps. Exposed for the spec's fold pin.
    */
  private[graft] def emOf(hist0: DataFrame, rounds: Int): DataFrame = {
    val S = FsScale
    val hist = hist0.localCheckpoint()
    val s = hist.sparkSession
    var params = s.range(1).select(
      (1 to 3).map(k => lit(FsInitM).as(s"m$k")) ++
        (1 to 3).map(k => lit(FsInitU).as(s"u$k")) :+
        lit(FsInitP).as("p"): _*)
    val w = wExpr("DIV", "DECIMAL(38,0)")
    for (_ <- 1 to rounds) {
      val e = hist.crossJoin(broadcast(params))
        .withColumn("w", expr(s"CAST($w AS BIGINT)"))
      val aCols = (1 to 3).map(k => sum(expr(
        s"CAST(n AS DECIMAL(38,0)) * w * b$k")).as(s"sm$k")) ++
        (1 to 3).map(k => sum(expr(
          s"CAST(n AS DECIMAL(38,0)) * ($S - w) * b$k")).as(s"su$k")) ++ Seq(
          sum(expr(s"CAST(n AS DECIMAL(38,0)) * w")).as("tw"),
          sum(expr(s"CAST(n AS DECIMAL(38,0)) * ($S - w)")).as("tnw"),
          sum(col("n")).as("tn"))
      val agg = e.agg(aCols.head, aCols.tail: _*)
      params = agg.select(
        (1 to 3).map(k => expr(
          s"greatest(least(CAST(sm$k * $S DIV greatest(tw, 1) AS BIGINT), ${S - 1}), 1)")
          .as(s"m$k")) ++
          (1 to 3).map(k => expr(
            s"greatest(least(CAST(su$k * $S DIV greatest(tnw, 1) AS BIGINT), ${S - 1}), 1)")
            .as(s"u$k")) :+
          expr(s"greatest(least(CAST(tw DIV greatest(tn, 1) AS BIGINT), ${S - 1}), 1)")
            .as("p"): _*)
        .localCheckpoint()
    }
    params
  }

  /** The agreement-pattern histogram over the offset-pair schedule. */
  private def histogram(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
      .select(col("doc_id"), col("lang"), col("source"),
        expr("n_chars DIV 100").as("lenb"))
    FsOffsets.map { k =>
      docs.as("a").join(docs.as("b"), col("b.doc_id") === col("a.doc_id") + k)
        .select(
          (col("a.lang") === col("b.lang")).cast("long").as("b1"),
          (col("a.source") === col("b.source")).cast("long").as("b2"),
          (col("a.lenb") === col("b.lenb")).cast("long").as("b3"))
    }.reduce(_ unionAll _)
      .groupBy(col("b1"), col("b2"), col("b3"))
      .agg(count(lit(1)).as("n"))
  }

  private def q273(s: SparkSession, d: String): DataFrame = {
    val S = FsScale
    val hist = histogram(s, d).localCheckpoint()
    val params = emOf(hist, FsRounds)
    val w = wExpr("DIV", "DECIMAL(38,0)")
    // field rows: learned m/u plus the classic FS agreement odds m/u
    val fieldRows = FsFields.zipWithIndex.map { case (nm, i) =>
      val k = i + 1
      params.select(
        lit(s"field_$nm").as("metric"),
        col(s"m$k").as("m_fp"), col(s"u$k").as("u_fp"),
        expr(s"CAST(CAST(m$k AS DECIMAL(38,0)) * $S DIV greatest(u$k, 1) AS BIGINT)")
          .as("odds_fp"))
    }.reduce(_ unionAll _)
    val pRow = params.select(lit("prevalence").as("metric"),
      col("p").as("m_fp"), lit(-1L).as("u_fp"), lit(-1L).as("odds_fp"))
    // pattern rows: posterior match weight and pair count per observed
    // agreement pattern under the final parameters
    val patRows = hist.crossJoin(broadcast(params))
      .select(
        expr("concat('pattern_', CAST(b1 AS STRING), CAST(b2 AS STRING), " +
          "CAST(b3 AS STRING))").as("metric"),
        expr(s"CAST($w AS BIGINT)").as("m_fp"),
        col("n").as("u_fp"), lit(-1L).as("odds_fp"))
    fieldRows.unionAll(pRow).unionAll(patRows).orderBy(col("metric"))
  }

  private val q273Sql = {
    val S = FsScale
    val d = "//"
    val w = wExpr(d, "HUGEINT")
    def pair(k: Int) =
      s"""SELECT CAST(a.lang = b.lang AS BIGINT) AS b1,
        |  CAST(a.source = b.source AS BIGINT) AS b2,
        |  CAST(a.lenb = b.lenb AS BIGINT) AS b3
        |FROM docs a JOIN docs b ON b.doc_id = a.doc_id + $k""".stripMargin
    def round(r: Int): String = {
      val sums = ((1 to 3).map(k =>
        s"sum(CAST(n AS HUGEINT) * w * b$k) AS sm$k") ++
        (1 to 3).map(k =>
          s"sum(CAST(n AS HUGEINT) * ($S - w) * b$k) AS su$k") ++ Seq(
          s"sum(CAST(n AS HUGEINT) * w) AS tw",
          s"sum(CAST(n AS HUGEINT) * ($S - w)) AS tnw",
          "sum(n) AS tn")).mkString(",\n      ")
      val upd = ((1 to 3).map(k =>
        s"greatest(least(CAST(sm$k * $S $d greatest(tw, 1) AS BIGINT), ${S - 1}), 1) AS m$k") ++
        (1 to 3).map(k =>
          s"greatest(least(CAST(su$k * $S $d greatest(tnw, 1) AS BIGINT), ${S - 1}), 1) AS u$k") :+
        s"greatest(least(CAST(tw $d greatest(tn, 1) AS BIGINT), ${S - 1}), 1) AS p")
        .mkString(",\n    ")
      s"""e$r AS (
        |  SELECT h.b1, h.b2, h.b3, h.n, CAST($w AS BIGINT) AS w
        |  FROM hist h, p${r - 1}),
        |a$r AS (
        |  SELECT $sums FROM e$r),
        |p$r AS MATERIALIZED (
        |  SELECT $upd FROM a$r)""".stripMargin
    }
    val fieldRows = FsFields.zipWithIndex.map { case (nm, i) =>
      val k = i + 1
      s"""SELECT 'field_$nm' AS metric, m$k AS m_fp, u$k AS u_fp,
        |  CAST(CAST(m$k AS HUGEINT) * $S $d greatest(u$k, 1) AS BIGINT) AS odds_fp
        |FROM p$FsRounds""".stripMargin
    }.mkString("\nUNION ALL ")
    s"""WITH docs AS (
      |  SELECT doc_id, lang, source, n_chars // 100 AS lenb FROM documents),
      |hist AS MATERIALIZED (
      |  SELECT b1, b2, b3, count(*) AS n FROM (
      |${FsOffsets.map(pair).mkString("", "\nUNION ALL\n", "")})
      |  GROUP BY 1, 2, 3),
      |p0 AS (SELECT ${(1 to 3).map(k => s"CAST($FsInitM AS BIGINT) AS m$k").mkString(", ")},
      |  ${(1 to 3).map(k => s"CAST($FsInitU AS BIGINT) AS u$k").mkString(", ")},
      |  CAST($FsInitP AS BIGINT) AS p),
      |${(1 to FsRounds).map(round).mkString(",\n")}
      |SELECT * FROM (
      |$fieldRows
      |UNION ALL SELECT 'prevalence', p, CAST(-1 AS BIGINT), CAST(-1 AS BIGINT) FROM p$FsRounds
      |UNION ALL SELECT 'pattern_' || b1 || b2 || b3, CAST($w AS BIGINT),
      |  CAST(n AS BIGINT), CAST(-1 AS BIGINT)
      |FROM hist, p$FsRounds
      |) ORDER BY metric""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q("q273_record_linkage", q273, Some(q273Sql)),
  )
}
