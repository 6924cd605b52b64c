package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.TextFns._

/** Corpus statistical-health audit: the two distributional laws every
  * large text corpus is expected to obey, fitted exactly in integer
  * fixed point so both engines land on the same bits.
  *
  *   - Heaps' law (Heaps 1978; Baayen 2001): vocabulary grows as
  *     V ~ N^beta with beta in (0,1). The audit builds 8 nested corpus
  *     prefixes (documents whose `doc_id % 8` falls below k — a
  *     deterministic growing family, no ordering assumptions) and fits
  *     beta as the least-squares slope of log2(V) against log2(N).
  *     A beta near 1 means vocabulary grows linearly with corpus size
  *     — the signature of boilerplate/ID-like token pollution; a
  *     collapse toward 0 means the crawl stopped finding new language.
  *   - Zipf's law (Zipf 1949): rank-frequency slope over the top 64
  *     words, same least-squares fit on the log-log points — healthy
  *     natural-language corpora sit near -1; template-heavy corpora
  *     flatten.
  *
  * log2 is a deterministic fixed-point surrogate, identical in both
  * engines: floor-log2 from the binary-string length plus a linear
  * fractional interpolation, `(L-1)*S + n*S div 2^(L-1) - S` with
  * L = len(bin(n)) — exact at powers of two, piecewise-linear between,
  * monotone, and engine-portable (no float log touches any emitted
  * value). Slopes are the textbook least-squares quotient
  * (n*Sxy - Sx*Sy) * S div (n*Sxx - Sx*Sx), DECIMAL/HUGEINT-staged;
  * the Zipf numerator is negative, which both engines divide with the
  * same toward-zero truncation (the q271 DIV contract).
  *
  * Scale shape: ONE corpus scan into a (word, bucket) count frame
  * (vocab x 8 rows, pinned); everything after is vocab-sized or
  * smaller — the prefix/fit frames are 8 rows, the Zipf frame 64. The
  * top-64 cut is TakeOrderedAndProject (bounded heap), never a full
  * sort; the only rank window runs on the 64-row frame.
  */
object Statistics {

  /** Fixed-point scale for log2 values and fitted slopes. */
  val FpScale = 1048576L // 2^20

  /** Nested corpus prefixes (doc_id % PrefixBuckets < k). */
  val PrefixBuckets = 8

  /** Zipf fit depth: top-R words by frequency. */
  val ZipfRanks = 64

  private val S = FpScale

  /** Fixed-point log2 over a non-negative bigint SQL expression —
    * Spark dialect. Zero guards to greatest(x,1) (log2fp(1) = 0).
    */
  private[queries] def log2fpSpark(c: String): String = {
    val g = s"greatest($c, 1L)"
    s"""(length(bin($g)) - 1) * ${S}L
       | + CAST(CAST($g AS DECIMAL(38,0)) * ${S}L
       |     div shiftleft(1L, length(bin($g)) - 1) AS BIGINT)
       | - ${S}L""".stripMargin.replace("\n", " ")
  }

  /** The same log2, DuckDB dialect (HUGEINT staging, `<<`). */
  private def log2fpDuck(c: String): String = {
    val g = s"greatest($c, 1)"
    s"""(length(bin($g)) - 1) * $S
       | + CAST(CAST($g AS HUGEINT) * $S
       |     // (1::BIGINT << (length(bin($g)) - 1)) AS BIGINT)
       | - $S""".stripMargin.replace("\n", " ")
  }

  /** Least-squares slope over a frame with (lx, ly) columns, scale S,
    * DECIMAL-staged (the cross-products pass 2^63 at corpus scale).
    */
  private def slopeOf(pts: DataFrame, out: String): DataFrame =
    pts.agg(
      count(lit(1)).as("n"),
      sum(col("lx")).as("sx"), sum(col("ly")).as("sy"),
      sum(expr("CAST(lx AS DECIMAL(38,0)) * ly")).as("sxy"),
      sum(expr("CAST(lx AS DECIMAL(38,0)) * lx")).as("sxx"))
      // a degenerate fit (all lx equal -> zero denominator) is defined
      // as slope 0 — guarded BEFORE the division (ANSI Spark throws on
      // div-by-zero; DuckDB would return NULL)
      .select(expr(
        s"""CASE WHEN n * sxx - CAST(sx AS DECIMAL(38,0)) * sx = 0 THEN 0L
           | ELSE CAST(n * sxy - CAST(sx AS DECIMAL(38,0)) * sy AS DECIMAL(38,0))
           |   * ${S}L div (n * sxx - CAST(sx AS DECIMAL(38,0)) * sx) END"""
          .stripMargin.replace("\n", " ")).as(out))

  private def q281(s: SparkSession, d: String): DataFrame =
    statisticsOf(documents(s, d))

  /** The q281 plan over any (doc_id, text) frame — public for fixture
    * specs (planted Zipfian and boilerplate corpora).
    */
  def statisticsOf(docs: DataFrame): DataFrame = {
    val sp = docs.sparkSession
    import sp.implicits._
    val B = PrefixBuckets
    // one corpus scan -> (word, bucket) counts; pinned: every frame
    // below derives from it without touching the corpus again
    val wb = docs
      .select(pmod(col("doc_id"), lit(B.toLong)).as("b"),
        explode(tokens(col("text"))).as("w"))
      .groupBy(col("w"), col("b")).agg(count(lit(1)).as("c"))
      .localCheckpoint()
    // vocab-sized, consumed by both the vb branch and the Zipf top-R
    // cut — pin it so the groupBy(w) shuffle runs once (the oracle
    // materializes the same frame)
    val words = wb.groupBy(col("w"))
      .agg(sum(col("c")).as("cnt"), min(col("b")).as("minb"))
      .localCheckpoint()
    val tc = wb.groupBy(col("b")).agg(sum(col("c")).as("tokc"))
    val vb = words.groupBy(col("minb")).agg(count(lit(1)).as("nv"))

    val ks = (1L to B.toLong).toDF("k")
    val prefN = ks.join(broadcast(tc), col("b") < col("k"), "left")
      .groupBy(col("k")).agg(coalesce(sum(col("tokc")), lit(0L)).as("n_tokens"))
    val prefV = ks.join(broadcast(vb), col("minb") < col("k"), "left")
      .groupBy(col("k")).agg(coalesce(sum(col("nv")), lit(0L)).as("vocab"))
    val pref = prefN.join(prefV, "k")
      .withColumn("log2_n_fp", expr(log2fpSpark("n_tokens")))
      .withColumn("log2_v_fp", expr(log2fpSpark("vocab")))
      .localCheckpoint() // 8 rows, consumed by the fit and the output
    val hfit = slopeOf(
      pref.select(col("log2_n_fp").as("lx"), col("log2_v_fp").as("ly")),
      "heaps_beta_fp")

    // bounded top-R (TakeOrderedAndProject), rank window over R rows
    val ztop = words.orderBy(col("cnt").desc, col("w")).limit(ZipfRanks)
      .withColumn("r",
        row_number().over(Window.orderBy(col("cnt").desc, col("w"))))
    val zfit = slopeOf(
      ztop.select(expr(log2fpSpark("CAST(r AS BIGINT)")).as("lx"),
        expr(log2fpSpark("cnt")).as("ly")),
      "zipf_slope_fp")

    pref.crossJoin(broadcast(hfit)).crossJoin(broadcast(zfit))
      .select(col("k"), col("n_tokens"), col("vocab"),
        col("log2_n_fp"), col("log2_v_fp"),
        col("heaps_beta_fp"), col("zipf_slope_fp"))
      .orderBy(col("k"))
  }

  private val q281Sql = {
    val slope = (src: String) =>
      s"""SELECT CASE WHEN count(*) * sum(CAST(lx AS HUGEINT) * lx)
         |        - sum(CAST(lx AS HUGEINT)) * sum(lx) = 0 THEN 0
         |   ELSE (count(*) * sum(CAST(lx AS HUGEINT) * ly)
         |        - sum(CAST(lx AS HUGEINT)) * sum(ly)) * $S
         |   // (count(*) * sum(CAST(lx AS HUGEINT) * lx)
         |        - sum(CAST(lx AS HUGEINT)) * sum(lx)) END AS v
         | FROM $src""".stripMargin.replace("\n", " ")
    s"""WITH toks AS (
      |  SELECT doc_id % $PrefixBuckets AS b,
      |    unnest(regexp_extract_all(lower(text), '$TokenPattern')) AS w
      |  FROM documents),
      |wb AS MATERIALIZED (SELECT w, b, count(*) AS c FROM toks GROUP BY w, b),
      |words AS MATERIALIZED (
      |  SELECT w, CAST(sum(c) AS BIGINT) AS cnt, min(b) AS minb
      |  FROM wb GROUP BY w),
      |tc AS (SELECT b, CAST(sum(c) AS BIGINT) AS tokc FROM wb GROUP BY b),
      |vb AS (SELECT minb, count(*) AS nv FROM words GROUP BY minb),
      |ks AS (SELECT unnest(range(1, ${PrefixBuckets + 1})) AS k),
      |prefn AS (
      |  SELECT k, CAST(coalesce(sum(tokc), 0) AS BIGINT) AS n_tokens
      |  FROM ks LEFT JOIN tc ON b < k GROUP BY k),
      |prefv AS (
      |  SELECT k, CAST(coalesce(sum(nv), 0) AS BIGINT) AS vocab
      |  FROM ks LEFT JOIN vb ON minb < k GROUP BY k),
      |pref AS (
      |  SELECT k, n_tokens, vocab,
      |    ${log2fpDuck("n_tokens")} AS log2_n_fp,
      |    ${log2fpDuck("vocab")} AS log2_v_fp
      |  FROM prefn JOIN prefv USING (k)),
      |hpts AS (SELECT log2_n_fp AS lx, log2_v_fp AS ly FROM pref),
      |hfit AS (${slope("hpts")}),
      |ztop AS (
      |  SELECT row_number() OVER (ORDER BY cnt DESC, w) AS r, cnt
      |  FROM (SELECT cnt, w FROM words ORDER BY cnt DESC, w LIMIT $ZipfRanks)),
      |zpts AS (SELECT ${log2fpDuck("r")} AS lx, ${log2fpDuck("cnt")} AS ly
      |         FROM ztop),
      |zfit AS (${slope("zpts")})
      |SELECT CAST(k AS BIGINT) AS k, n_tokens, vocab,
      |  CAST(log2_n_fp AS BIGINT) AS log2_n_fp,
      |  CAST(log2_v_fp AS BIGINT) AS log2_v_fp,
      |  CAST(h.v AS BIGINT) AS heaps_beta_fp,
      |  CAST(z.v AS BIGINT) AS zipf_slope_fp
      |FROM pref CROSS JOIN hfit h CROSS JOIN zfit z
      |ORDER BY k""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q("q281_corpus_statistics", q281, Some(q281Sql)),
  )
}
