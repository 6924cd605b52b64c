package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Data-layout engineering: Z-ORDER (Morton) clustering audit — the
  * multi-dimensional locality layout Delta/Iceberg `OPTIMIZE ZORDER BY`
  * applies before writing files, so that a scan filtered on EITHER key
  * prunes most files. The reference (affo/ssp) has no storage layout
  * surface; this is the beyond-reference scale-engineering category.
  *
  * q146 interleaves the bits of the two join keys' grid coordinates
  * into a Morton code and reports, per 1024-z-value bucket (a
  * candidate output file), the covered rectangle of (part, supplier)
  * space: a z-ordered file covers a SMALL rectangle (span ≈ bucket
  * population), where a linear sort on one key covers a full stripe of
  * the other — the audit quantifies exactly the locality that makes
  * multi-key file-skipping work. Everything is integer bit arithmetic
  * (shifts/masks evaluate identically in Spark and DuckDB), one scan,
  * one 1024-group aggregate; nothing data-sized shuffles.
  */
object Layout {

  /** Grid bits per dimension (2^10 × 2^10 cells, 20-bit z codes). */
  val ZBits = 10
  /** z values per reported bucket (= rows per notional output file). */
  val ZBucket = 1024L

  /** The interleaved Morton code of two ZBits-wide grid coords, as an
    * arithmetic SQL fragment valid in both Spark SQL and DuckDB.
    */
  private[graft] def zExprSql(x: String, y: String): String =
    (0 until ZBits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) + ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")

  /** Core: per-z-bucket coverage rectangles for two key columns of any
    * frame. Fixture-testable.
    */
  private[graft] def zorderAuditOf(df: DataFrame, kx: String, ky: String): DataFrame = {
    val mx = df.agg(max(col(kx)).as("mx"), max(col(ky)).as("my"))
    df.crossJoin(broadcast(mx))
      .select(
        expr(s"($kx * ${1L << ZBits}) DIV (mx + 1)").as("px"),
        expr(s"($ky * ${1L << ZBits}) DIV (my + 1)").as("sy"))
      .select(expr(zExprSql("px", "sy")).as("z"), col("px"), col("sy"))
      .groupBy(expr(s"z DIV $ZBucket").as("zbucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("px")).as("min_px"), max(col("px")).as("max_px"),
        min(col("sy")).as("min_sy"), max(col("sy")).as("max_sy"))
      .withColumn("span",
        (col("max_px") - col("min_px") + 1) * (col("max_sy") - col("min_sy") + 1))
      .orderBy(col("zbucket"))
  }

  private def q146(s: SparkSession, d: String): DataFrame =
    zorderAuditOf(
      lineitem(s, d).select(col("l_partkey"), col("l_suppkey")),
      "l_partkey", "l_suppkey")

  private val q146Sql = {
    val n = 1L << ZBits
    s"""WITH mx AS (
      |  SELECT max(l_partkey) AS mx, max(l_suppkey) AS my FROM lineitem),
      |g AS (
      |  SELECT (l_partkey * $n) // (mx + 1) AS px,
      |    (l_suppkey * $n) // (my + 1) AS sy
      |  FROM lineitem CROSS JOIN mx),
      |z AS (SELECT ${zExprSql("px", "sy")} AS z, px, sy FROM g)
      |SELECT z // $ZBucket AS zbucket, count(*) AS n_rows,
      |  min(px) AS min_px, max(px) AS max_px,
      |  min(sy) AS min_sy, max(sy) AS max_sy,
      |  (max(px) - min(px) + 1) * (max(sy) - min(sy) + 1) AS span
      |FROM z GROUP BY zbucket
      |ORDER BY zbucket""".stripMargin
  }

  // q152 — equi-depth histogram build: the column statistic a
  // cost-based optimizer (and every ANALYZE TABLE) actually stores —
  // k buckets of equal row count with their upper-boundary values.
  // Boundary ranks are exact integer arithmetic (rank_i = i·n DIV k),
  // the global rank comes from the distributed rankDistributed
  // pattern (range exchange + broadcast carry — no single-partition
  // window), and per-bucket row counts fall out of the boundary ranks
  // by subtraction, so beyond the ranking pass NO per-row bucketing is
  // needed: only the k boundary rows survive the broadcast join.
  // Prices are put on the exact cents grid (round(x·100) — correctly
  // rounded in both engines) so boundary values hash-compare.
  // Rank assignment within tied values is nondeterministic, but the
  // VALUE at a given rank is not — which is all the histogram exposes.
  val HistBuckets = 16

  /** Core: equi-depth histogram of an integer column. */
  private[graft] def equiDepthOf(vals: DataFrame, valCol: String): DataFrame = {
    val ranked = Sampling.rankDistributed(vals, Seq.empty, Seq(col(valCol)))
    val n = vals.agg(count(lit(1)).as("n"))
    val bounds = n
      .select(explode(expr(s"sequence(1L, ${HistBuckets}L)")).as("bucket"), col("n"))
      .select(col("bucket"),
        expr(s"(bucket * n) DIV $HistBuckets").as("rk"),
        expr(s"((bucket - 1) * n) DIV $HistBuckets").as("prev"))
    ranked.join(broadcast(bounds), Seq("rk"))
      .select(col("bucket"), col("rk").as("upper_rank"),
        col(valCol).as("upper_value"), (col("rk") - col("prev")).as("n_rows"))
      .orderBy(col("bucket"))
  }

  private def q152(s: SparkSession, d: String): DataFrame =
    equiDepthOf(
      lineitem(s, d).select(
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents")),
      "cents")

  private val q152Sql =
    s"""WITH c AS (
      |  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
      |  FROM lineitem),
      |r AS (SELECT cents, row_number() OVER (ORDER BY cents) AS rk FROM c),
      |n AS (SELECT count(*) AS n FROM c),
      |b AS (
      |  SELECT o.o AS bucket, (o.o * n) // $HistBuckets AS rk,
      |    ((o.o - 1) * n) // $HistBuckets AS prev
      |  FROM (SELECT unnest(range(1, ${HistBuckets + 1})) AS o) o CROSS JOIN n)
      |SELECT b.bucket, b.rk AS upper_rank, r.cents AS upper_value,
      |  b.rk - b.prev AS n_rows
      |FROM b JOIN r ON r.rk = b.rk
      |ORDER BY bucket""".stripMargin

  // q190 — zone-map prune-effectiveness audit: simulate the file
  // layout (4096 order keys per file, the natural ingest order),
  // collect per-file min/max zone maps for four columns, and report
  // for each of four candidate predicates how many files a
  // min/max-based reader (parquet row-group stats, Delta/Iceberg file
  // stats) would skip and how many rows that avoids — the
  // data-skipping audit that tells a 100 TB table owner whether the
  // current sort/cluster order serves the workload or a q146-style
  // re-layout is worth the rewrite. The fixture tells both stories:
  // the orderkey predicate prunes ~everything (files ARE orderkey
  // ranges; 36/37 files, 97% of rows skipped at sf0.1), while the
  // shipdate/quantity/price predicates prune nothing (values spread
  // through every file) — the audit's whole point. Predicate
  // evaluation is interval logic on the zone bounds (no arithmetic —
  // dates and doubles only COMPARE, so cross-engine exact); shares in
  // 2^20 fixed point.
  //
  // Scale shape: one scan into a files-sized zone aggregate (this IS
  // how real lakehouse stats are built), then a 4-row report. The
  // explode is over 4 predicate structs per file row.
  private val ZoneFileRows = 4096L

  private def q190(s: SparkSession, d: String): DataFrame = {
    val z = lineitem(s, d)
      .select(expr(s"l_orderkey DIV $ZoneFileRows").as("file_id"),
        col("l_orderkey").as("ok"),
        to_date(col("l_shipdate")).as("sd"), col("l_quantity").as("q"),
        col("l_extendedprice").as("p"))
      .groupBy(col("file_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("ok")).as("min_ok"), max(col("ok")).as("max_ok"),
        min(col("sd")).as("min_sd"), max(col("sd")).as("max_sd"),
        min(col("q")).as("min_q"), max(col("q")).as("max_q"),
        min(col("p")).as("min_p"), max(col("p")).as("max_p"))
    z.select(col("n_rows"), explode(array(
        struct(lit("orderkey_lt_4096").as("predicate"),
          (col("min_ok") >= ZoneFileRows).as("pruned")),
        struct(lit("shipdate_ge_1997").as("predicate"),
          (col("max_sd") < to_date(lit("1997-01-01"))).as("pruned")),
        struct(lit("quantity_eq_50").as("predicate"),
          (col("min_q") > 50.0 || col("max_q") < 50.0).as("pruned")),
        struct(lit("price_lt_1000").as("predicate"),
          (col("min_p") >= 1000.0).as("pruned")))).as("pr"))
      .select(col("pr.predicate").as("predicate"),
        col("pr.pruned").as("pruned"), col("n_rows"))
      .groupBy(col("predicate"))
      .agg(count(lit(1)).as("n_files"),
        sum(when(col("pruned"), 1L).otherwise(0L)).as("n_pruned"),
        sum(col("n_rows")).as("rows_total"),
        sum(when(col("pruned"), col("n_rows")).otherwise(0L)).as("rows_skipped"))
      .withColumn("prune_fp",
        expr("CAST(CAST(rows_skipped AS DECIMAL(38,0)) * 1048576 DIV rows_total AS BIGINT)"))
      .orderBy(col("predicate"))
  }

  private val q190Sql =
    s"""WITH z AS (
      |  SELECT l_orderkey // $ZoneFileRows AS file_id, count(*) AS n_rows,
      |    min(l_orderkey) AS min_ok, max(l_orderkey) AS max_ok,
      |    min(CAST(l_shipdate AS DATE)) AS min_sd,
      |    max(CAST(l_shipdate AS DATE)) AS max_sd,
      |    min(l_quantity) AS min_q, max(l_quantity) AS max_q,
      |    min(l_extendedprice) AS min_p, max(l_extendedprice) AS max_p
      |  FROM lineitem GROUP BY 1),
      |pr AS (
      |  SELECT 'orderkey_lt_4096' AS predicate,
      |    min_ok >= $ZoneFileRows AS pruned, n_rows FROM z
      |  UNION ALL
      |  SELECT 'shipdate_ge_1997',
      |    max_sd < DATE '1997-01-01', n_rows FROM z
      |  UNION ALL
      |  SELECT 'quantity_eq_50', min_q > 50.0 OR max_q < 50.0, n_rows FROM z
      |  UNION ALL
      |  SELECT 'price_lt_1000', min_p >= 1000.0, n_rows FROM z)
      |SELECT predicate, count(*) AS n_files,
      |  CAST(sum(CASE WHEN pruned THEN 1 ELSE 0 END) AS BIGINT) AS n_pruned,
      |  CAST(sum(n_rows) AS BIGINT) AS rows_total,
      |  CAST(sum(CASE WHEN pruned THEN n_rows ELSE 0 END) AS BIGINT)
      |    AS rows_skipped,
      |  CAST(CAST(sum(CASE WHEN pruned THEN n_rows ELSE 0 END) AS HUGEINT)
      |    * 1048576 // sum(n_rows) AS BIGINT) AS prune_fp
      |FROM pr GROUP BY predicate
      |ORDER BY predicate""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q146_zorder_layout", q146, Some(q146Sql)),
    Q("q152_equidepth_stats", q152, Some(q152Sql)),
    Q("q190_zone_map_prune", q190, Some(q190Sql)),
  )
}
