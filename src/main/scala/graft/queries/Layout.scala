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
    // n rides on the ranked rows as a column (r18 fused operator), so
    // boundary membership is decided per row instead of joining an
    // exploded bucket frame: rank r is bucket b's upper boundary iff
    // (b·n) DIV k == r, i.e. b ∈ [⌈k·r/n⌉, ⌊(k·r + k−1)/n⌋] — the
    // same rows and the same (possibly repeated, when n < k) buckets
    // the old bounds join produced, with no second branch over the
    // ranked subtree
    val ranked = Sampling.rankDistributedWithCounts(
      vals, Seq.empty, Seq(col(valCol)), "n")
    ranked
      .withColumn("bmin",
        greatest(lit(1L), expr(s"($HistBuckets * rk + n - 1) DIV n")))
      .withColumn("bmax",
        least(lit(HistBuckets.toLong), expr(s"($HistBuckets * rk + ${HistBuckets - 1}) DIV n")))
      .filter(col("bmax") >= col("bmin"))
      .select(explode(expr("sequence(bmin, bmax)")).as("bucket"),
        col("rk"), col("n"), col(valCol))
      .select(col("bucket"), col("rk").as("upper_rank"),
        col(valCol).as("upper_value"),
        (col("rk") - expr(s"((bucket - 1) * n) DIV $HistBuckets")).as("n_rows"))
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

  // q253 — columnar encoding advisor: for each column of the events
  // stream (event_type, user_id, ts_ms, value_cents) compute the EXACT
  // byte cost of writing it PLAIN, DICT, RLE, or DELTA+zigzag-varint
  // in physical (event_id) order, and pick the cheapest — the decision
  // a parquet/ORC writer makes per column chunk, surfaced as an
  // auditable plan. Cost models (integers end to end):
  //   plain  = 8n (longs) | Σlen + 4n (strings);
  //   dict   = dict storage + n · ceil(bitlen(ndv−1)/8);
  //   rle    = runs · (value slot + 4-byte run length);
  //   delta  = Σ varint(zigzag(v − prev)) — LEB128 7-bit groups,
  //            absent predecessor (id gap / first row) stores v whole.
  // "Previous row" is the row with event_id−1 (an equi-join, not a
  // global-sort window); an id gap breaks the run / delta chain in
  // both engines identically. Varint length = max(ceil(bitlen/7), 1)
  // with bitlen from binary-string length — integer log2, never
  // floating log (q181's rule). Ties pick the alphabetically first
  // encoding. Strings get no delta (b_delta = −1).
  //
  // Scale shape: one shuffled self-join on event_id±1 (O(N), the
  // distributed lag without a single-partition window), ONE grouped
  // aggregate computing every model's Σ-term for all four columns in a
  // single pass (count(DISTINCT ×3) expands map-side), plus one tiny
  // distinct-lengths aggregate for the string dictionary; the output
  // unpivots a 1-row frame to 4 rows driver-free.
  private def q253(s: SparkSession, d: String): DataFrame = {
    // full bit-length (bin('100') = 3 bits), NOT bitlen-1: LEB128
    // stores zigzag 128 (bitlen 8) in ceil(8/7) = 2 bytes — q235's rule
    def bl(x: String) = s"length(bin($x))"
    def vb(z: String) = s"greatest(CAST((${bl(z)} + 6) DIV 7 AS BIGINT), 1L)"
    def zz(x: String) = s"(CASE WHEN ($x) >= 0 THEN 2*($x) ELSE -2*($x)-1 END)"
    def runs(c: String) =
      s"CAST(sum(CASE WHEN p_id IS NULL OR p_$c <> $c THEN 1 ELSE 0 END) AS BIGINT)"
    def deltaB(c: String) =
      s"CAST(sum(${vb(zz(s"CASE WHEN p_id IS NULL THEN $c ELSE $c - p_$c END"))}) AS BIGINT)"
    def idxw(ndv: String) = s"greatest(CAST((${bl(s"$ndv - 1")} + 7) DIV 8 AS BIGINT), 1L)"

    val e0 = events(s, d).select(col("event_id"), col("event_type"),
      col("user_id"), col("ts_ms"),
      expr("CAST(round(value * 100) AS BIGINT)").as("vc"))
    val prev = e0.select((col("event_id") + 1).as("p_join"),
      col("event_id").as("p_id"), col("event_type").as("p_event_type"),
      col("user_id").as("p_user_id"), col("ts_ms").as("p_ts_ms"),
      col("vc").as("p_vc"))
    val j = e0.join(prev, col("event_id") === col("p_join"), "left_outer")
    val agg = j.agg(
      count(lit(1)).as("n"),
      countDistinct(col("event_type")).as("ndv_et"),
      countDistinct(col("user_id")).as("ndv_u"),
      countDistinct(col("ts_ms")).as("ndv_t"),
      countDistinct(col("vc")).as("ndv_v"),
      sum(length(col("event_type"))).cast("long").as("lensum_et"),
      max(length(col("event_type"))).cast("long").as("maxlen_et"),
      expr(runs("event_type")).as("runs_et"),
      expr(runs("user_id")).as("runs_u"),
      expr(runs("ts_ms")).as("runs_t"),
      expr(runs("vc")).as("runs_v"),
      expr(deltaB("user_id")).as("db_u"),
      expr(deltaB("ts_ms")).as("db_t"),
      expr(deltaB("vc")).as("db_v"))
    val dictEt = e0.select(col("event_type")).distinct()
      .agg(sum(length(col("event_type")) + 4).cast("long").as("dictlen_et"))
    val base = agg.crossJoin(broadcast(dictEt))
    def longCol(name: String, ndv: String, rn: String, db: String) =
      base.select(lit(name).as("col_name"), col("n"),
        col(ndv).as("ndv"), col(rn).as("n_runs"),
        (col("n") * 8).as("b_plain"),
        (col(ndv) * 8 + col("n") * expr(idxw(ndv))).as("b_dict"),
        (col(rn) * 12).as("b_rle"),
        col(db).as("b_delta"))
    val stringCol =
      base.select(lit("event_type").as("col_name"), col("n"),
        col("ndv_et").as("ndv"), col("runs_et").as("n_runs"),
        (col("lensum_et") + col("n") * 4).as("b_plain"),
        (col("dictlen_et") + col("n") * expr(idxw("ndv_et"))).as("b_dict"),
        (col("runs_et") * (col("maxlen_et") + 4)).as("b_rle"),
        lit(-1L).as("b_delta"))
    stringCol
      .unionAll(longCol("ts_ms", "ndv_t", "runs_t", "db_t"))
      .unionAll(longCol("user_id", "ndv_u", "runs_u", "db_u"))
      .unionAll(longCol("value_cents", "ndv_v", "runs_v", "db_v"))
      .withColumn("best", expr(
        """CASE
          |  WHEN b_delta <> -1 AND b_delta <= least(b_dict, b_plain, b_rle)
          |    THEN 'delta'
          |  WHEN b_dict <= least(b_plain, b_rle) THEN 'dict'
          |  WHEN b_plain <= b_rle THEN 'plain'
          |  ELSE 'rle' END""".stripMargin))
      .orderBy(col("col_name"))
  }

  private val q253Sql = {
    def bl(x: String) = s"length(printf('%b', $x))"
    def vb(z: String) = s"greatest((${bl(z)} + 6) // 7, 1)"
    def zz(x: String) = s"(CASE WHEN ($x) >= 0 THEN 2*($x) ELSE -2*($x)-1 END)"
    def runs(c: String) =
      s"CAST(sum(CASE WHEN p.event_id IS NULL OR p.$c <> e.$c THEN 1 ELSE 0 END) AS BIGINT)"
    def deltaB(c: String) =
      s"CAST(sum(${vb(zz(s"CASE WHEN p.event_id IS NULL THEN e.$c ELSE e.$c - p.$c END"))}) AS BIGINT)"
    def idxw(ndv: String) = s"greatest((${bl(s"$ndv - 1")} + 7) // 8, 1)"
    s"""WITH ev AS (
      |  SELECT event_id, event_type, user_id, epoch_ms(ts) AS ts_ms,
      |    CAST(round(value * 100) AS BIGINT) AS vc
      |  FROM events),
      |agg AS (
      |  SELECT count(*) AS n,
      |    count(DISTINCT e.event_type) AS ndv_et,
      |    count(DISTINCT e.user_id) AS ndv_u,
      |    count(DISTINCT e.ts_ms) AS ndv_t,
      |    count(DISTINCT e.vc) AS ndv_v,
      |    CAST(sum(length(e.event_type)) AS BIGINT) AS lensum_et,
      |    CAST(max(length(e.event_type)) AS BIGINT) AS maxlen_et,
      |    ${runs("event_type")} AS runs_et,
      |    ${runs("user_id")} AS runs_u,
      |    ${runs("ts_ms")} AS runs_t,
      |    ${runs("vc")} AS runs_v,
      |    ${deltaB("user_id")} AS db_u,
      |    ${deltaB("ts_ms")} AS db_t,
      |    ${deltaB("vc")} AS db_v
      |  FROM ev e LEFT JOIN ev p ON p.event_id = e.event_id - 1),
      |dict AS (
      |  SELECT CAST(sum(length(event_type) + 4) AS BIGINT) AS dictlen_et
      |  FROM (SELECT DISTINCT event_type FROM ev)),
      |base AS (SELECT * FROM agg, dict),
      |rows0 AS (
      |  SELECT 'event_type' AS col_name, n, ndv_et AS ndv,
      |    runs_et AS n_runs, lensum_et + n * 4 AS b_plain,
      |    dictlen_et + n * ${idxw("ndv_et")} AS b_dict,
      |    runs_et * (maxlen_et + 4) AS b_rle, CAST(-1 AS BIGINT) AS b_delta
      |  FROM base
      |  UNION ALL
      |  SELECT 'ts_ms', n, ndv_t, runs_t, n * 8,
      |    ndv_t * 8 + n * ${idxw("ndv_t")}, runs_t * 12, db_t FROM base
      |  UNION ALL
      |  SELECT 'user_id', n, ndv_u, runs_u, n * 8,
      |    ndv_u * 8 + n * ${idxw("ndv_u")}, runs_u * 12, db_u FROM base
      |  UNION ALL
      |  SELECT 'value_cents', n, ndv_v, runs_v, n * 8,
      |    ndv_v * 8 + n * ${idxw("ndv_v")}, runs_v * 12, db_v FROM base)
      |SELECT col_name, n, ndv, n_runs, b_plain, b_dict, b_rle, b_delta,
      |  CASE
      |    WHEN b_delta <> -1 AND b_delta <= least(b_dict, b_plain, b_rle)
      |      THEN 'delta'
      |    WHEN b_dict <= least(b_plain, b_rle) THEN 'dict'
      |    WHEN b_plain <= b_rle THEN 'plain'
      |    ELSE 'rle' END AS best
      |FROM rows0 ORDER BY col_name""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q("q146_zorder_layout", q146, Some(q146Sql)),
    Q("q152_equidepth_stats", q152, Some(q152Sql)),
    Q("q190_zone_map_prune", q190, Some(q190Sql)),
    Q("q253_encoding_advisor", q253, Some(q253Sql)),
  )
}
