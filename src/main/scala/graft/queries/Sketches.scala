package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables._
import graft.functions.TextFns._

/** Sketch-backed operators: Count-Min heavy-hitter estimation over the
  * corpus n-gram stream and a Bloom-prefiltered semi-join. Both follow
  * the KMV/q48 principle — every hash is portable mod-p affine
  * arithmetic over the md5-based hash60, so the ENTIRE sketch state is
  * bit-reproducible in DuckDB SQL and the oracle checks the sketch
  * itself, not just a derived answer.
  */
object Sketches {

  // ---- q83: Count-Min sketch heavy hitters ------------------------------

  /** Sketch shape: depth×width cells. Width is deliberately far below
    * the ~16k distinct trigrams so collisions (and therefore the
    * overestimates the CMS ε-δ bound describes) actually occur at test
    * scale; at 100 TB width scales with the ε target, never with the
    * stream length — that independence is the point of the sketch.
    */
  val CmsDepth = 4
  val CmsWidth = 256
  val CmsTop = 20
  val P = 2147483647L

  /** Row-j bucket of a 60-bit key hash: affine mod-p, then mod width.
    * (2j+1) ≤ 7 times a 60-bit value stays under 2^63 — no overflow in
    * either engine.
    */
  private def cmsBucket(keyHash: Column, j: Column): Column =
    ((lit(2L) * j + 1L) * keyHash + lit(9176L) * j) % P % CmsWidth

  /** Corpus-wide trigram counts (with multiplicity — this is the
    * frequency stream the sketch summarizes, not the q81 document
    * frequency). Vocabulary-sized output: ~16k rows at any SF.
    */
  private def gramCounts(s: SparkSession, d: String): DataFrame =
    Corpus.docGrams(s, d)
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("n"))

  // q83 — build the CMS from the AGGREGATED vocabulary (so the sketch
  // construction shuffles vocab-sized, not corpus-sized, data: the
  // corpus-sized work is the same map-side-combined gram count every
  // frequency query needs), then report the top-20 exact heavy hitters
  // next to their CMS estimates. The cell sums are whole-partition
  // window aggregates over (row, bucket) — ONE linear plan off a single
  // corpus scan; the earlier two-branch form (cells aggregate + top-20
  // joined back) re-planned the scan+explode+count lineage per branch,
  // i.e. read the corpus twice. estimate = min over depth rows of the
  // cell sum; the CMS invariant estimate >= exact holds by construction
  // and is additionally pinned by CorpusSketchesSpec.
  private def q83(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("j"), col("bucket"))
    gramCounts(s, d)
      .select(col("gram"), col("n"),
        explode(sequence(lit(0L), lit((CmsDepth - 1).toLong))).as("j"))
      .withColumn("bucket", cmsBucket(hash60(col("gram")), col("j")))
      .withColumn("cell_n", sum(col("n")).over(w))
      .groupBy(col("gram"), col("n"))
      .agg(min(col("cell_n")).as("n_cms"))
      .orderBy(col("n").desc, col("gram"))
      .limit(CmsTop)
      .select(col("gram"), col("n").as("n_exact"), col("n_cms"))
      .orderBy(col("n_exact").desc, col("gram"))
  }

  private val q83Sql = {
    val gram = (0 until Corpus.GramLen).map(j => s"toks[i+${j + 1}]").mkString(" || ' ' || ")
    def bucket(h: String, j: String) =
      s"(((2*$j+1)*$h + 9176*$j) % $P) % $CmsWidth"
    s"""WITH t AS (SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
      |           FROM documents),
      |g AS (SELECT unnest(list_transform(
      |        range(greatest(len(toks) - ${Corpus.GramLen - 1}, 0)), i -> $gram)) AS gram
      |      FROM t),
      |counts AS (SELECT gram, count(*) AS n FROM g GROUP BY gram),
      |hashed AS (SELECT gram, n, ${hash60Sql("gram")} AS h FROM counts),
      |js AS (SELECT unnest([${(0 until CmsDepth).mkString(", ")}]) AS j),
      |cells AS (SELECT j, ${bucket("h", "j")} AS bucket, CAST(sum(n) AS BIGINT) AS cell_n
      |          FROM hashed CROSS JOIN js GROUP BY 1, 2),
      |top AS (SELECT gram, n, h FROM hashed ORDER BY n DESC, gram LIMIT $CmsTop)
      |SELECT top.gram, top.n AS n_exact, CAST(min(c.cell_n) AS BIGINT) AS n_cms
      |FROM top CROSS JOIN js
      |JOIN cells c ON c.j = js.j AND c.bucket = ${bucket("top.h", "js.j")}
      |GROUP BY top.gram, top.n
      |ORDER BY n_exact DESC, top.gram""".stripMargin
  }

  /** CMS cell table (j, bucket, cell_n) of a documents frame, as ONE
    * aggregation over per-occurrence gram rows — each occurrence adds 1
    * to its depth-many cells, so `count(*)` per (row, bucket) IS the
    * cell sum. Works identically over a batch frame and a streaming
    * frame (Structured Streaming allows a single aggregation: this is
    * the incremental-sketch-maintenance form — state is exactly the
    * depth×width cell table, never the stream), which is the defining
    * property of the CMS. Batch output equals q83's windowed cell sums;
    * CorpusSketchesSpec pins the batch/streaming equality.
    */
  def cmsCellsOf(docsDf: DataFrame): DataFrame =
    Corpus.docGramsOf(docsDf)
      .select(explode(sequence(lit(0L), lit((CmsDepth - 1).toLong))).as("j"),
        hash60(col("gram")).as("h"))
      .select(col("j"), cmsBucket(col("h"), col("j")).as("bucket"))
      .groupBy(col("j"), col("bucket"))
      .agg(count(lit(1)).as("cell_n"))

  // ---- q84: Bloom-prefiltered semi-join ----------------------------------

  /** Small bitset on purpose: at sf0.01 the build side sets ~20% of the
    * bits, so false positives occur and the exact verify stage is
    * load-bearing (SketchesSpec counts them). Production sizing is
    * m ≈ 1.44·k·n for the target FP rate.
    */
  val BloomK = 3
  val BloomM = 4096

  private def dsum(c: Column): Column =
    sum(c.cast(DecimalType(14, 2))).cast("double")

  /** Bloom-hit orders (true AUTOMOBILE-customer orders plus FPs),
    * exposed for the spec's pruning assertions.
    */
  private[queries] def bloomCandidates(s: SparkSession, d: String): DataFrame = {
    val build = customer(s, d)
      .filter(col("c_mktsegment") === "AUTOMOBILE")
      .select(col("c_custkey"))
    val bits = graft.ops.BloomPrefilter.bitset(
      build, hash60(col("c_custkey").cast("string")), BloomK, BloomM)
    graft.ops.BloomPrefilter.prefilter(
      orders(s, d), hash60(col("o_custkey").cast("string")), bits, BloomK, BloomM)
  }

  // q84 — orders of AUTOMOBILE-segment customers via Bloom prefilter +
  // exact verify semi-join, aggregated per priority. The result is
  // byte-identical to the plain semi-join (the Bloom stage only
  // prunes), so the oracle is the ordinary IN subquery. Plan note: in
  // the composed query Catalyst's PushDownLeftSemiAntiJoin moves the
  // verify semi-join BELOW the Bloom filter whenever it may — here the
  // build side broadcasts, so verify-first is genuinely cheaper and
  // the optimizer is right to collapse the pipeline. The stage order
  // the operator exists for — Bloom cut first, expensive join over
  // survivors only — applies when the build side is too big to
  // broadcast; production pipelines materialize the prefiltered
  // survivors between the stages (or get this exact push from Spark's
  // own InjectRuntimeFilter), and the prefilter stage's plan shape is
  // pinned by CorpusSketchesSpec.
  private def q84(s: SparkSession, d: String): DataFrame = {
    val buildKeys = customer(s, d)
      .filter(col("c_mktsegment") === "AUTOMOBILE")
      .select(col("c_custkey"))
    bloomCandidates(s, d)
      .join(buildKeys, col("o_custkey") === col("c_custkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_price"))
      .orderBy(col("o_orderpriority"))
  }

  private val q84Sql =
    """SELECT o_orderpriority, count(*) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total_price
      |FROM orders
      |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE')
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // ---- q134: HyperLogLog cardinality sketch ------------------------------

  /** HLL precision: p=6 → m=64 registers per group, rho over the
    * remaining w=54 bits of the 60-bit portable hash. m is deliberately
    * small so the test-scale relative error (~1.04/√64 = 13%) is
    * visible next to the exact count; production sizing raises p, never
    * touches the stream-length-independent structure.
    */
  val HllP = 6
  val HllM = 64 // 1 << HllP
  val HllW = 54 // 60 - HllP

  /** Register table (group, bucket, reg) of a hashed column: bucket =
    * top p bits, reg = max over the group's values of rho(lower w
    * bits), rho = 1-based position of the first set bit (w+1 when the
    * suffix is all zeros). Everything is integer/bit-string arithmetic
    * on the md5-based hash60, so DuckDB reproduces the registers — and
    * therefore the whole sketch state — bit-exactly (the KMV/CMS
    * principle; unlike those, HLL is the industry-standard mergeable
    * cardinality sketch, so this is the one a 100 TB distinct-count
    * dashboard actually runs). The aggregation is max-per-(group,
    * bucket): map-side combinable, shuffle is groups×64 rows no matter
    * the corpus size, and registers merge across shards/streams by the
    * same max — the defining HLL property.
    */
  def hllRegistersOf(rows: DataFrame, group: String, hashed: Column): DataFrame = {
    val bucket = shiftright(hashed, HllW)
    val rem = hashed % (1L << HllW)
    val rho = instr(lpad(bin(rem), HllW, "0"), "1")
    rows
      .select(col(group), bucket.as("bucket"),
        when(rho === 0, lit(HllW + 1)).otherwise(rho).cast("long").as("rho"))
      .groupBy(col(group), col("bucket"))
      .agg(max(col("rho")).as("reg"))
  }

  // q134 — HLL distinct-document estimate per language, next to the
  // exact count. The harmonic-mean denominator is kept in EXACT int64
  // arithmetic — numerator = Σ_buckets 2^(56−reg) with empty buckets
  // contributing 2^56 (reg=0) — so the estimate is one correctly-
  // rounded double division of two exact integers and hash-compares
  // bit-exactly against DuckDB. (Terms ≤ 2^56, 64 of them → ≤ 2^62, no
  // overflow.) n_empty is reported for the linear-counting small-range
  // correction a production read applies; est here is the raw HLL
  // estimate so the oracle never depends on cross-engine ln().
  private def q134(s: SparkSession, d: String): DataFrame = {
    val alpha = 0.709 // alpha_64
    hllRegistersOf(
      documents(s, d), "lang", hash60(col("text")))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_present"),
        max(col("reg")).as("max_reg"),
        sum(col("reg")).as("sum_reg"),
        sum(expr("shiftleft(1L, cast(56 - reg as int))")).as("present_num"))
      .select(
        col("lang"),
        (lit(HllM.toLong) - col("n_present")).as("n_empty"),
        col("max_reg"), col("sum_reg"),
        (col("present_num") +
          (lit(HllM.toLong) - col("n_present")) * lit(1L << 56)).as("numerator"))
      .withColumn("est",
        lit(alpha) * lit((HllM.toLong * HllM).toDouble) * lit((1L << 56).toDouble)
          / col("numerator"))
      .join(
        documents(s, d).groupBy(col("lang"))
          .agg(countDistinct(col("text")).as("exact_distinct")),
        Seq("lang"))
      .select(col("lang"), col("exact_distinct"), col("n_empty"), col("max_reg"),
        col("sum_reg"), col("numerator"), col("est"))
      .orderBy(col("lang"))
  }

  private val q134Sql =
    s"""WITH h AS (SELECT lang, ${hash60Sql("text")} AS h FROM documents),
      |regs AS (
      |  SELECT lang, h // ${1L << HllW} AS bucket,
      |    max(CASE WHEN strpos(lpad(bin(h % ${1L << HllW}), $HllW, '0'), '1') = 0
      |             THEN ${HllW + 1}
      |             ELSE strpos(lpad(bin(h % ${1L << HllW}), $HllW, '0'), '1') END) AS reg
      |  FROM h GROUP BY 1, 2),
      |folded AS (
      |  SELECT lang, count(*) AS n_present, max(reg) AS max_reg,
      |    CAST(sum(reg) AS BIGINT) AS sum_reg,
      |    CAST(sum(1::BIGINT << CAST(56 - reg AS INT)) AS BIGINT) AS present_num
      |  FROM regs GROUP BY lang),
      |exact AS (SELECT lang, count(DISTINCT text) AS exact_distinct
      |          FROM documents GROUP BY lang)
      |SELECT f.lang, e.exact_distinct, $HllM - f.n_present AS n_empty,
      |  f.max_reg, f.sum_reg,
      |  f.present_num + ($HllM - f.n_present) * ${1L << 56} AS numerator,
      |  0.709 * CAST(${HllM.toLong * HllM} AS DOUBLE) * CAST(${1L << 56} AS DOUBLE)
      |    / (f.present_num + ($HllM - f.n_present) * ${1L << 56}) AS est
      |FROM folded f JOIN exact e USING (lang)
      |ORDER BY f.lang""".stripMargin

  // ---- q148: sliding-window HLL union ------------------------------------

  // q148 — the property that makes HLL the scale sketch, exercised as
  // a query: per-hour user registers UNION into 3-hour sliding windows
  // by register-wise max — computing each window's distinct-user
  // estimate from the hourly sketch table alone, never re-touching the
  // event stream. The expansion is hours×64×3 rows (sketch-sized, not
  // data-sized); this is exactly how a distinct-count dashboard serves
  // arbitrary window queries over 100 TB of logs from megabytes of
  // registers. The exact sliding distinct runs alongside (that side IS
  // data-sized — the point of the comparison) and the estimate reuses
  // q134's exact-integer numerator, so every column hash-matches
  // DuckDB.
  val HllWinHours = 3

  private def q148(s: SparkSession, d: String): DataFrame = {
    val alpha = 0.709 // alpha_64
    val ev = events(s, d)
      .select(expr("ts_ms div 3600000").as("hr"), col("user_id"))
    val regs = hllRegistersOf(ev, "hr", hash60(col("user_id").cast("string")))
      .localCheckpoint() // sketch-sized; feeds the expansion and the hour list
    val hours = regs.select(col("hr").as("wend")).distinct()
    val offs = (0 until HllWinHours).map(o => col("hr") + o)
    val win = regs.select(explode(array(offs: _*)).as("wend"), col("bucket"), col("reg"))
      .join(broadcast(hours), Seq("wend")) // only windows ending at a real hour
      .groupBy(col("wend"), col("bucket")).agg(max(col("reg")).as("reg"))
    val folded = win.groupBy(col("wend"))
      .agg(count(lit(1)).as("n_present"),
        sum(expr("shiftleft(1L, cast(56 - reg as int))")).as("present_num"))
      .select(col("wend"), col("n_present"),
        (col("present_num") +
          (lit(HllM.toLong) - col("n_present")) * lit(1L << 56)).as("numerator"))
      .withColumn("est",
        lit(alpha) * lit((HllM.toLong * HllM).toDouble) * lit((1L << 56).toDouble)
          / col("numerator"))
    val exOffs = (0 until HllWinHours).map(o => col("hr") + o)
    val exact = ev.select(explode(array(exOffs: _*)).as("wend"), col("user_id"))
      .join(broadcast(hours), Seq("wend"))
      .groupBy(col("wend")).agg(countDistinct(col("user_id")).as("exact_distinct"))
    folded.join(exact, Seq("wend"))
      .select(col("wend").as("window_end_hr"), col("exact_distinct"),
        col("n_present"), col("numerator"), col("est"))
      .orderBy(col("window_end_hr"))
  }

  private val q148Sql = {
    val rho = (h: String) =>
      s"""CASE WHEN strpos(lpad(bin($h % ${1L << HllW}), $HllW, '0'), '1') = 0
         |     THEN ${HllW + 1}
         |     ELSE strpos(lpad(bin($h % ${1L << HllW}), $HllW, '0'), '1') END""".stripMargin
    s"""WITH ev AS (
      |  SELECT epoch_ms(ts) // 3600000 AS hr, user_id FROM events),
      |hh AS (SELECT hr, ${hash60Sql("CAST(user_id AS VARCHAR)")} AS h FROM ev),
      |regs AS (
      |  SELECT hr, h // ${1L << HllW} AS bucket, max(${rho("h")}) AS reg
      |  FROM hh GROUP BY 1, 2),
      |hours AS (SELECT DISTINCT hr FROM regs),
      |win AS (
      |  SELECT x.wend, x.bucket, max(x.reg) AS reg
      |  FROM (SELECT r.hr + o.o AS wend, bucket, reg
      |        FROM regs r, (SELECT unnest([${(0 until HllWinHours).mkString(", ")}]) AS o) o) x
      |  JOIN hours ON x.wend = hours.hr
      |  GROUP BY 1, 2),
      |folded AS (
      |  SELECT wend, count(*) AS n_present,
      |    CAST(sum(1::BIGINT << CAST(56 - reg AS INT)) AS BIGINT) AS present_num
      |  FROM win GROUP BY wend),
      |exact AS (
      |  SELECT x.wend, count(DISTINCT x.user_id) AS exact_distinct
      |  FROM (SELECT e.hr + o.o AS wend, user_id
      |        FROM ev e, (SELECT unnest([${(0 until HllWinHours).mkString(", ")}]) AS o) o) x
      |  JOIN hours ON x.wend = hours.hr
      |  GROUP BY x.wend)
      |SELECT f.wend AS window_end_hr, e.exact_distinct, f.n_present,
      |  f.present_num + ($HllM - f.n_present) * ${1L << 56} AS numerator,
      |  0.709 * CAST(${HllM.toLong * HllM} AS DOUBLE) * CAST(${1L << 56} AS DOUBLE)
      |    / (f.present_num + ($HllM - f.n_present) * ${1L << 56}) AS est
      |FROM folded f JOIN exact e ON e.wend = f.wend
      |ORDER BY window_end_hr""".stripMargin
  }

  // q192 — EXACT sliding distinct actives (trailing-24h DAU per hour)
  // WITHOUT the ×W data explosion: q148's exact side multiplies every
  // event row by the window width (fine at W=3, fatal at W=24 over
  // 100 TB); this is the scale-shaped exact algorithm. Per user, the
  // distinct event hours become COVERAGE INTERVALS of window-ends
  // (event at hour h makes the user active for window-ends
  // [h, h+W−1]; runs with gaps ≤ W merge — the q28 session pattern on
  // the hour domain), each interval emits ±1 boundary deltas, and the
  // per-hour active count is the running sum of deltas over the dense
  // hour grid. Work is O(distinct (user, hour)) regardless of W; the
  // final prefix runs over the HOURS-sized frame (a decade is ~88k
  // rows — bounded, so a plain ordered window is the right tool, not
  // the distributed prefix). Dense grid: silent hours still report
  // their trailing actives, and a fully-idle hour reports 0.
  //
  // The DuckDB oracle is DELIBERATELY the naive data-sized form (a
  // range join of the grid against events) — a structurally different
  // derivation, so it actually checks the sweep instead of replaying
  // it.
  val SlideWinHours = 24

  private def q192(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = events(s, d)
      .select(col("user_id"), expr("ts_ms div 3600000").as("hr"))
      .distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("hr"))
    val iv = ev
      .withColumn("prev", lag(col("hr"), 1).over(w))
      .withColumn("newiv",
        when(col("prev").isNull || col("hr") - col("prev") > SlideWinHours, 1L)
          .otherwise(0L))
      .withColumn("ivid", sum(col("newiv"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("ivid"))
      .agg(min(col("hr")).as("s"),
        (max(col("hr")) + SlideWinHours - 1).as("e"))
    val deltas = iv.select(col("s").as("wend"), lit(1L).as("d"))
      .unionAll(iv.select((col("e") + 1).as("wend"), lit(-1L).as("d")))
      .groupBy(col("wend")).agg(sum(col("d")).as("d"))
    val bounds = ev.agg(min(col("hr")).as("h0"), max(col("hr")).as("h1"))
    val grid = bounds.select(explode(sequence(col("h0"), col("h1"))).as("wend"))
    val wg = Window.partitionBy(lit(1)).orderBy(col("wend"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(deltas, Seq("wend"), "left")
      .withColumn("d", coalesce(col("d"), lit(0L)))
      .withColumn("n_active", sum(col("d")).over(wg))
      .select(col("wend").as("window_end_hr"), col("n_active"))
      .orderBy(col("window_end_hr"))
  }

  private val q192Sql =
    s"""WITH ev AS (
      |  SELECT DISTINCT user_id, epoch_ms(ts) // 3600000 AS hr FROM events),
      |b AS (SELECT min(hr) AS h0, max(hr) AS h1 FROM ev),
      |g AS (SELECT unnest(range(h0, h1 + 1)) AS wend FROM b)
      |SELECT g.wend AS window_end_hr,
      |  CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_active
      |FROM g LEFT JOIN ev e
      |  ON e.hr BETWEEN g.wend - ${SlideWinHours - 1} AND g.wend
      |GROUP BY g.wend
      |ORDER BY window_end_hr""".stripMargin

  // q239 — HLL audience-overlap audit: estimate every event-type
  // pair's shared-user count FROM SKETCHES ALONE — union by
  // register-wise max (the lossless HLL merge), intersection by
  // inclusion-exclusion est_a + est_b − est_union — next to q197's
  // exact n_both. This is the known-treacherous HLL operation
  // (inclusion-exclusion error grows with the union/intersection
  // ratio, unlike the always-safe union), so the report carries the
  // signed error in fixed point: the dashboard-vs-truth gap a sketch
  // consumer must see before trusting overlap numbers. All three
  // estimates reuse q134's exact-integer numerator, and the final
  // est arithmetic is one fixed left-associated double expression, so
  // every column hash-matches DuckDB.
  //
  // Scale shape: registers aggregate once per type (types×64 rows, the
  // q134 shuffle bound); the dense per-type register grid makes each
  // pair merge an equi-join of two 64-row frames; the exact side is
  // q197's users-sized distinct — which is the side that stops
  // scaling, which is the point of having the sketch column.
  private def q239(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val regs = hllRegistersOf(ev, "event_type",
      hash60(col("user_id").cast("string")))
    // densify: every (type, bucket) cell, absent registers as 0
    val types = regs.select(col("event_type")).distinct()
    val dense = types
      .crossJoin(spark_range_buckets(ev.sparkSession))
      .join(regs, Seq("event_type", "bucket"), "left")
      .withColumn("reg", coalesce(col("reg"), lit(0L)))
      .localCheckpoint(false) // both pair-join sides + the singles
    def numerator(grouped: DataFrame): Column =
      sum(expr("shiftleft(1L, cast(56 - reg as int))")).as("num")
    val singles = dense.groupBy(col("event_type")).agg(numerator(dense))
    val pairs = dense.as("a").join(dense.as("b"),
        col("a.bucket") === col("b.bucket") &&
          col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"))
      .agg(sum(expr(
        "shiftleft(1L, cast(56 - greatest(a.reg, b.reg) as int))")).as("num_u"))
    val dt = ev.select(col("user_id"), col("event_type")).distinct()
    val exact = dt.as("a").join(dt.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("exact_both"))
    val c = 0.709 * (HllM.toLong * HllM).toDouble * (1L << 56).toDouble
    pairs
      .join(broadcast(singles.select(col("event_type").as("type_a"), col("num").as("na"))),
        "type_a")
      .join(broadcast(singles.select(col("event_type").as("type_b"), col("num").as("nb"))),
        "type_b")
      .join(exact, Seq("type_a", "type_b"))
      .withColumn("est_both",
        lit(c) / col("na") + lit(c) / col("nb") - lit(c) / col("num_u"))
      .select(col("type_a"), col("type_b"), col("exact_both"), col("num_u"),
        col("est_both"),
        // truncate the double product to BIGINT FIRST (Spark CAST and
        // DuckDB trunc both round toward zero), then integer-divide
        expr(s"CAST((est_both - exact_both) * 1048576 AS BIGINT) DIV greatest(exact_both, 1)")
          .as("err_fp"))
      .orderBy(col("type_a"), col("type_b"))
  }

  /** The 64-bucket grid frame (bucket 0..m−1). */
  private def spark_range_buckets(s: SparkSession): DataFrame =
    s.range(HllM.toLong).select(col("id").as("bucket"))

  private val q239Sql = {
    val w = 1L << HllW
    val rho = s"CASE WHEN strpos(lpad(bin(h % $w), $HllW, '0'), '1') = 0 " +
      s"THEN ${HllW + 1} ELSE strpos(lpad(bin(h % $w), $HllW, '0'), '1') END"
    s"""WITH h AS (
      |  SELECT event_type, ${hash60Sql("CAST(user_id AS VARCHAR)")} AS h
      |  FROM events),
      |regs AS (
      |  SELECT event_type, h // $w AS bucket, max($rho) AS reg
      |  FROM h GROUP BY 1, 2),
      |types AS (SELECT DISTINCT event_type FROM regs),
      |grid AS (SELECT event_type, gs.bucket
      |  FROM types, (SELECT unnest(range($HllM)) AS bucket) gs),
      |dense AS (
      |  SELECT g.event_type, g.bucket, coalesce(r.reg, 0) AS reg
      |  FROM grid g LEFT JOIN regs r
      |    ON g.event_type = r.event_type AND g.bucket = r.bucket),
      |singles AS (
      |  SELECT event_type,
      |    CAST(sum(1::BIGINT << CAST(56 - reg AS INT)) AS BIGINT) AS num
      |  FROM dense GROUP BY event_type),
      |pairs AS (
      |  SELECT a.event_type AS type_a, b.event_type AS type_b,
      |    CAST(sum(1::BIGINT << CAST(56 - greatest(a.reg, b.reg) AS INT)) AS BIGINT)
      |      AS num_u
      |  FROM dense a JOIN dense b
      |    ON a.bucket = b.bucket AND a.event_type < b.event_type
      |  GROUP BY 1, 2),
      |dt AS (SELECT DISTINCT user_id, event_type FROM events),
      |exact AS (
      |  SELECT a.event_type AS type_a, b.event_type AS type_b,
      |    count(*) AS exact_both
      |  FROM dt a JOIN dt b
      |    ON a.user_id = b.user_id AND a.event_type < b.event_type
      |  GROUP BY 1, 2),
      |f AS (
      |  SELECT p.type_a, p.type_b, e.exact_both, p.num_u,
      |    ${0.709 * (64L * 64).toDouble} * CAST(${1L << 56} AS DOUBLE) / sa.num
      |    + ${0.709 * (64L * 64).toDouble} * CAST(${1L << 56} AS DOUBLE) / sb.num
      |    - ${0.709 * (64L * 64).toDouble} * CAST(${1L << 56} AS DOUBLE) / p.num_u
      |      AS est_both
      |  FROM pairs p
      |  JOIN singles sa ON sa.event_type = p.type_a
      |  JOIN singles sb ON sb.event_type = p.type_b
      |  JOIN exact e ON e.type_a = p.type_a AND e.type_b = p.type_b)
      |SELECT type_a, type_b, exact_both, num_u, est_both,
      |  CAST(CAST(trunc((est_both - exact_both) * 1048576) AS BIGINT)
      |    // greatest(exact_both, 1) AS BIGINT) AS err_fp
      |FROM f ORDER BY type_a, type_b""".stripMargin
  }

  // ---- q259: q-digest mergeable quantile sketch -------------------------

  /** Universe bits for l_extendedprice cents: TPC-H prices top out near
    * 10^7 cents < 2^24, so every value is a leaf of a 24-level binary
    * tree over [0, 2^24).
    */
  val QdUniverseBits = 24

  /** Compression constant k: merge threshold is ⌊n/k⌋. Digest size is
    * O(k) nodes REGARDLESS of corpus size and the rank error of any
    * quantile answered from it is ≤ (U/k)·n ≈ 2.3% of n at k=1024 —
    * that corpus-size independence is the point of the sketch.
    */
  val QdK = 1024L

  /** Parallel compression fans the universe into 2^5 = 32 independent
    * subtrees; only the top 5 levels (≤ 63 nodes) funnel to one task.
    */
  val QdSubtreeBits = 5

  val QdPcts = Seq(1L, 5L, 25L, 50L, 75L, 90L, 99L)

  /** One canonical bottom-up q-digest compression pass (Shrivastava et
    * al., SenSys'04, batch form): input nodes uniformly at `fromLevel`
    * of the heap numbering (leaf value v ↦ node 2^U + v); each level,
    * sibling groups whose combined count is ≤ thr merge into the
    * parent, the rest freeze into the digest; repeat down to
    * (exclusive) level `downTo`. Emits frozen nodes plus the residual
    * nodes left at `downTo`. Deterministic and merge-order-independent:
    * every decision depends only on a per-parent count SUM, so the
    * result is a pure function of the exact leaf counts — which is
    * what lets DuckDB replicate the digest bit-for-bit.
    */
  private def qdCompress(rows: Iterator[(Long, Long)], fromLevel: Int,
      downTo: Int, thr: Long): Iterator[(Long, Long)] = {
    import scala.collection.mutable
    var cur = mutable.LongMap.empty[Long]
    rows.foreach { case (node, c) => cur(node) = cur.getOrElse(node, 0L) + c }
    val frozen = mutable.ArrayBuffer.empty[(Long, Long)]
    var lvl = fromLevel
    while (lvl > downTo && cur.nonEmpty) {
      val tot = mutable.LongMap.empty[Long]
      cur.foreach { case (node, c) =>
        val p = node >> 1; tot(p) = tot.getOrElse(p, 0L) + c
      }
      val next = mutable.LongMap.empty[Long]
      tot.foreach { case (p, tc) => if (tc <= thr) next(p) = tc }
      cur.foreach { case (node, c) =>
        if (tot(node >> 1) > thr) frozen += ((node, c))
      }
      cur = next
      lvl -= 1
    }
    (frozen ++ cur.toSeq).iterator
  }

  /** Distributed canonical q-digest build from exact leaf counts
    * (`leaf`: (v, cnt)). Two stages, two tiny shuffles: stage 1
    * compresses each of the 32 value-range subtrees independently
    * (per-partition imperative logic — the one case the DataFrame API
    * genuinely can't express level-synchronous tree folding without 24
    * chained shuffles); stage 2 funnels the ≤ O(k) surviving rows to
    * one task and finishes the top 5 levels. The only corpus-scale
    * work is the map-side-combinable leaf groupBy the caller already
    * did — compression input is bounded by the 2^24 universe, not the
    * corpus, so the build is constant-cost at 100 TB. Per-shard
    * digests from this builder merge by nodewise count addition +
    * recompression (same function), which is how the sketch would ship
    * per-partition summaries on a real cluster.
    */
  private[graft] def qdigestOf(leaf: DataFrame, thr: Long): DataFrame = {
    val s = leaf.sparkSession
    import s.implicits._
    val U = QdUniverseBits; val B = QdSubtreeBits
    val leaves = leaf
      .select((col("v") + lit(1L << U)).as("node"),
        col("cnt").cast("long").as("cnt"))
      .as[(Long, Long)]
    val stage1 = leaves.groupByKey(_._1 >> (U - B))
      .flatMapGroups((_: Long, it: Iterator[(Long, Long)]) =>
        qdCompress(it, U, B, thr))
    val stage2 = stage1.groupByKey(_ => 0L)
      .flatMapGroups { (_: Long, it: Iterator[(Long, Long)]) =>
        val (froz, res) = it.toSeq.partition(t =>
          63 - java.lang.Long.numberOfLeadingZeros(t._1) > B)
        froz.iterator ++ qdCompress(res.iterator, B, 0, thr)
      }
    stage2.toDF("node", "cnt")
  }

  // q259 — mergeable bounded-state QUANTILE sketch: the sketch family
  // here covers cardinality (KMV q48, HLL q134), frequency (CMS q83),
  // membership (Bloom q84), and set reconciliation (IBLT q237), but
  // had no quantile member — q57/q152 answer quantiles EXACTLY via a
  // global sort/rank, which is a corpus-sized shuffle, not a mergeable
  // summary a 1000-executor scan can fold map-side. q-digest is the
  // deterministic, order-independent quantile sketch (unlike KLL /
  // t-digest, whose randomized/merge-order-dependent state cannot be
  // cross-checked bit-for-bit), so the oracle verifies the DIGEST
  // itself, not just a derived answer. Output per requested percentile:
  // the digest's answer, the exact answer, and the realized rank error
  // next to the ε·n = (U/k)·n guarantee.
  /** The q-digest's LIVE state: exact leaf counts per universe value —
    * a pure aggregate, so Structured Streaming maintains it
    * incrementally with the same code path as batch (the
    * StreamingSketchSpec convention); compression is a pure function
    * of this state, run on demand against any snapshot.
    */
  def qdLeafCounts(vals: DataFrame): DataFrame =
    vals.groupBy(col("v")).agg(count(lit(1)).as("cnt"))

  private def q259(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val U = QdUniverseBits
    val vals = lineitem(s, d)
      .select(expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("v"))
    // ndv-bounded (≤ 2^24 by the universe, ~600k at sf0.1) — checkpoint
    // once, feeds the digest build, the exact answers, and the audit
    val leaf = qdLeafCounts(vals).localCheckpoint()
    // 1-row bounded driver read (the q41/q87/q257 class)
    val n = leaf.agg(sum(col("cnt")).cast("long")).first().getLong(0)
    val thr = math.max(n / QdK, 1L)
    val digest = qdigestOf(leaf, thr)
    // node → covered value range [lo, hi]
    val rng = digest
      .withColumn("lvl", (length(bin(col("node"))) - 1).cast("int"))
      .withColumn("lo",
        expr(s"(node - shiftleft(1L, lvl)) * shiftleft(1L, $U - lvl)"))
      .withColumn("hi", expr(s"lo + shiftleft(1L, $U - lvl) - 1"))
    // quantile from the digest: scan nodes by (hi, lo), first node
    // whose cumulative count reaches the target rank answers with its
    // upper bound. Single-partition window over the ≤ 3k-node digest.
    val wcum = Window.orderBy(col("hi"), col("lo"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = rng.withColumn("cum", sum(col("cnt")).over(wcum))
    val tgt = QdPcts.toDF("pct")
      .select(col("pct"),
        greatest(expr(s"(pct * ${n}L + 99) DIV 100"), lit(1L)).as("target_rank"))
    val est = cum.crossJoin(broadcast(tgt))
      .where(col("cum") >= col("target_rank"))
      .groupBy(col("pct"), col("target_rank"))
      .agg(min(col("hi")).as("est_cents"))
    // exact answers from the leaf cumulative — ndv-bounded, never a
    // corpus-wide sort (the audit half stays universe-bounded too)
    val wleaf = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val leafCum = leaf.withColumn("cumv", sum(col("cnt")).over(wleaf))
    val exact = leafCum.crossJoin(broadcast(tgt))
      .where(col("cumv") >= col("target_rank"))
      .groupBy(col("pct")).agg(min(col("v")).as("exact_cents"))
    // realized rank error: rank(est) − target ≥ 0 by the digest scan
    val below = leaf.crossJoin(broadcast(est))
      .where(col("v") <= col("est_cents"))
      .groupBy(col("pct")).agg(sum(col("cnt")).cast("long").as("n_le_est"))
    val dn = digest.agg(count(lit(1)).as("digest_nodes"))
    est
      // one row per requested percentile on every side — provably
      // bounded by |QdPcts|, so broadcast EXPLICITLY: at sf0.001 AQE
      // happened to pick broadcast from stats, at sf0.1 the estimates
      // flipped these to sort-merge joins (the r14 cross-SF plan audit
      // caught it; PlanShapeSpec pins it now)
      .join(broadcast(exact), Seq("pct"))
      .join(broadcast(below), Seq("pct"))
      .crossJoin(broadcast(dn))
      .select(col("pct"), col("target_rank"), col("est_cents"),
        col("exact_cents"),
        (col("n_le_est") - col("target_rank")).as("rank_err"),
        col("digest_nodes"), lit(n).as("n_vals"))
      .orderBy(col("pct"))
  }

  private val q259Sql = {
    val U = QdUniverseBits
    // the 24 compression levels as chained MATERIALIZED CTEs (the q257
    // rule: every member referenced more than once must materialize)
    def lev(k: Int): Seq[String] = Seq(
      s"""g$k AS MATERIALIZED (
        |  SELECT node // 2 AS pnode, CAST(sum(cnt) AS BIGINT) AS tot
        |  FROM l$k GROUP BY 1)""".stripMargin,
      s"""f$k AS MATERIALIZED (
        |  SELECT l.node, l.cnt FROM l$k l
        |  JOIN g$k g ON l.node // 2 = g.pnode
        |  WHERE g.tot > (SELECT thr FROM t))""".stripMargin,
      s"""l${k - 1} AS MATERIALIZED (
        |  SELECT pnode AS node, tot AS cnt FROM g$k
        |  WHERE tot <= (SELECT thr FROM t))""".stripMargin)
    val digAll = ((U to 1 by -1).map(k => s"SELECT node, cnt FROM f$k") :+
      "SELECT node, cnt FROM l0").mkString(" UNION ALL ")
    s"""WITH leaf AS MATERIALIZED (
      |  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
      |    CAST(count(*) AS BIGINT) AS cnt
      |  FROM lineitem GROUP BY 1),
      |t AS MATERIALIZED (
      |  SELECT greatest(CAST(sum(cnt) AS BIGINT) // $QdK, 1) AS thr,
      |    CAST(sum(cnt) AS BIGINT) AS n FROM leaf),
      |l$U AS MATERIALIZED (
      |  SELECT v + (1::BIGINT << $U) AS node, cnt FROM leaf),
      |${(U to 1 by -1).flatMap(lev).mkString(",\n")},
      |dig AS MATERIALIZED ($digAll),
      |rng AS (
      |  SELECT node, cnt, length(printf('%b', node)) - 1 AS lvl FROM dig),
      |rng2 AS (
      |  SELECT node, cnt,
      |    (node - (1::BIGINT << lvl)) * (1::BIGINT << ($U - lvl)) AS lo,
      |    (node - (1::BIGINT << lvl)) * (1::BIGINT << ($U - lvl))
      |      + (1::BIGINT << ($U - lvl)) - 1 AS hi
      |  FROM rng),
      |cum AS MATERIALIZED (
      |  SELECT hi, lo, cnt,
      |    sum(cnt) OVER (ORDER BY hi, lo ROWS UNBOUNDED PRECEDING) AS cm
      |  FROM rng2),
      |tgt AS MATERIALIZED (
      |  SELECT CAST(pct AS BIGINT) AS pct,
      |    greatest((pct * (SELECT n FROM t) + 99) // 100, 1) AS target_rank
      |  FROM (SELECT unnest([${QdPcts.mkString(", ")}]) AS pct)),
      |est AS MATERIALIZED (
      |  SELECT pct, target_rank, min(hi) AS est_cents
      |  FROM cum, tgt WHERE cm >= target_rank GROUP BY 1, 2),
      |lc AS (
      |  SELECT v, sum(cnt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cumv
      |  FROM leaf),
      |ex AS (
      |  SELECT pct, min(v) AS exact_cents
      |  FROM lc, tgt WHERE cumv >= target_rank GROUP BY 1),
      |ble AS (
      |  SELECT e.pct, CAST(sum(cnt) AS BIGINT) AS n_le_est
      |  FROM est e, leaf WHERE v <= e.est_cents GROUP BY 1),
      |dn AS (SELECT CAST(count(*) AS BIGINT) AS digest_nodes FROM dig)
      |SELECT e.pct, e.target_rank, e.est_cents, x.exact_cents,
      |  b.n_le_est - e.target_rank AS rank_err,
      |  (SELECT digest_nodes FROM dn) AS digest_nodes,
      |  (SELECT n FROM t) AS n_vals
      |FROM est e JOIN ex x USING (pct) JOIN ble b ON b.pct = e.pct
      |ORDER BY pct""".stripMargin
  }

  // ---- q261: AMS / Tug-of-War F2 (self-join size) sketch ----------------

  /** Independent estimator rows (median taken across them) and buckets
    * per row (the Thorup-Zhang / Count-Sketch refinement of AMS'96:
    * est_j = Σ_b Z_{j,b}², which shrinks the variance by the bucket
    * count without changing the state size). 9×64 = 576 cells TOTAL —
    * the whole sketch state regardless of stream length; per-row
    * relative std ≈ √(2/64) ≈ 18%, tightened by the median across rows.
    */
  val AmsRows = 9
  val AmsBuckets = 64L

  // q261 — SECOND FREQUENCY MOMENT sketch: F2 = Σ_u f_u² of the
  // events-per-user vector, i.e. the SELF-JOIN SIZE / skew mass a
  // planner needs before committing to a join strategy. q164 computes
  // join sizes EXACTLY by shuffling per-key count tables; AMS answers
  // from 144 integers that fold map-side (each partition sketches its
  // slice; cells add) — the moment member the sketch family here
  // (cardinality q48/q134, frequency q83, membership q84, quantiles
  // q259, reconciliation q237) was missing. One md5-backed hash per
  // (event, row) supplies bucket (low 4 bits) and sign (bit 4) — the
  // hash computed ONCE per slot, never inlined twice (the round-11
  // CSE lesson); md5 stands in for the 4-wise family so DuckDB can
  // replay the sketch bit-for-bit. Output per estimator row: its
  // estimate, the exact F2, the median estimate, and the signed
  // relative error in 2^20 fixed point.
  //
  // Scale shape: the sketch side shuffles 144 rows after map-side
  // partial aggregation — no per-user state AT ALL (the exact side's
  // per-user groupBy is the audit, not the sketch path). Squares and
  // error terms stage through DECIMAL(38,0)/HUGEINT: Z ≤ stream
  // length, so Z² passes 2^63 beyond ~3e9 events.
  /** The AMS sketch's LIVE state: 9×64 signed cell sums over a
    * `user_id` stream — a pure aggregate (map-side combinable in
    * batch, incrementally maintained by Structured Streaming in
    * complete mode; StreamingSketchSpec pins stream ≡ batch).
    */
  def amsCellsOf(ev: DataFrame): DataFrame =
    ev
      .select(explode(expr(s"sequence(0, ${AmsRows - 1})")).as("j"),
        col("user_id"))
      .select(col("j"),
        hash60(concat(col("user_id").cast("string"), lit("#"),
          col("j").cast("string"))).as("h"))
      .select(col("j"), (col("h") % AmsBuckets).as("b"),
        (lit(1L) - lit(2L) * expr(s"(h DIV $AmsBuckets) % 2")).as("sign"))
      .groupBy(col("j"), col("b"))
      .agg(sum(col("sign")).as("z"))

  private def q261(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = events(s, d).select(col("user_id"))
    val cells = amsCellsOf(ev)
    val estj = cells.groupBy(col("j"))
      .agg(expr("CAST(sum(CAST(z AS DECIMAL(38,0)) * z) AS BIGINT)").as("est"))
      .withColumn("rn", row_number().over(Window.orderBy(col("est"), col("j"))))
    val ex = ev.groupBy(col("user_id")).agg(count(lit(1)).as("f"))
      .agg(expr("CAST(sum(CAST(f AS DECIMAL(38,0)) * f) AS BIGINT)")
        .as("exact_f2"))
    val med = estj.where(col("rn") === (AmsRows + 1) / 2)
      .select(col("est").as("median_est"))
    estj.crossJoin(broadcast(ex)).crossJoin(broadcast(med))
      .select(col("j").cast("long").as("j"), col("est"), col("exact_f2"),
        col("median_est"),
        expr("""CAST(CAST(median_est - exact_f2 AS DECIMAL(38,0)) * 1048576
               |  DIV exact_f2 AS BIGINT)""".stripMargin).as("err_fp"))
      .orderBy(col("j"))
  }

  private val q261Sql =
    s"""WITH ev AS (SELECT user_id FROM events),
      |cells AS MATERIALIZED (
      |  SELECT j, h % $AmsBuckets AS b,
      |    CAST(sum(1 - 2 * ((h // $AmsBuckets) % 2)) AS BIGINT) AS z
      |  FROM (
      |    SELECT j,
      |      ('0x'||substr(md5(user_id::VARCHAR || '#' || j::VARCHAR),1,15))::BIGINT
      |        AS h
      |    FROM ev, (SELECT unnest(range(0, $AmsRows)) AS j))
      |  GROUP BY 1, 2),
      |estj AS MATERIALIZED (
      |  SELECT j, CAST(sum(CAST(z AS HUGEINT) * z) AS BIGINT) AS est
      |  FROM cells GROUP BY j),
      |rk AS MATERIALIZED (
      |  SELECT j, est, row_number() OVER (ORDER BY est, j) AS rn FROM estj),
      |ex AS MATERIALIZED (
      |  SELECT CAST(sum(CAST(f AS HUGEINT) * f) AS BIGINT) AS exact_f2
      |  FROM (SELECT count(*) AS f FROM ev GROUP BY user_id)),
      |med AS (SELECT est AS median_est FROM rk WHERE rn = ${(AmsRows + 1) / 2})
      |SELECT CAST(r.j AS BIGINT) AS j, r.est, x.exact_f2, m.median_est,
      |  CAST(CAST(m.median_est - x.exact_f2 AS HUGEINT) * 1048576
      |    // x.exact_f2 AS BIGINT) AS err_fp
      |FROM rk r, ex x, med m
      |ORDER BY j""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q83_cms_heavy_hitters", q83, Some(q83Sql)),
    Q("q84_bloom_semi_join", q84, Some(q84Sql)),
    Q("q134_hll_distinct", q134, Some(q134Sql)),
    Q("q148_hll_sliding", q148, Some(q148Sql)),
    Q("q192_sliding_distinct_exact", q192, Some(q192Sql)),
    Q("q239_hll_overlap", q239, Some(q239Sql)),
    Q("q259_qdigest_quantiles", q259, Some(q259Sql)),
    Q("q261_ams_f2", q261, Some(q261Sql)),
  )
}
