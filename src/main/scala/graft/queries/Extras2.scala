package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window
import graft.Tables._

/** Second wave of relational/analytic surface beyond the reference
  * (SURVEY.md §2.2 marks all of these absent in ssp; they come from the
  * Spark primitives): RANGE window frames, explode/unnest generators,
  * FILTER-clause conditional aggregation, regex extraction, time-series
  * gap-filling, and funnel analysis.
  */
object Extras2 {

  // q59 — RANGE window frame: per-customer trailing-30-day spend at each
  // order. The frame is defined on the *value* axis (integer day offsets
  // since 1992-01-01), not row offsets, so same-day peers aggregate
  // together in both engines. One shuffle on o_custkey; decimal-exact
  // sum cast to double at the end (oracle-determinism rule).
  private def q59(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("day_no"))
      .rangeBetween(-30, Window.currentRow)
    orders(s, d)
      .withColumn("day_no",
        datediff(col("o_orderdate").cast("date"), lit("1992-01-01").cast("date")))
      .withColumn("spend_30d",
        sum(col("o_totalprice").cast(DecimalType(14, 2))).over(w).cast("double"))
      .select(col("o_orderkey"), col("o_custkey"), col("day_no"), col("spend_30d"))
      .orderBy(col("o_orderkey"))
  }

  private val q59Sql =
    """SELECT o_orderkey, o_custkey,
      |  date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS day_no,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) OVER (
      |    PARTITION BY o_custkey
      |    ORDER BY date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
      |    RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE) AS spend_30d
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin

  // q60 — generator/explode: corpus-wide word frequencies (top 50).
  // split+explode is Spark's unnest; the groupBy does map-side partial
  // aggregation so the shuffle carries one row per distinct word per
  // partition, not one per token — the only layout that survives 100 TB
  // of text.
  private def q60(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(explode(split(lower(col("text")), "[^a-z]+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word"))
      .limit(50)

  private val q60Sql =
    """SELECT word, count(*) AS n
      |FROM (SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS word
      |      FROM documents) t
      |WHERE word <> ''
      |GROUP BY word
      |ORDER BY n DESC, word
      |LIMIT 50""".stripMargin

  // q61 — conditional aggregation, the FILTER-clause pattern: several
  // differently-filtered aggregates in ONE scan + ONE shuffle (vs the
  // naive N self-joins). Dimension join broadcast.
  private def q61(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        count(lit(1)).as("n_cust"),
        count(when(col("c_acctbal") > 0, 1)).as("n_pos"),
        sum(when(col("c_acctbal") > 0, col("c_acctbal")).cast(DecimalType(14, 2)))
          .cast("double").as("pos_bal"),
        max(when(col("c_acctbal") < 0, col("c_acctbal"))).as("max_neg"))
      .orderBy(col("n_name"))

  private val q61Sql =
    """SELECT n_name, count(*) AS n_cust,
      |  count(*) FILTER (WHERE c_acctbal > 0) AS n_pos,
      |  CAST(sum(CAST(c_acctbal AS DECIMAL(14,2))) FILTER (WHERE c_acctbal > 0)
      |    AS DOUBLE) AS pos_bal,
      |  max(c_acctbal) FILTER (WHERE c_acctbal < 0) AS max_neg
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  // q62 — regex capture-group extraction (vs q47's JSON-path route over
  // the same payload): pull the integer out of the props JSON with a
  // regex, then aggregate. Both engines return '' on no-match, filtered
  // out before the cast.
  private def q62(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(col("event_type"),
        regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1).as("kstr"))
      .filter(col("kstr") =!= "")
      .withColumn("k", col("kstr").cast("long"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), min(col("k")).as("min_k"),
        max(col("k")).as("max_k"),
        // decimal-exact sum: a LONG sum would ANSI-overflow at extreme
        // scale where DuckDB's HUGEINT would not (oracle-determinism
        // rule, same as the monetary sums)
        sum(col("k").cast(DecimalType(38, 0))).cast("long").as("sum_k"))
      .orderBy(col("event_type"))

  private val q62Sql =
    """SELECT event_type, count(*) AS n, min(k) AS min_k, max(k) AS max_k,
      |  CAST(sum(k) AS BIGINT) AS sum_k
      |FROM (SELECT event_type,
      |        CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT) AS k
      |      FROM events
      |      WHERE regexp_extract(props, '"k":\s*(\d+)', 1) <> '') t
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // q63 — time-series gap-fill: a dense (event_type × hour) grid over
  // the observed span, zero-filled where no events landed. The hour
  // axis comes from spark.range — generated in parallel across tasks —
  // rather than sequence()+explode, which would build the entire span
  // as one in-memory array inside a single task. The (lo, hi) bounds
  // are a 2-value aggregate collected once (constant-size, not a data
  // collect); the hourly counts aggregate down before the join so both
  // join sides stay tiny regardless of input scale.
  private def q63(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
      .select(col("event_type"), expr("ts_ms div 3600000").as("hr"))
    val counts = ev.groupBy(col("event_type"), col("hr")).agg(count(lit(1)).as("n"))
    val bounds = ev.agg(min(col("hr")).as("lo"), max(col("hr")).as("hi")).head()
    val grid = s.range(bounds.getLong(0), bounds.getLong(1) + 1).toDF("hr")
      .crossJoin(ev.select(col("event_type")).distinct())
    grid.join(counts, Seq("event_type", "hr"), "left")
      .select(col("event_type"), col("hr"), coalesce(col("n"), lit(0L)).as("n"))
      .orderBy(col("event_type"), col("hr"))
  }

  private val q63Sql =
    """WITH ev AS (SELECT event_type, epoch_ms(ts) // 3600000 AS hr FROM events),
      |counts AS (SELECT event_type, hr, count(*) AS n FROM ev GROUP BY 1, 2),
      |grid AS (SELECT t.event_type, g.hr
      |         FROM (SELECT DISTINCT event_type FROM ev) t,
      |              (SELECT unnest(generate_series((SELECT min(hr) FROM ev),
      |                                             (SELECT max(hr) FROM ev))) AS hr) g)
      |SELECT grid.event_type, grid.hr, COALESCE(counts.n, 0) AS n
      |FROM grid LEFT JOIN counts USING (event_type, hr)
      |ORDER BY event_type, hr""".stripMargin

  // q64 — funnel analysis: how far each user progresses through
  // view -> click -> purchase in strict event-time order, then user
  // counts per stage reached. Three chained min-over-partition windows
  // on the SAME partitioning = one shuffle on user_id, no sorts, no
  // self-joins (the oracle states it as the equivalent join cascade).
  private def q64(s: SparkSession, d: String): DataFrame =
    funnelStages(events(s, d))

  /** The funnel counter over any (user_id, event_type, ts_ms) frame —
    * split out so FunnelFixtureSpec can cover all four stage buckets
    * (the sf testdata lands every user in one stage, leaving the other
    * CASE branches and null-propagation paths unexercised by the
    * oracle).
    */
  private[graft] def funnelStages(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ev
      .withColumn("v",
        min(when(col("event_type") === "view", col("ts_ms"))).over(w))
      .withColumn("c",
        min(when(col("event_type") === "click" && col("ts_ms") > col("v"),
          col("ts_ms"))).over(w))
      .withColumn("p",
        min(when(col("event_type") === "purchase" && col("ts_ms") > col("c"),
          col("ts_ms"))).over(w))
      .select(col("user_id"), col("v"), col("c"), col("p"))
      .distinct()
      .withColumn("stage",
        when(col("p").isNotNull, 3).when(col("c").isNotNull, 2)
          .when(col("v").isNotNull, 1).otherwise(0))
      .groupBy(col("stage"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("stage"))
  }

  private val q64Sql =
    """WITH u AS (
      |  SELECT user_id,
      |    min(CASE WHEN event_type = 'view' THEN epoch_ms(ts) END) AS v
      |  FROM events GROUP BY 1),
      |uc AS (
      |  SELECT u.user_id, u.v,
      |    min(CASE WHEN e.event_type = 'click' AND epoch_ms(e.ts) > u.v
      |        THEN epoch_ms(e.ts) END) AS c
      |  FROM u JOIN events e USING (user_id) GROUP BY 1, 2),
      |up AS (
      |  SELECT uc.user_id, uc.v, uc.c,
      |    min(CASE WHEN e.event_type = 'purchase' AND epoch_ms(e.ts) > uc.c
      |        THEN epoch_ms(e.ts) END) AS p
      |  FROM uc JOIN events e USING (user_id) GROUP BY 1, 2, 3)
      |SELECT CASE WHEN p IS NOT NULL THEN 3 WHEN c IS NOT NULL THEN 2
      |            WHEN v IS NOT NULL THEN 1 ELSE 0 END AS stage,
      |  count(*) AS n_users
      |FROM up
      |GROUP BY 1
      |ORDER BY stage""".stripMargin

  // q65 — Spark's native session_window, run in BATCH mode (the same
  // operator graft.streaming.StatefulStreams.sessionCounts uses
  // incrementally). Native semantics: a session spans [first_ts,
  // last_ts + gap), and an event at EXACTLY session-end MERGES into
  // the session (touching windows coalesce) — a new session needs a
  // gap STRICTLY greater than 30 min, the same `>` boundary as q28's
  // hand-rolled sessionizer. The oracle below therefore tests
  // `> 1800000`; it previously said `>=`, a latent boundary bug that
  // the sf testdata never exercised — SessionBoundarySpec now pins the
  // exact-gap case on both sessionizers.
  private def q65(s: SparkSession, d: String): DataFrame =
    nativeSessions(events(s, d))

  /** Native session_window sessionizer over any (user_id, ts, value)
    * frame. Boundary semantics pinned by SessionBoundarySpec: merge at
    * exactly-gap, split strictly past it — identical to
    * EventWindows.sessionize; only the output shape differs.
    */
  private[graft] def nativeSessions(ev: DataFrame): DataFrame =
    ev
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(14, 2))).cast("double").as("sum_value"))
      .select(col("user_id"),
        unix_millis(col("session_window.start")).as("sess_start"),
        unix_millis(col("session_window.end")).as("sess_end"),
        col("n_events"), col("sum_value"))
      .orderBy(col("user_id"), col("sess_start"))

  private val q65Sql =
    """WITH t AS (
      |  SELECT user_id, value, event_id, epoch_ms(ts) AS ts_ms,
      |    lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) AS prev_ms
      |  FROM events),
      |flagged AS (
      |  SELECT user_id, value, ts_ms, event_id,
      |    CASE WHEN prev_ms IS NULL OR ts_ms - prev_ms > 1800000 THEN 1 ELSE 0 END AS new_s
      |  FROM t),
      |sess AS (
      |  SELECT user_id, value, ts_ms,
      |    CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
      |  FROM flagged)
      |SELECT user_id, min(ts_ms) AS sess_start, max(ts_ms) + 1800000 AS sess_end,
      |  count(*) AS n_events,
      |  CAST(sum(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
      |FROM sess
      |GROUP BY user_id, sid
      |ORDER BY user_id, sess_start""".stripMargin

  // q66 — positional explode (LATERAL VIEW posexplode / unnest WITH
  // ORDINALITY): the first three tokens of every document with their
  // positions. The oracle states the same rows as a UNION ALL of
  // list_extract at fixed ordinals.
  private def q66(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"),
        posexplode(split(lower(col("text")), "[^a-z]+")).as(Seq("pos", "word")))
      .filter(col("pos") < 3 && col("word") =!= "")
      .orderBy(col("doc_id"), col("pos"))

  private val q66Sql =
    """WITH t AS (SELECT doc_id, string_split_regex(lower(text), '[^a-z]+') AS words
      |           FROM documents)
      |SELECT doc_id, pos, word FROM (
      |  SELECT doc_id, 0 AS pos, words[1] AS word FROM t WHERE len(words) >= 1
      |  UNION ALL
      |  SELECT doc_id, 1 AS pos, words[2] AS word FROM t WHERE len(words) >= 2
      |  UNION ALL
      |  SELECT doc_id, 2 AS pos, words[3] AS word FROM t WHERE len(words) >= 3) u
      |WHERE word <> ''
      |ORDER BY doc_id, pos""".stripMargin

  // q175 — funnel with per-step CONVERSION WINDOWS: q64's
  // view→click→purchase progression, but each step only counts within
  // its deadline (click within a day of the first view, purchase
  // within a day of the qualifying click — deadlines sized to this
  // log's ~hourly per-user event density; a web-scale log would use
  // minutes) — the form every product-analytics funnel
  // actually ships, where an eventual purchase three days later is NOT
  // attributed. Same single-shuffle shape as q64: three chained
  // min-over-partition conditional windows on ONE user_id
  // partitioning, window bounds as plain predicates — the deadline
  // adds zero exchanges.
  val ClickWindowMs = 86400000L // 1 day after first view
  val PurchaseWindowMs = 86400000L // 1 day after qualifying click

  /** Fixture-testable core over (user_id, event_type, ts_ms). */
  private[graft] def windowedFunnelOf(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ev
      .withColumn("v",
        min(when(col("event_type") === "view", col("ts_ms"))).over(w))
      .withColumn("c",
        min(when(col("event_type") === "click" && col("ts_ms") > col("v") &&
          col("ts_ms") <= col("v") + ClickWindowMs, col("ts_ms"))).over(w))
      .withColumn("p",
        min(when(col("event_type") === "purchase" && col("ts_ms") > col("c") &&
          col("ts_ms") <= col("c") + PurchaseWindowMs, col("ts_ms"))).over(w))
      .select(col("user_id"), col("v"), col("c"), col("p"))
      .distinct()
      .withColumn("stage",
        when(col("p").isNotNull, 3).when(col("c").isNotNull, 2)
          .when(col("v").isNotNull, 1).otherwise(0))
      .groupBy(col("stage")).agg(count(lit(1)).as("n_users"))
      .orderBy(col("stage"))
  }

  private def q175(s: SparkSession, d: String): DataFrame =
    windowedFunnelOf(events(s, d))

  private val q175Sql =
    s"""WITH u AS (
      |  SELECT user_id,
      |    min(CASE WHEN event_type = 'view' THEN epoch_ms(ts) END) AS v
      |  FROM events GROUP BY 1),
      |uc AS (
      |  SELECT u.user_id, u.v,
      |    min(CASE WHEN e.event_type = 'click' AND epoch_ms(e.ts) > u.v
      |        AND epoch_ms(e.ts) <= u.v + $ClickWindowMs
      |        THEN epoch_ms(e.ts) END) AS c
      |  FROM u JOIN events e USING (user_id) GROUP BY 1, 2),
      |up AS (
      |  SELECT uc.user_id, uc.v, uc.c,
      |    min(CASE WHEN e.event_type = 'purchase' AND epoch_ms(e.ts) > uc.c
      |        AND epoch_ms(e.ts) <= uc.c + $PurchaseWindowMs
      |        THEN epoch_ms(e.ts) END) AS p
      |  FROM uc JOIN events e USING (user_id) GROUP BY 1, 2, 3)
      |SELECT CASE WHEN p IS NOT NULL THEN 3 WHEN c IS NOT NULL THEN 2
      |            WHEN v IS NOT NULL THEN 1 ELSE 0 END AS stage,
      |  count(*) AS n_users
      |FROM up
      |GROUP BY 1
      |ORDER BY stage""".stripMargin

  /** Minimum pair support / report size for q220. */
  val BasketMinSup = 2L
  val BasketTopN = 50

  // q220 — market-basket association rules: frequent part PAIRS across
  // orders with support, confidence and lift — the A-Priori 2-itemset
  // pass, the classic "customers who bought X also bought Y" operator
  // the engine had not yet named. Confidence and lift are exact fixed
  // point (lift's c12·N product staged through DECIMAL/HUGEINT); the
  // report is the top-BasketTopN by lift with a total (lift, p1, p2)
  // order.
  //
  // Scale shape: baskets are BOUNDED (an order has ≤ 7 lineitems), so
  // the per-order pair explosion is linear in rows — the self-join on
  // l_orderkey shuffles once on the order key and can never go
  // quadratic in the corpus. Pair/item count frames are
  // itemset-sized; the top-N is a TakeOrdered, not a global sort.
  private def q220(s: SparkSession, d: String): DataFrame = {
    val op = lineitem(s, d)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
      .localCheckpoint(false)
    val n = op.select(col("o")).distinct().agg(count(lit(1)).as("n_orders"))
    val item = op.groupBy(col("p")).agg(count(lit(1)).as("c"))
    val pairs = op.as("a").join(op.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .groupBy(col("a.p").as("p1"), col("b.p").as("p2"))
      .agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= BasketMinSup)
    pairs
      .join(item.select(col("p").as("p1"), col("c").as("c1")), Seq("p1"))
      .join(item.select(col("p").as("p2"), col("c").as("c2")), Seq("p2"))
      .crossJoin(broadcast(n))
      .select(col("p1"), col("p2"), col("c12"), col("c1"), col("c2"),
        col("n_orders"),
        expr("CAST(c12 * 1048576 DIV c1 AS BIGINT)").as("conf_fp"),
        expr("""CAST(CAST(c12 AS DECIMAL(38,0)) * n_orders * 1048576
               |  DIV (CAST(c1 AS DECIMAL(38,0)) * c2) AS BIGINT)""".stripMargin)
          .as("lift_fp"))
      .orderBy(col("lift_fp").desc, col("p1"), col("p2"))
      .limit(BasketTopN)
  }

  private val q220Sql =
    s"""WITH op AS (
      |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      |n AS (SELECT count(DISTINCT o) AS n_orders FROM op),
      |item AS (SELECT p, count(*) AS c FROM op GROUP BY p),
      |pairs AS (
      |  SELECT a.p AS p1, b.p AS p2, count(*) AS c12
      |  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
      |  GROUP BY 1, 2 HAVING count(*) >= $BasketMinSup)
      |SELECT p1, p2, c12, i1.c AS c1, i2.c AS c2, n.n_orders,
      |  CAST(c12 * 1048576 // i1.c AS BIGINT) AS conf_fp,
      |  CAST(CAST(c12 AS HUGEINT) * n.n_orders * 1048576
      |    // (CAST(i1.c AS HUGEINT) * i2.c) AS BIGINT) AS lift_fp
      |FROM pairs JOIN item i1 ON pairs.p1 = i1.p
      |JOIN item i2 ON pairs.p2 = i2.p
      |CROSS JOIN n
      |ORDER BY lift_fp DESC, p1, p2
      |LIMIT $BasketTopN""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q59_range_frame", q59, Some(q59Sql)),
    Q("q60_word_freq", q60, Some(q60Sql)),
    Q("q61_filter_agg", q61, Some(q61Sql)),
    Q("q62_regex_extract", q62, Some(q62Sql)),
    Q("q63_gap_fill", q63, Some(q63Sql)),
    Q("q64_funnel", q64, Some(q64Sql)),
    Q("q65_session_native", q65, Some(q65Sql)),
    Q("q66_posexplode", q66, Some(q66Sql)),
    Q("q175_windowed_funnel", q175, Some(q175Sql)),
    Q("q220_market_basket", q220, Some(q220Sql)),
  )
}
