package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window
import graft.Tables._

/** Event-time windowing over the `events` table — the batch expression of
  * ssp's streaming surface (SURVEY.md §2.1 O8/O10, §2.2 "Streaming
  * semantics"): tumbling and sliding fixed windows, gap-based sessions,
  * and the per-record running aggregate that is ssp's signature output
  * shape. The same logic runs incrementally under Structured Streaming in
  * `graft.streaming` — here it is verified against the DuckDB oracle.
  *
  * All event-time arithmetic is done on `ts_ms` (millisecond epoch,
  * `Tables.events`) so Spark and DuckDB compute on identical integers
  * regardless of each engine's timestamp precision.
  */
object EventWindows {

  // q26 — tumbling window (5 min) per event type: ssp's NewWindowedNode
  // with size == slide (window.go:83-100), as a plain hash aggregation on
  // the truncated epoch. One shuffle on (window, type); partial aggs
  // map-side. Spark's native window() produces the same assignment; the
  // integer form keeps the oracle engine-neutral.
  private def q26(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .withColumn("win_start", (col("ts_ms") / 300000).cast("long") * 300000L)
      .groupBy(col("win_start"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(14, 2))).cast("double").as("sum_value"))
      .orderBy(col("win_start"), col("event_type"))

  private val q26Sql =
    """SELECT (epoch_ms(ts) // 300000) * 300000 AS win_start, event_type,
      |  count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY win_start, event_type""".stripMargin

  // q27 — sliding window (size 10 min, slide 5 min) per event type.
  // Spark side uses the native window() generator (each record lands in
  // size/slide = 2 windows); the oracle expands the same assignment as a
  // UNION ALL of two shifted tumbling windows.
  private def q27(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(window(col("ts"), "600 seconds", "300 seconds"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(14, 2))).cast("double").as("sum_value"))
      .select(unix_millis(col("window.start")).as("win_start"), col("event_type"),
        col("n"), col("sum_value"))
      .orderBy(col("win_start"), col("event_type"))

  private val q27Sql =
    """WITH assigned AS (
      |  SELECT (epoch_ms(ts) // 300000) * 300000 AS win_start, event_type, value FROM events
      |  UNION ALL
      |  SELECT (epoch_ms(ts) // 300000) * 300000 - 300000 AS win_start, event_type, value FROM events)
      |SELECT win_start, event_type, count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
      |FROM assigned
      |GROUP BY 1, 2
      |ORDER BY win_start, event_type""".stripMargin

  // q28 — session windows: per-user sessions split on >30 min inactivity
  // gaps (the lag + cumulative-flag sessionization; Spark streaming has
  // native session_window — the batch form keeps it oracle-checkable).
  private def q28(s: SparkSession, d: String): DataFrame =
    sessionize(events(s, d))

  /** The hand-rolled sessionizer over any (user_id, ts_ms, event_id)
    * frame. Boundary semantics: a gap STRICTLY GREATER than 30 min
    * starts a new session — an event at exactly gap distance stays in
    * the old session. Spark's native session_window (Extras2.q65) has
    * the SAME boundary (touching windows merge); SessionBoundarySpec
    * pins both on an exact-gap fixture.
    */
  private[graft] def sessionize(ev: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"), col("event_id"))
    val cum = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev
      .withColumn("prev_ms", lag(col("ts_ms"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ms").isNull || col("ts_ms") - col("prev_ms") > 1800000L, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(cum))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_ms")).as("session_start"),
        (max(col("ts_ms")) - min(col("ts_ms"))).as("duration_ms"))
      .orderBy(col("user_id"), col("session_id"))
  }

  private val q28Sql =
    """WITH t AS (
      |  SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
      |    lag(epoch_ms(ts)) OVER (PARTITION BY user_id
      |      ORDER BY epoch_ms(ts), event_id) AS prev_ms
      |  FROM events),
      |flagged AS (
      |  SELECT user_id, event_id, ts_ms,
      |    CASE WHEN prev_ms IS NULL OR ts_ms - prev_ms > 1800000 THEN 1 ELSE 0 END AS new_session
      |  FROM t),
      |sess AS (
      |  SELECT user_id, ts_ms,
      |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM flagged)
      |SELECT user_id, session_id, count(*) AS n_events,
      |  min(ts_ms) AS session_start, max(ts_ms) - min(ts_ms) AS duration_ms
      |FROM sess
      |GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin

  // q29 — running per-key event count: the word-count pattern of the
  // reference (FIXTURES.md F1 / engine_test.go:157-222) on real data —
  // one output row per input record carrying the count so far.
  private def q29(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts_ms"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, d)
      .withColumn("running_n", count(lit(1)).over(w))
      .select(col("user_id"), col("event_type"), col("event_id"), col("running_n"))
      .orderBy(col("user_id"), col("event_type"), col("running_n"), col("event_id"))
  }

  private val q29Sql =
    """SELECT user_id, event_type, event_id,
      |  count(*) OVER (PARTITION BY user_id, event_type
      |    ORDER BY epoch_ms(ts), event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_n
      |FROM events
      |ORDER BY user_id, event_type, running_n, event_id""".stripMargin

  // q108 — changelog apply (upsert materialization): treat the event
  // stream as a keyed changelog — every event upserts its user's state,
  // an 'error' event is a tombstone — and collapse it to the
  // current-state table (the streaming↔table duality: Flink upsert
  // sink / MERGE apply). Latest-wins on (ts_ms, event_id); the
  // tombstone filter runs AFTER the latest-wins pick, so a user whose
  // LAST change is a delete is absent even though older upserts exist.
  // One hash aggregation via max_by (map-side partials) — no per-key
  // sort window, so a hot key's history combines early instead of
  // serializing through one task.
  private def q108(s: SparkSession, d: String): DataFrame =
    graft.ops.Changelog(
        events(s, d),
        keys = Seq("user_id"),
        seq = struct(col("ts_ms"), col("event_id")),
        payload = Seq(
          "last_type" -> col("event_type"),
          "last_value" -> col("value"),
          "last_ts_ms" -> col("ts_ms")),
        isDelete = last => last.getField("last_type") === "error")
      .orderBy(col("user_id"))

  private val q108Sql =
    """SELECT user_id, last_type, last_value, last_ts_ms, n_changes FROM (
      |  SELECT user_id, event_type AS last_type, value AS last_value,
      |    epoch_ms(ts) AS last_ts_ms,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rn,
      |    count(*) OVER (PARTITION BY user_id) AS n_changes
      |  FROM events) t
      |WHERE rn = 1 AND last_type <> 'error'
      |ORDER BY user_id""".stripMargin

  // q118 — transcript assembly: sessionized per-user event streams
  // flattened into ordered "conversation" records, the chat-log →
  // training-transcript step of an interaction-data pipeline (and the
  // inverse of q66's posexplode). Same session boundary as q28
  // (>30 min gap). The ordered flatten is collect_list over
  // (ts_ms, event_id, event_type) structs + array_sort + transform —
  // collect_list alone has NO ordering guarantee across merges, the
  // struct sort is what makes the transcript deterministic on any
  // cluster. Per-group state is bounded by session length (activity-
  // gap-bounded by construction), so the roll-up never materializes
  // more than one session's events per key.
  private def q118(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"), col("event_id"))
    val cum = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, d)
      .withColumn("prev_ms", lag(col("ts_ms"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ms").isNull || col("ts_ms") - col("prev_ms") > 1800000L, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(cum))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_turns"),
        array_join(transform(
          array_sort(collect_list(struct(col("ts_ms"), col("event_id"), col("event_type")))),
          x => x.getField("event_type")), " ").as("transcript"))
      .orderBy(col("user_id"), col("session_id"))
  }

  private val q118Sql =
    """WITH t AS (
      |  SELECT user_id, event_id, event_type, epoch_ms(ts) AS ts_ms,
      |    lag(epoch_ms(ts)) OVER (PARTITION BY user_id
      |      ORDER BY epoch_ms(ts), event_id) AS prev_ms
      |  FROM events),
      |sess AS (
      |  SELECT user_id, event_id, event_type, ts_ms,
      |    CAST(sum(CASE WHEN prev_ms IS NULL OR ts_ms - prev_ms > 1800000
      |        THEN 1 ELSE 0 END) OVER (PARTITION BY user_id
      |      ORDER BY ts_ms, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS session_id
      |  FROM t)
      |SELECT user_id, session_id, count(*) AS n_turns,
      |  string_agg(event_type, ' ' ORDER BY ts_ms, event_id) AS transcript
      |FROM sess
      |GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin

  // q126 — turn-pair extraction: the SFT-pair construction step over
  // sessionized logs (q118 assembles whole transcripts; supervised
  // pairs instead want (prompt, response) ADJACENT turns with the
  // roles in the right order). Each 'view' event immediately followed
  // within ITS session by a 'click' yields one training pair with the
  // response latency. Same sessionization as q118/q28 (strict >30 min
  // gap); the lead() window never crosses a session boundary because
  // session_id is in the partition key.
  private def q126(s: SparkSession, d: String): DataFrame =
    turnPairsOf(events(s, d))

  /** The q126 pair extraction over any (user_id, ts_ms, event_id,
    * event_type) frame — public for fixture specs (session-boundary
    * adjacency, role order).
    */
  def turnPairsOf(ev: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"), col("event_id"))
    val cum = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inSession = Window.partitionBy(col("user_id"), col("session_id"))
      .orderBy(col("ts_ms"), col("event_id"))
    ev
      .withColumn("prev_ms", lag(col("ts_ms"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ms").isNull || col("ts_ms") - col("prev_ms") > 1800000L, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(cum))
      .withColumn("nxt_type", lead(col("event_type"), 1).over(inSession))
      .withColumn("nxt_id", lead(col("event_id"), 1).over(inSession))
      .withColumn("nxt_ms", lead(col("ts_ms"), 1).over(inSession))
      .filter(col("event_type") === "view" && col("nxt_type") === "click")
      .select(col("user_id"), col("session_id"),
        col("event_id").as("prompt_id"), col("nxt_id").as("response_id"),
        (col("nxt_ms") - col("ts_ms")).as("latency_ms"))
      .orderBy(col("user_id"), col("prompt_id"))
  }

  private val q126Sql =
    """WITH t AS (
      |  SELECT user_id, event_id, event_type, epoch_ms(ts) AS ts_ms,
      |    lag(epoch_ms(ts)) OVER (PARTITION BY user_id
      |      ORDER BY epoch_ms(ts), event_id) AS prev_ms
      |  FROM events),
      |sess AS (
      |  SELECT user_id, event_id, event_type, ts_ms,
      |    CAST(sum(CASE WHEN prev_ms IS NULL OR ts_ms - prev_ms > 1800000
      |        THEN 1 ELSE 0 END) OVER (PARTITION BY user_id
      |      ORDER BY ts_ms, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS session_id
      |  FROM t),
      |led AS (
      |  SELECT user_id, session_id, event_id, event_type, ts_ms,
      |    lead(event_type) OVER w AS nxt_type,
      |    lead(event_id) OVER w AS nxt_id,
      |    lead(ts_ms) OVER w AS nxt_ms
      |  FROM sess
      |  WINDOW w AS (PARTITION BY user_id, session_id ORDER BY ts_ms, event_id))
      |SELECT user_id, session_id, event_id AS prompt_id, nxt_id AS response_id,
      |  nxt_ms - ts_ms AS latency_ms
      |FROM led
      |WHERE event_type = 'view' AND nxt_type = 'click'
      |ORDER BY user_id, prompt_id""".stripMargin

  // Shared sessionizer for q143/q144 — the q118 boundary (strict
  // >30 min gap), one shuffle on user_id for every downstream window.
  private def sessionized(ev: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"), col("event_id"))
    val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("prev_ms", lag(col("ts_ms"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ms").isNull || col("ts_ms") - col("prev_ms") > 1800000L, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(cum))
  }

  private val sessCteSql =
    """t AS (
      |  SELECT user_id, event_id, event_type, epoch_ms(ts) AS ts_ms,
      |    lag(epoch_ms(ts)) OVER (PARTITION BY user_id
      |      ORDER BY epoch_ms(ts), event_id) AS prev_ms
      |  FROM events),
      |sess AS (
      |  SELECT user_id, event_id, event_type, ts_ms,
      |    CAST(sum(CASE WHEN prev_ms IS NULL OR ts_ms - prev_ms > 1800000
      |        THEN 1 ELSE 0 END) OVER (PARTITION BY user_id
      |      ORDER BY ts_ms, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS session_id
      |  FROM t)""".stripMargin

  // q143 — session path mining: corpus-wide counts of within-session
  // ordered event-type TRIGRAMS ('view>view>click'), the user-journey
  // n-gram report product analytics builds on clickstreams (and the
  // behavioral sibling of q81's textual n-grams). q118 assembles each
  // transcript; this asks which 3-step paths recur ACROSS sessions.
  //
  // Scale shape: the sessionizer's one user_id shuffle, a
  // session-bounded collect (gap-bounded state, q118's argument),
  // trigrams formed IN-ROW over the sorted type array, one
  // vocab³-sparse count with map-side combine, top-20 via
  // TakeOrderedAndProject.
  private val PathLen = 3
  private val PathTopN = 20

  /** Core: within-session event-type trigram counts. Fixture-testable. */
  private[graft] def journeyPathsOf(ev: DataFrame, topN: Int = PathTopN): DataFrame = {
    val paths = sessionized(ev)
      .groupBy(col("user_id"), col("session_id"))
      .agg(transform(
        array_sort(collect_list(struct(col("ts_ms"), col("event_id"), col("event_type")))),
        x => x.getField("event_type")).as("evs"))
      .select(explode(when(size(col("evs")) >= PathLen,
        transform(sequence(lit(0), size(col("evs")) - PathLen), i =>
          concat_ws(">", element_at(col("evs"), i + 1),
            element_at(col("evs"), i + 2), element_at(col("evs"), i + 3))))
        .otherwise(array().cast("array<string>"))).as("path"))
    paths.groupBy(col("path")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("path"))
      .limit(topN)
  }

  private def q143(s: SparkSession, d: String): DataFrame =
    journeyPathsOf(events(s, d))

  private val q143Sql =
    s"""WITH $sessCteSql,
      |tr AS (
      |  SELECT list(event_type ORDER BY ts_ms, event_id) AS evs
      |  FROM sess GROUP BY user_id, session_id),
      |paths AS (
      |  SELECT unnest(list_transform(range(len(evs) - ${PathLen - 1}),
      |    i -> evs[i + 1] || '>' || evs[i + 2] || '>' || evs[i + 3])) AS path
      |  FROM tr)
      |SELECT path, count(*) AS cnt
      |FROM paths GROUP BY path
      |ORDER BY cnt DESC, path
      |LIMIT $PathTopN""".stripMargin

  // q144 — last-touch attribution: every purchase is credited to the
  // most recent click STRICTLY before it in the SAME session (or to
  // nothing — organic purchases keep a NULL click and are part of the
  // report). The marketing-attribution primitive, and the in-session
  // as-of-join expressed as one window: last_value(... IGNORE NULLS)
  // over rows [unbounded, -1] on the session partition — no self-join,
  // no extra shuffle beyond the sessionizer's user_id exchange. The
  // click ts and id are picked by two last_value calls over the SAME
  // frame, so they come from the same row by construction.
  /** Core: (user_id, session_id, purchase_id, click_id, latency_ms)
    * per purchase. Fixture-testable.
    */
  private[graft] def lastTouchOf(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("session_id"))
      .orderBy(col("ts_ms"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    sessionized(ev)
      .withColumn("click_ts",
        last(when(col("event_type") === "click", col("ts_ms")), ignoreNulls = true).over(w))
      .withColumn("click_id",
        last(when(col("event_type") === "click", col("event_id")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("session_id"),
        col("event_id").as("purchase_id"), col("click_id"),
        (col("ts_ms") - col("click_ts")).as("latency_ms"))
      .orderBy(col("purchase_id"))
  }

  private def q144(s: SparkSession, d: String): DataFrame =
    lastTouchOf(events(s, d))

  private val q144Sql =
    s"""WITH $sessCteSql,
      |a AS (
      |  SELECT user_id, session_id, event_id, event_type, ts_ms,
      |    last_value(CASE WHEN event_type = 'click' THEN ts_ms END IGNORE NULLS)
      |      OVER w AS click_ts,
      |    last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
      |      OVER w AS click_id
      |  FROM sess
      |  WINDOW w AS (PARTITION BY user_id, session_id
      |    ORDER BY ts_ms, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
      |SELECT user_id, session_id, event_id AS purchase_id, click_id,
      |  ts_ms - click_ts AS latency_ms
      |FROM a WHERE event_type = 'purchase'
      |ORDER BY purchase_id""".stripMargin

  // q147 — watermark-lateness audit: for every event, reconstruct the
  // watermark that was IN FORCE when it arrived (max event time over
  // all STRICTLY-EARLIER arrivals, minus the allowed delay) and report
  // per event type how many records a streaming job with that
  // watermark would have treated as late, and by how much. This is the
  // observability query every production watermark is tuned from —
  // run it over yesterday's log to pick tomorrow's delay.
  //
  // The arrival-order prefix max is DISTRIBUTED (the rankDistributed
  // pattern): range-partition on arrival sequence, per-partition
  // running max over strictly-preceding rows, plus a broadcast
  // carry-in of each earlier partition's max — no single-partition
  // window anywhere (the naive ORDER BY event_id window the oracle
  // states would serialize the corpus through one task).
  val LateDelayMs = 600000L // 10 min allowed delay

  /** Core: per-type lateness stats over (event_id, event_type, ts_ms)
    * rows, arrival order = event_id. Fixture-testable.
    */
  private[graft] def latenessAuditOf(ev: DataFrame): DataFrame = {
    // the generic single-pass carry operator (r18), max/exclusive mode:
    // cum = max ts over strictly-earlier arrivals (greatest() null
    // semantics — null for the first arrival, so wm is null and
    // nothing counts late, as before)
    graft.ops.PrefixSum.prefixMaxExclusive(
        ev.select(col("event_id"), col("event_type"), col("ts_ms")),
        Seq.empty, Seq(col("event_id")), col("ts_ms"))
      .withColumn("wm", col("cum") - LateDelayMs)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("ts_ms") < col("wm"), 1L).otherwise(0L)).as("n_late"),
        coalesce(max(when(col("ts_ms") < col("wm"), col("wm") - col("ts_ms"))),
          lit(0L)).as("max_lateness_ms"))
      .orderBy(col("event_type"))
  }

  private def q147(s: SparkSession, d: String): DataFrame =
    latenessAuditOf(events(s, d))

  private val q147Sql =
    s"""WITH t AS (
      |  SELECT event_id, event_type, epoch_ms(ts) AS ts_ms FROM events),
      |w AS (
      |  SELECT event_type, ts_ms,
      |    max(ts_ms) OVER (ORDER BY event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |      - $LateDelayMs AS wm
      |  FROM t)
      |SELECT event_type, count(*) AS n_events,
      |  CAST(sum(CASE WHEN ts_ms < wm THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
      |  coalesce(max(CASE WHEN ts_ms < wm THEN wm - ts_ms END), 0)
      |    AS max_lateness_ms
      |FROM w GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // q149 — retention cohorts: users grouped by first-seen day, counted
  // as active at each later day offset — the classic retention
  // triangle every growth dashboard draws. Day arithmetic stays on
  // ts_ms DIV 86400000 (identical integers in both engines; no
  // timezone/date-type coupling).
  //
  // Scale shape: (user, day) pairs dedup first (map-side combinable —
  // the activity stream never reaches the later joins), the per-user
  // min-day is one user-keyed aggregate, and the cohort×offset count
  // joins the two USER-KEYED frames before aggregating to the tiny
  // triangle. All three shuffles are keyed on user or
  // (cohort, offset); nothing quadratic, no windows.
  /** Core: retention triangle over (user_id, ts_ms) rows. */
  private[graft] def retentionCohortsOf(ev: DataFrame): DataFrame = {
    val days = ev
      .select(col("user_id"), expr("ts_ms div 86400000").as("day")).distinct()
    val cohorts = days.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    days.join(cohorts, Seq("user_id"))
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_active"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  private def q149(s: SparkSession, d: String): DataFrame =
    retentionCohortsOf(events(s, d))

  private val q149Sql =
    """WITH days AS (
      |  SELECT DISTINCT user_id, epoch_ms(ts) // 86400000 AS day FROM events),
      |cohorts AS (
      |  SELECT user_id, min(day) AS cohort_day FROM days GROUP BY user_id)
      |SELECT c.cohort_day, d.day - c.cohort_day AS day_offset,
      |  count(DISTINCT d.user_id) AS n_active
      |FROM days d JOIN cohorts c USING (user_id)
      |GROUP BY c.cohort_day, d.day - c.cohort_day
      |ORDER BY cohort_day, day_offset""".stripMargin

  // q177 — cohort LTV curve: cumulative purchase revenue per user
  // cohort (first-seen day) by age offset — q149's retention triangle
  // with money on it, the growth dashboard's second panel. Revenue
  // quantizes to cents through the DECIMAL bridge; the cumulative sum
  // runs as a window along each cohort's offsets (bounded by the span
  // in days — a calendar-sized partition, never user- or event-sized);
  // ltv_cents_per_user = cum DIV cohort size stays integer.
  /** Core: (cohort_day, day_offset, n_users, rev_cents, cum_rev_cents,
    * ltv_cents_per_user) over (user_id, ts_ms, event_type, value).
    */
  private[graft] def ltvCohortsOf(ev: DataFrame): DataFrame = {
    val e = ev.select(col("user_id"), expr("ts_ms div 86400000").as("day"),
      when(col("event_type") === "purchase",
        expr("CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .otherwise(lit(0L)).as("cents"))
    val cohorts = e.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    val sizes = cohorts.groupBy(col("cohort_day"))
      .agg(count(lit(1)).as("n_users"))
    val cells = e.join(cohorts, Seq("user_id"))
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(sum(col("cents")).as("rev_cents"))
    val w = Window.partitionBy(col("cohort_day")).orderBy(col("day_offset"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells
      .withColumn("cum_rev_cents", sum(col("rev_cents")).over(w))
      .join(broadcast(sizes), Seq("cohort_day"))
      .select(col("cohort_day"), col("day_offset"), col("n_users"),
        col("rev_cents"), col("cum_rev_cents"),
        expr("cum_rev_cents DIV n_users").as("ltv_cents_per_user"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  private def q177(s: SparkSession, d: String): DataFrame =
    ltvCohortsOf(events(s, d))

  private val q177Sql =
    """WITH e AS (
      |  SELECT user_id, epoch_ms(ts) // 86400000 AS day,
      |    CASE WHEN event_type = 'purchase'
      |      THEN CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT)
      |      ELSE 0 END AS cents
      |  FROM events),
      |cohorts AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY user_id),
      |sizes AS (SELECT cohort_day, count(*) AS n_users FROM cohorts GROUP BY 1),
      |cells AS (
      |  SELECT c.cohort_day, e.day - c.cohort_day AS day_offset,
      |    CAST(sum(e.cents) AS BIGINT) AS rev_cents
      |  FROM e JOIN cohorts c USING (user_id)
      |  GROUP BY 1, 2),
      |cum AS (
      |  SELECT cohort_day, day_offset, rev_cents,
      |    CAST(sum(rev_cents) OVER (PARTITION BY cohort_day ORDER BY day_offset
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cum_rev_cents
      |  FROM cells)
      |SELECT cohort_day, day_offset, n_users, rev_cents, cum_rev_cents,
      |  CAST(cum_rev_cents // n_users AS BIGINT) AS ltv_cents_per_user
      |FROM cum JOIN sizes USING (cohort_day)
      |ORDER BY cohort_day, day_offset""".stripMargin

  // q150 — exponentially-decayed activity scores: each event's value
  // contributes value·2^(−age_days) to its user's score — the standard
  // recency weighting for engagement ranking / churn features. The
  // decay is EXACT integer arithmetic: value quantizes to 2^20 fixed
  // point (floor of a double is correctly rounded everywhere) and a
  // day of age is one right-shift (DIV by 1<<age) — so the sum is
  // order-invariant and bit-identical across engines and cluster
  // sizes, where the float Σv·exp(−λ·age) every naive implementation
  // writes is neither (addition order varies per run). Ages ≥ 63 days
  // contribute zero explicitly (the shift would overflow; the true
  // value is < 1 fixed-point unit anyway).
  //
  // One scan, a 1-row now-day broadcast, one user-keyed aggregate,
  // top-50 via TakeOrderedAndProject.
  val DecayFp = 1048576L // 2^20
  private val DecayTopN = 50

  /** Core: per-user decayed scores over (user_id, ts_ms, value) rows. */
  private[graft] def decayedActivityOf(ev: DataFrame, topN: Int = DecayTopN): DataFrame = {
    val days = ev.select(col("user_id"),
      expr("ts_ms div 86400000").as("day"),
      expr(s"CAST(floor(value * $DecayFp) AS BIGINT)").as("v_fp"))
    val now = days.agg(max(col("day")).as("now_day"))
    days.crossJoin(broadcast(now))
      .withColumn("age", col("now_day") - col("day"))
      .withColumn("decayed",
        when(col("age") >= 63, lit(0L))
          .otherwise(expr("v_fp DIV shiftleft(1L, CAST(age AS INT))")))
      .groupBy(col("user_id"))
      .agg(sum(col("decayed")).as("score_fp"),
        count(lit(1)).as("n_events"), max(col("day")).as("last_day"))
      .orderBy(col("score_fp").desc, col("user_id"))
      .limit(topN)
  }

  private def q150(s: SparkSession, d: String): DataFrame =
    decayedActivityOf(events(s, d))

  private val q150Sql =
    s"""WITH days AS (
      |  SELECT user_id, epoch_ms(ts) // 86400000 AS day,
      |    CAST(floor(value * $DecayFp) AS BIGINT) AS v_fp
      |  FROM events),
      |now_d AS (SELECT max(day) AS now_day FROM days),
      |dec AS (
      |  SELECT user_id, day,
      |    CASE WHEN now_day - day >= 63 THEN 0
      |         ELSE v_fp // (1::BIGINT << CAST(now_day - day AS INT)) END
      |      AS decayed
      |  FROM days CROSS JOIN now_d)
      |SELECT user_id, CAST(sum(decayed) AS BIGINT) AS score_fp,
      |  count(*) AS n_events, max(day) AS last_day
      |FROM dec GROUP BY user_id
      |ORDER BY score_fp DESC, user_id
      |LIMIT $DecayTopN""".stripMargin

  // q151 — burst detection: each (event_type, hour)'s count compared
  // to its own trailing-24h baseline, as the fixed-point rate ratio
  // cnt·24·2^20 DIV trailing_sum — the ops alert that pages before a
  // hot partition melts. The trailing sum is computed SKETCH-SIDED:
  // hourly counts (a |types|×|hours| frame, independent of event
  // volume) explode into the 24 windows each hour baselines, so the
  // event stream is touched exactly once for the counting aggregate —
  // the q148 expansion trick applied to plain counts. Hours with an
  // empty trailing window are excluded (no baseline, no alert).
  val BurstFp = 1048576L // 2^20
  val BurstWindowHours = 24
  private val BurstTopN = 20

  /** Core: trailing-baseline burst ratios over (event_type, ts_ms). */
  private[graft] def burstsOf(ev: DataFrame, topN: Int = BurstTopN): DataFrame = {
    val counts = ev
      .groupBy(col("event_type"), expr("ts_ms div 3600000").as("hr"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // sketch-sized; feeds both the expansion and the probe
    val trail = counts
      .select(col("event_type"), col("cnt"),
        explode(expr(s"sequence(hr + 1L, hr + ${BurstWindowHours}L)")).as("hr"))
      .groupBy(col("event_type"), col("hr"))
      .agg(sum(col("cnt")).as("trail_sum"), count(lit(1)).as("trail_hours"))
    counts.join(trail, Seq("event_type", "hr"))
      .select(col("event_type"), col("hr"), col("cnt"),
        col("trail_sum"), col("trail_hours"),
        expr(s"(cnt * $BurstWindowHours * $BurstFp) DIV trail_sum").as("burst_fp"))
      .orderBy(col("burst_fp").desc, col("event_type"), col("hr"))
      .limit(topN)
  }

  private def q151(s: SparkSession, d: String): DataFrame =
    burstsOf(events(s, d))

  private val q151Sql =
    s"""WITH counts AS (
      |  SELECT event_type, epoch_ms(ts) // 3600000 AS hr, count(*) AS cnt
      |  FROM events GROUP BY 1, 2),
      |trail AS (
      |  SELECT event_type, x.hr, CAST(sum(cnt) AS BIGINT) AS trail_sum,
      |    count(*) AS trail_hours
      |  FROM (SELECT event_type, cnt, c.hr + o.o AS hr
      |        FROM counts c,
      |          (SELECT unnest(range(1, ${BurstWindowHours + 1})) AS o) o) x
      |  GROUP BY 1, 2)
      |SELECT c.event_type, c.hr, c.cnt, t.trail_sum, t.trail_hours,
      |  (c.cnt * $BurstWindowHours * $BurstFp) // t.trail_sum AS burst_fp
      |FROM counts c JOIN trail t ON t.event_type = c.event_type AND t.hr = c.hr
      |ORDER BY burst_fp DESC, c.event_type, c.hr
      |LIMIT $BurstTopN""".stripMargin

  // q168 — first-order Markov transition matrix over within-session
  // event sequences: for every (from_type → to_type) pair of
  // CONSECUTIVE events in a session, the count and the row-normalized
  // transition probability in 2^20 fixed point — the behavior-model
  // estimator behind next-action prediction and anomaly scoring
  // (q143's trigram paths are the 3-gram cousin; this is the
  // normalized 2-gram MODEL). Transitions never cross the 30-min
  // session boundary.
  //
  // Scale shape: the shared sessionizer's one user_id shuffle; the
  // successor comes from lead() in the same (user, time) window
  // partition order (per-user partitions, bounded by a user's
  // activity); counts aggregate to a |types|² frame; the row totals
  // for normalization are a |types|-row broadcast.
  /** Core: within-session consecutive-pair transition matrix over
    * (user_id, event_id, event_type, ts_ms) rows. Fixture-testable.
    */
  private[graft] def transitionMatrixOf(ev: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ms"), col("event_id"))
    val tr = sessionized(ev)
      .withColumn("nxt_type", lead(col("event_type"), 1).over(byUser))
      .withColumn("nxt_sess", lead(col("session_id"), 1).over(byUser))
      .filter(col("nxt_type").isNotNull && col("nxt_sess") === col("session_id"))
      .groupBy(col("event_type").as("from_type"), col("nxt_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = tr.groupBy(col("from_type")).agg(sum(col("n")).as("row_n"))
    tr.join(broadcast(totals), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        expr("n * 1048576 DIV row_n").as("p_fp"))
      .orderBy(col("from_type"), col("to_type"))
  }

  private def q168(s: SparkSession, d: String): DataFrame =
    transitionMatrixOf(events(s, d))

  private val q168Sql =
    s"""WITH $sessCteSql,
      |nx AS (
      |  SELECT event_type, session_id,
      |    lead(event_type) OVER (PARTITION BY user_id
      |      ORDER BY ts_ms, event_id) AS nxt_type,
      |    lead(session_id) OVER (PARTITION BY user_id
      |      ORDER BY ts_ms, event_id) AS nxt_sess
      |  FROM sess),
      |tr AS (
      |  SELECT event_type AS from_type, nxt_type AS to_type, count(*) AS n
      |  FROM nx WHERE nxt_type IS NOT NULL AND nxt_sess = session_id
      |  GROUP BY 1, 2),
      |tot AS (SELECT from_type, sum(n) AS row_n FROM tr GROUP BY from_type)
      |SELECT from_type, to_type, n,
      |  CAST(n * 1048576 // row_n AS BIGINT) AS p_fp
      |FROM tr JOIN tot USING (from_type)
      |ORDER BY from_type, to_type""".stripMargin

  // q217 — growth-accounting ledger (new / retained / resurrected /
  // churned): the week-over-week decomposition every growth team runs
  // — each active (user, week) is NEW (first week ever), RETAINED
  // (also active the week before) or RESURRECTED (active before, but
  // not last week); CHURNED at week w counts users active at w−1 and
  // silent at w (only for weeks inside the observed range — the week
  // after the horizon is unknowable). Where q149's retention triangle
  // follows cohorts forward, this ledger explains each week's active
  // count as a balance: actives_w = new + retained + resurrected, and
  // actives_w − actives_{w−1} = new + resurrected − churned. Exact
  // integer counts.
  //
  // Scale shape: events collapse to distinct (user, week) — one
  // shuffle of 16-byte rows — then lag/lead windows PER USER (bounded
  // key groups), a 1-row horizon broadcast, and a weeks-sized rollup.
  private def q217(s: SparkSession, d: String): DataFrame = {
    val wkMs = 7L * 86400000L
    val uw = events(s, d)
      .select(col("user_id"), expr(s"ts_ms div $wkMs").as("wk"))
      .distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("wk"))
    val c = uw
      .withColumn("prev", lag(col("wk"), 1).over(w))
      .withColumn("next", lead(col("wk"), 1).over(w))
    val horizon = uw.agg(max(col("wk")).as("maxwk"))
    val states = c.select(col("wk"),
      when(col("prev").isNull, "new")
        .when(col("prev") === col("wk") - 1, "retained")
        .otherwise("resurrected").as("cat"))
    val churn = c.crossJoin(broadcast(horizon))
      .filter((col("next").isNull || col("next") > col("wk") + 1) &&
        col("wk") + 1 <= col("maxwk"))
      .select((col("wk") + 1).as("wk"), lit("churned").as("cat"))
    states.unionAll(churn)
      .groupBy(col("wk"))
      .agg(sum(when(col("cat") === "new", 1L).otherwise(0L)).as("n_new"),
        sum(when(col("cat") === "retained", 1L).otherwise(0L)).as("n_retained"),
        sum(when(col("cat") === "resurrected", 1L).otherwise(0L)).as("n_resurrected"),
        sum(when(col("cat") === "churned", 1L).otherwise(0L)).as("n_churned"))
      .orderBy(col("wk"))
  }

  private val q217Sql =
    """WITH uw AS (
      |  SELECT DISTINCT user_id, epoch_ms(ts) // 604800000 AS wk
      |  FROM events),
      |c AS (
      |  SELECT user_id, wk,
      |    lag(wk) OVER (PARTITION BY user_id ORDER BY wk) AS prev,
      |    lead(wk) OVER (PARTITION BY user_id ORDER BY wk) AS next
      |  FROM uw),
      |h AS (SELECT max(wk) AS maxwk FROM uw),
      |states AS (
      |  SELECT wk,
      |    CASE WHEN prev IS NULL THEN 'new'
      |         WHEN prev = wk - 1 THEN 'retained'
      |         ELSE 'resurrected' END AS cat
      |  FROM c
      |  UNION ALL
      |  SELECT wk + 1 AS wk, 'churned' AS cat
      |  FROM c, h
      |  WHERE (next IS NULL OR next > wk + 1) AND wk + 1 <= maxwk)
      |SELECT wk,
      |  CAST(sum(CASE WHEN cat = 'new' THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
      |  CAST(sum(CASE WHEN cat = 'retained' THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_retained,
      |  CAST(sum(CASE WHEN cat = 'resurrected' THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_resurrected,
      |  CAST(sum(CASE WHEN cat = 'churned' THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_churned
      |FROM states GROUP BY wk
      |ORDER BY wk""".stripMargin

  /** q269 fixed value-iteration budget (the q117 PrIters convention). */
  val MkRounds = 16
  /** The removable (non-absorbing, non-START) channels. */
  val MkChannels = Seq("click", "error", "signup", "view")

  // q269 — Markov removal-effect attribution (Anderl, Becker, von
  // Wangenheim & Schumann 2014): the data-driven upgrade of q144's
  // last-touch credit. Sessions become paths through an absorbing
  // Markov chain — START → events → CONV (first purchase truncates the
  // path) or NULL (session ends unconverted) — and each channel's
  // credit is its REMOVAL EFFECT: how much the START→CONV absorption
  // probability drops when transitions into that channel are redirected
  // to NULL (no renormalization — the removed state's mass is lost,
  // the standard formulation). Credit shares are the normalized
  // effects. q168 estimates this chain's matrix; q269 SOLVES it.
  //
  // The absorption probabilities come from a FIXED budget of
  // value-iteration rounds (MkRounds, the q117 convention) in 2^20
  // fixed point with one truncating division per (variant, state,
  // round): p'(v) = Σ_s n(v,s)·p(s) DIV row_n(v) — counts, not
  // pre-normalized probabilities, so each round truncates exactly
  // once. All five variants (base + four removals) advance as ONE
  // keyed frame (the q262 rule: variants are a key, not a driver
  // loop).
  //
  // Scale shape: the sessionizer's one user_id exchange feeds the
  // path-truncation windows (per-session partitions); everything
  // after the (from, to) count aggregate is ≤|states|²×|variants|
  // rows, localCheckpointed per round; terminal report is 4 rows.
  private def q269(s: SparkSession, d: String): DataFrame =
    removalEffectsOf(events(s, d))

  /** The q269 pipeline over any (user_id, event_id, event_type, ts_ms)
    * frame — extracted so MarkovAttributionSpec can drive it with
    * hand-built paths whose removal effects are known exactly.
    */
  /** The q269 path→edge derivation alone: (from_state, to_state) rows,
    * one per kept event plus the NULL terminal of each unconverted
    * session. Exposed for the streaming twin's parity spec
    * (StatefulStreams.streamingAttributionEdges emits the same edges
    * on arrival, minus the still-open sessions' NULL terminals).
    */
  private[graft] def attributionEdgesOf(ev: DataFrame): DataFrame = {
    val bySess = Window.partitionBy(col("user_id"), col("session_id"))
      .orderBy(col("ts_ms"), col("event_id"))
    val overSess = Window.partitionBy(col("user_id"), col("session_id"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val kept = sessionized(ev)
      .withColumn("rn", row_number().over(bySess))
      .withColumn("pos_p",
        min(when(col("event_type") === "purchase", col("rn"))).over(overSess))
      .filter(col("pos_p").isNull || col("rn") <= col("pos_p"))
    // k2 feeds BOTH union branches below — materialize it once or the
    // sessionizer + three-window corpus pipeline above it runs twice
    // (the twice-consumed-frame rule recorded in BASELINE round 12)
    val k2 = kept
      .withColumn("frm",
        coalesce(lag(col("event_type"), 1).over(bySess), lit("START")))
      .withColumn("tost", when(col("event_type") === "purchase", "CONV")
        .otherwise(col("event_type")))
      .withColumn("last_rn", max(col("rn")).over(overSess))
      .select(col("rn"), col("last_rn"), col("event_type"),
        col("frm"), col("tost"))
      .localCheckpoint()
    k2.select(col("frm").as("from_state"), col("tost").as("to_state"))
      .unionAll(k2.filter(col("rn") === col("last_rn") &&
          col("event_type") =!= "purchase")
        .select(col("event_type").as("from_state"), lit("NULL").as("to_state")))
  }

  private[graft] def removalEffectsOf(ev: DataFrame): DataFrame = {
    val s = ev.sparkSession
    import s.implicits._
    val S = 1048576L
    val base = attributionEdgesOf(ev).groupBy(col("from_state"), col("to_state"))
      .agg(count(lit(1)).as("n"))
    val vnames = "none" +: MkChannels
    // One Spark job collects the variant-expanded transition-count
    // matrix; the MkRounds value-iteration then runs on the DRIVER
    // (optimization round 17). The collected state is DOMAIN-bounded,
    // not data-sized — ≤ |states|²·|variants| rows (states are the
    // event-type enum + START/CONV/NULL; ~245 rows at any corpus
    // size), the same bounded-action discipline as q271's five
    // weights. The previous in-plan loop paid MkRounds=16 sequential
    // tiny-frame joins, each with an eager localCheckpoint barrier —
    // 16+ scheduler round-trips to move ~35 numbers per round; pure
    // constant latency at every scale factor. Arithmetic is replicated
    // exactly: per-round p'(v,from) = Σ n·p(to) DIV row_n in BigInt
    // (DECIMAL(38,0) semantics; both divisions truncate toward zero),
    // edges whose to_state has no p entry drop (the inner join), and
    // the absorbing rows (CONV = S, NULL = 0) re-enter each round —
    // pinned by MarkovAttributionSpec's hand-built-path fixtures.
    val edgeRows: Array[(String, String, String, Long)] = vnames.map { v =>
      base.filter(lit(v) === "none" || col("from_state") =!= v)
        .select(lit(v).as("variant"), col("from_state"),
          when(lit(v) =!= "none" && col("to_state") === v, "NULL")
            .otherwise(col("to_state")).as("to_state"),
          col("n"))
    }.reduce(_ unionAll _)
      .groupBy(col("variant"), col("from_state"), col("to_state"))
      .agg(sum(col("n")).as("n"))
      .as[(String, String, String, Long)]
      .collect()
    val rowN: Map[(String, String), Long] = edgeRows
      .groupBy(e => (e._1, e._2)).map { case (k, es) => k -> es.map(_._4).sum }
    val absorb: Map[(String, String), BigInt] =
      vnames.flatMap(v => Seq((v, "CONV") -> BigInt(S), (v, "NULL") -> BigInt(0)))
        .toMap
    var p: Map[(String, String), BigInt] = absorb
    for (_ <- 1 to MkRounds) {
      val nxt = edgeRows
        .filter(e => p.contains((e._1, e._3)))
        .groupBy(e => (e._1, e._2))
        .map { case (k, es) =>
          val num = es.map(e => BigInt(e._4) * p((e._1, e._3))).sum
          k -> num / BigInt(rowN(k))
        }
      p = nxt ++ absorb
    }
    val effRows = for {
      basePv <- p.get(("none", "START")).toSeq
      v <- MkChannels
      pv <- p.get((v, "START")).toSeq
    } yield (v, basePv, pv,
      (basePv - pv) * S / basePv.max(BigInt(1)))
    val totEff = effRows.map(_._4).sum
    effRows.map { case (v, b, pv, e) =>
      (v, b.toLong, pv.toLong, e.toLong,
        (e * S / totEff.max(BigInt(1))).toLong)
    }.toDF("channel", "base_fp", "removed_fp", "removal_effect_fp", "share_fp")
      .orderBy(col("channel"))
  }

  private val q269Sql = {
    val S = 1048576L
    def round(r: Int): String =
      s"""p$r AS MATERIALIZED (
        |  SELECT e.variant, e.from_state AS state,
        |    CAST(sum(CAST(e.n AS HUGEINT) * p.p) // max(t.row_n) AS BIGINT) AS p
        |  FROM edges e
        |  JOIN p${r - 1} p ON p.variant = e.variant AND p.state = e.to_state
        |  JOIN rowtot t ON t.variant = e.variant AND t.from_state = e.from_state
        |  GROUP BY 1, 2
        |  UNION ALL SELECT * FROM p0)""".stripMargin
    s"""WITH $sessCteSql,
      |r AS (
      |  SELECT user_id, session_id, event_id, event_type, ts_ms,
      |    row_number() OVER (PARTITION BY user_id, session_id
      |      ORDER BY ts_ms, event_id) AS rn
      |  FROM sess),
      |pp AS (
      |  SELECT *, min(CASE WHEN event_type = 'purchase' THEN rn END)
      |      OVER (PARTITION BY user_id, session_id) AS pos_p
      |  FROM r),
      |kept AS (SELECT * FROM pp WHERE pos_p IS NULL OR rn <= pos_p),
      |k2 AS (
      |  SELECT user_id, session_id, rn, event_type,
      |    coalesce(lag(event_type) OVER (PARTITION BY user_id, session_id
      |      ORDER BY rn), 'START') AS frm,
      |    CASE WHEN event_type = 'purchase' THEN 'CONV'
      |      ELSE event_type END AS tost,
      |    max(rn) OVER (PARTITION BY user_id, session_id) AS last_rn
      |  FROM kept),
      |edges0 AS (
      |  SELECT frm AS from_state, tost AS to_state FROM k2
      |  UNION ALL
      |  SELECT event_type, 'NULL' FROM k2
      |  WHERE rn = last_rn AND event_type <> 'purchase'),
      |cnt AS (SELECT from_state, to_state, count(*) AS n
      |  FROM edges0 GROUP BY 1, 2),
      |edges AS MATERIALIZED (
      |  SELECT variant, from_state,
      |    CASE WHEN variant <> 'none' AND to_state = variant THEN 'NULL'
      |      ELSE to_state END AS to_state,
      |    CAST(sum(n) AS BIGINT) AS n
      |  FROM cnt CROSS JOIN (SELECT unnest([${("none" +: MkChannels)
           .map(v => s"'$v'").mkString(", ")}]) AS variant) v
      |  WHERE variant = 'none' OR from_state <> variant
      |  GROUP BY 1, 2, 3),
      |rowtot AS (SELECT variant, from_state, CAST(sum(n) AS BIGINT) AS row_n
      |  FROM edges GROUP BY 1, 2),
      |vs AS (SELECT DISTINCT variant FROM edges),
      |p0 AS (
      |  SELECT variant, 'CONV' AS state, CAST($S AS BIGINT) AS p FROM vs
      |  UNION ALL SELECT variant, 'NULL', 0 FROM vs),
      |${(1 to MkRounds).map(round).mkString(",\n")},
      |sel AS (SELECT variant, p FROM p$MkRounds WHERE state = 'START'),
      |eff AS (
      |  SELECT s.variant AS channel, b.p AS base_fp, s.p AS removed_fp,
      |    CAST((b.p - s.p) * $S // greatest(b.p, 1) AS BIGINT)
      |      AS removal_effect_fp
      |  FROM sel s, (SELECT p FROM sel WHERE variant = 'none') b
      |  WHERE s.variant <> 'none')
      |SELECT channel, base_fp, removed_fp, removal_effect_fp,
      |  CAST(removal_effect_fp * $S
      |    // greatest((SELECT sum(removal_effect_fp) FROM eff), 1)
      |    AS BIGINT) AS share_fp
      |FROM eff
      |ORDER BY channel""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q("q26_tumbling_window", q26, Some(q26Sql)),
    Q("q27_sliding_window", q27, Some(q27Sql)),
    Q("q28_session_window", q28, Some(q28Sql)),
    Q("q29_running_count", q29, Some(q29Sql)),
    Q("q108_changelog_apply", q108, Some(q108Sql)),
    Q("q118_transcripts", q118, Some(q118Sql)),
    Q("q126_turn_pairs", q126, Some(q126Sql)),
    Q("q143_journey_paths", q143, Some(q143Sql)),
    Q("q144_attribution", q144, Some(q144Sql)),
    Q("q147_lateness_audit", q147, Some(q147Sql)),
    Q("q149_retention_cohorts", q149, Some(q149Sql)),
    Q("q150_decayed_activity", q150, Some(q150Sql)),
    Q("q151_burst_detection", q151, Some(q151Sql)),
    Q("q168_markov_transitions", q168, Some(q168Sql)),
    Q("q269_markov_attribution", q269, Some(q269Sql)),
    Q("q177_ltv_cohorts", q177, Some(q177Sql)),
    Q("q217_growth_accounting", q217, Some(q217Sql)),
  )
}
