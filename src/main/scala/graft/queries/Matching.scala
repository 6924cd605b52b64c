package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables._

/** Record linkage and behavioral sequence matching — the entity-level
  * counterparts of the text-level dedup family (`Dedup.scala`): find
  * records that are ALMOST the same key (fat-finger variants, OCR
  * noise), find users whose event streams match a behavioral pattern
  * (the CEP surface a streaming engine grows next — the reference's
  * stateful keyed node, reference `engine.go` stateful map, is exactly
  * the per-key state machine this needs), and quantify how well two
  * independent labeling gates agree (Cohen's kappa, the inter-rater
  * audit run before trusting a heuristic quality filter at corpus
  * scale).
  *
  * Everything is exact-integer / exact-string so the DuckDB oracle
  * compares bit-for-bit.
  */
object Matching {

  // q200 — bounded edit-distance self-join (FastSS deletion
  // neighborhoods): find all customer-name pairs within Levenshtein
  // distance 1 WITHOUT the O(N²) all-pairs scan. Each name emits its
  // deletion neighborhood — the string itself plus every
  // one-character-deleted variant — and candidate pairs are variants
  // that collide; ed(a,b) ≤ 1 implies the neighborhoods intersect, so
  // recall is exact, and the (cheap, rare) false positives (e.g.
  // "ab"/"ba" share variant "a"... and "b") are killed by one final
  // levenshtein() check, identical built-in in Spark and DuckDB.
  //
  // Scale shape: the shuffle key is the variant string — each name
  // contributes len+1 variants, and a variant of length L is reachable
  // from at most (L+1)·|alphabet| inserting strings, so candidate
  // buckets are constant-bounded and join output is linear in N. No
  // all-pairs anywhere; this is the q32 MinHash-LSH blocking idea
  // specialized to edit distance, where it happens to be EXACT.
  /** Core: all (k1, k2, dist) pairs with Levenshtein distance ≤ 1 over
    * a (k, nm) frame, via deletion-neighborhood blocking — EXACT
    * recall (ed ≤ 1 ⇒ neighborhoods intersect), false positives
    * killed by the final levenshtein check. Fixture/property-testable
    * (MatchingPropertySpec pins it against brute force).
    */
  private[graft] def edPairsOf(names: DataFrame): DataFrame = {
    // i in 0..len: i < len deletes the 0-based i-th char; i = len keeps
    // the string itself (distance-0 member of the neighborhood).
    // The candidate join carries ONLY (k, var) — the name strings join
    // back onto the (much smaller) distinct pair set for the verify,
    // so the shuffle payload of the hot self-join stays 2 columns.
    val variants = names
      .select(col("k"), col("nm"), explode(expr("sequence(0, length(nm))")).as("i"))
      .select(col("k"), expr(
        "CASE WHEN i < length(nm) THEN concat(substr(nm, 1, i), substr(nm, i + 2)) ELSE nm END")
        .as("var"))
      .distinct() // deleting any of several identical chars yields the same variant
    val pairs = variants.as("a").join(variants.as("b"),
        col("a.var") === col("b.var") && col("a.k") < col("b.k"))
      .select(col("a.k").as("k1"), col("b.k").as("k2"))
      .distinct() // two names can collide on several variants
    pairs
      .join(names.select(col("k").as("k1"), col("nm").as("n1")), Seq("k1"))
      .join(names.select(col("k").as("k2"), col("nm").as("n2")), Seq("k2"))
      .filter(levenshtein(col("n1"), col("n2")) <= 1)
      .select(col("k1"), col("k2"),
        levenshtein(col("n1"), col("n2")).cast("long").as("dist"))
  }

  private def q200(s: SparkSession, d: String): DataFrame =
    edPairsOf(customer(s, d)
        .select(col("c_custkey").as("k"), col("c_name").as("nm")))
      .orderBy(col("k1"), col("k2"))

  private val q200Sql =
    """WITH nm AS (SELECT c_custkey AS k, c_name AS nm FROM customer),
      |v AS (
      |  SELECT DISTINCT k, nm,
      |    CASE WHEN i < len(nm) THEN substr(nm, 1, i) || substr(nm, i + 2)
      |         ELSE nm END AS var
      |  FROM nm, unnest(range(0, len(nm) + 1)) AS t(i)),
      |p AS (
      |  SELECT DISTINCT a.k AS k1, b.k AS k2, a.nm AS n1, b.nm AS n2
      |  FROM v a JOIN v b ON a.var = b.var AND a.k < b.k)
      |SELECT k1, k2, CAST(levenshtein(n1, n2) AS BIGINT) AS dist
      |FROM p WHERE levenshtein(n1, n2) <= 1
      |ORDER BY k1, k2""".stripMargin

  // q201 — event-pattern matching (the CEP/MATCH_RECOGNIZE surface):
  // per user, the time-ordered event stream is rendered as a character
  // sequence (click→c, error→e, purchase→p, signup→s, view→v) and
  // scanned for the funnel pattern `vc*p` — a view, any number of
  // clicks, then a purchase with NOTHING ELSE intervening. The
  // character classes are disjoint so the regex is unambiguous:
  // Java-regex (Spark) and RE2 (DuckDB) produce identical
  // non-overlapping leftmost match counts. Where q64's funnel asks
  // "did stages happen in order, anywhere", this asks the strict
  // contiguous-pattern question only a sequence scan answers.
  //
  // Scale shape: one groupBy user — per-key state is that user's own
  // events (the per-key-sequence assumption every CEP engine makes; a
  // pathological key would session-chunk first). The regex scan is
  // linear per user. Streaming twin:
  // [[graft.streaming.StatefulStreams.streamingEventPattern]] runs the
  // equivalent 2-state NFA on arrival with O(1) state per user.
  private def q201(s: SparkSession, d: String): DataFrame = {
    val ch = expr("substr(event_type, 1, 1)") // c/e/p/s/v are distinct initials
    events(s, d)
      .select(col("user_id"), col("ts_ms"), col("event_id"), ch.as("ch"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        array_sort(collect_list(struct(col("ts_ms"), col("event_id"), col("ch"))))
          .as("seq"))
      .select(col("user_id"), col("n_events"),
        expr("regexp_count(array_join(transform(seq, x -> x.ch), ''), 'vc*p')")
          .as("n_funnels"))
      .orderBy(col("user_id"))
  }

  private val q201Sql =
    """WITH e AS (
      |  SELECT user_id, epoch_ms(ts) AS ts_ms, event_id,
      |    substr(event_type, 1, 1) AS ch
      |  FROM events)
      |SELECT user_id, count(*) AS n_events,
      |  CAST(len(regexp_extract_all(
      |    string_agg(ch, '' ORDER BY ts_ms, event_id), 'vc*p')) AS BIGINT)
      |    AS n_funnels
      |FROM e GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  // q204 — Cohen's kappa between two independent document gates: the
  // length gate (20 ≤ n_words ≤ 1000, q52's window) and a lexical
  // diversity gate (2·n_distinct ≥ n_words — at least half the tokens
  // distinct). Kappa corrects raw agreement for chance: with the 2×2
  // table (a=both pass, b=length only, c=diversity only, d=neither),
  //   kappa = (N·(a+d) − pe) / (N² − pe),  pe = (a+b)(a+c)+(c+d)(b+d).
  // All integer; products stage through DECIMAL(38,0)/HUGEINT (N² is
  // O(10^20) at corpus scale) and kappa ships in 2^20 fixed point.
  // This is the audit that says whether a cheap gate can stand in for
  // an expensive one before a 100 TB filtering run.
  //
  // Scale shape: one scan → four counters (a 1-row aggregate); the
  // token counting runs in the same codegen stage as q50.
  private def q204(s: SparkSession, d: String): DataFrame = {
    val toks = graft.functions.TextFns.tokens(col("text"))
    val t = documents(s, d).select(
      size(toks).as("nw"), size(array_distinct(toks)).as("nd"))
    val gated = t.select(
      (col("nw") >= 20 && col("nw") <= 1000).as("ga"),
      (col("nd") * 2 >= col("nw")).as("gb"))
    gated.agg(
        sum(when(col("ga") && col("gb"), 1L).otherwise(0L)).as("n_both"),
        sum(when(col("ga") && !col("gb"), 1L).otherwise(0L)).as("n_len_only"),
        sum(when(!col("ga") && col("gb"), 1L).otherwise(0L)).as("n_div_only"),
        sum(when(!col("ga") && !col("gb"), 1L).otherwise(0L)).as("n_neither"))
      .select(col("n_both"), col("n_len_only"), col("n_div_only"), col("n_neither"),
        expr("""CAST((CAST(n_both + n_len_only + n_div_only + n_neither AS DECIMAL(38,0))
               |        * (n_both + n_neither)
               |      - (CAST(n_both + n_len_only AS DECIMAL(38,0)) * (n_both + n_div_only)
               |         + CAST(n_div_only + n_neither AS DECIMAL(38,0)) * (n_len_only + n_neither)))
               |     * 1048576
               |     DIV greatest(
               |          CAST(n_both + n_len_only + n_div_only + n_neither AS DECIMAL(38,0))
               |            * (n_both + n_len_only + n_div_only + n_neither)
               |          - (CAST(n_both + n_len_only AS DECIMAL(38,0)) * (n_both + n_div_only)
               |             + CAST(n_div_only + n_neither AS DECIMAL(38,0)) * (n_len_only + n_neither)),
               |          1)
               |   AS BIGINT)""".stripMargin).as("kappa_fp"))
      // greatest(..., 1): a degenerate corpus where every doc lands in
      // one agreement cell makes pe = n² and the kappa denominator 0 —
      // Spark DIV would yield NULL, DuckDB // would raise; numerator is
      // 0 there too, so the guard pins both engines to kappa_fp = 0
  }

  private val q204Sql = {
    val toks = "regexp_extract_all(lower(text), '[a-z0-9]+')"
    s"""WITH t AS (
      |  SELECT len(toks) AS nw, len(list_distinct(toks)) AS nd
      |  FROM (SELECT $toks AS toks FROM documents) t0),
      |g AS (
      |  SELECT (nw >= 20 AND nw <= 1000) AS ga, (nd * 2 >= nw) AS gb FROM t),
      |c AS (
      |  SELECT
      |    sum(CASE WHEN ga AND gb THEN 1 ELSE 0 END) AS n_both,
      |    sum(CASE WHEN ga AND NOT gb THEN 1 ELSE 0 END) AS n_len_only,
      |    sum(CASE WHEN NOT ga AND gb THEN 1 ELSE 0 END) AS n_div_only,
      |    sum(CASE WHEN NOT ga AND NOT gb THEN 1 ELSE 0 END) AS n_neither
      |  FROM g)
      |SELECT CAST(n_both AS BIGINT) AS n_both,
      |  CAST(n_len_only AS BIGINT) AS n_len_only,
      |  CAST(n_div_only AS BIGINT) AS n_div_only,
      |  CAST(n_neither AS BIGINT) AS n_neither,
      |  CAST((CAST(n_both + n_len_only + n_div_only + n_neither AS HUGEINT)
      |          * (n_both + n_neither)
      |        - (CAST(n_both + n_len_only AS HUGEINT) * (n_both + n_div_only)
      |           + CAST(n_div_only + n_neither AS HUGEINT) * (n_len_only + n_neither)))
      |       * 1048576
      |       // greatest(
      |            CAST(n_both + n_len_only + n_div_only + n_neither AS HUGEINT)
      |              * (n_both + n_len_only + n_div_only + n_neither)
      |            - (CAST(n_both + n_len_only AS HUGEINT) * (n_both + n_div_only)
      |               + CAST(n_div_only + n_neither AS HUGEINT) * (n_len_only + n_neither)),
      |            1)
      |     AS BIGINT) AS kappa_fp
      |FROM c""".stripMargin
  }

  // q224 — pattern MEASURES for the q201 funnel: the time from the
  // arming view to its purchase, for every `vc*p` match. Relational
  // form of CEP measure extraction: a purchase completes a match iff
  // the LATEST non-click event before it (per user, event-time order)
  // is a view — provably the same match set as the q201 regex
  // (clicks are the only events c* can absorb, an intervening
  // purchase/error/signup is itself non-click and breaks the chain,
  // and non-overlap falls out because the completing purchase is
  // non-click too). Latencies ship as a log2-bucketed spectrum (the
  // q185 ruler) with per-bucket counts and exact total — the
  // "how fast do funnels convert" answer the match COUNT alone
  // doesn't give.
  //
  // Scale shape: one per-user window (max-of-struct over the
  // preceding frame — bounded key groups, no global sort), then a
  // ≤64-row bucket aggregate.
  private def q224(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ch = expr("substr(event_type, 1, 1)")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ms"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ev = events(s, d)
      .select(col("user_id"), col("ts_ms"), col("event_id"), ch.as("ch"))
    val matched = ev
      .withColumn("prev_nc", max(when(col("ch") =!= "c",
        struct(col("ts_ms"), col("event_id"), col("ch")))).over(w))
      .filter(col("ch") === "p" && col("prev_nc.ch") === "v")
      .select((col("ts_ms") - col("prev_nc.ts_ms")).as("elapsed_ms"))
    matched // bucket = bit-length log2 (q185 idiom — no float log2)
      .groupBy(expr("CAST(length(bin(elapsed_ms + 1)) - 1 AS BIGINT)").as("bucket"))
      .agg(count(lit(1)).as("n_funnels"),
        sum(col("elapsed_ms")).as("total_ms"))
      .orderBy(col("bucket"))
  }

  private val q224Sql =
    """WITH e AS (
      |  SELECT user_id, epoch_ms(ts) AS ts_ms, event_id,
      |    substr(event_type, 1, 1) AS ch
      |  FROM events),
      |m AS (
      |  SELECT user_id, ts_ms, event_id, ch,
      |    max(CASE WHEN ch <> 'c'
      |        THEN {'ts': ts_ms, 'id': event_id, 'ch': ch} END)
      |      OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_nc
      |  FROM e)
      |SELECT CAST(length(printf('%b', ts_ms - prev_nc.ts + 1)) - 1 AS BIGINT)
      |    AS bucket,
      |  count(*) AS n_funnels,
      |  CAST(sum(ts_ms - prev_nc.ts) AS BIGINT) AS total_ms
      |FROM m
      |WHERE ch = 'p' AND prev_nc.ch = 'v'
      |GROUP BY 1
      |ORDER BY bucket""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q200_edit_distance_join", q200, Some(q200Sql)),
    Q("q201_event_pattern", q201, Some(q201Sql)),
    Q("q204_cohens_kappa", q204, Some(q204Sql)),
    Q("q224_funnel_latency", q224, Some(q224Sql)),
  )
}
