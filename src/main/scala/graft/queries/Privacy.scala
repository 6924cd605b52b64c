package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables._

/** Privacy / re-identification audits and incremental-maintenance
  * demonstrations — release gates a data pipeline runs before a corpus
  * or derived table leaves the boundary. The reference (affo/ssp) has
  * no privacy surface; this is beyond-reference LLM-pipeline
  * capability, sibling to the PII scrub (q133).
  */
object Privacy {

  /** k-anonymity threshold: a quasi-identifier group smaller than K
    * re-identifies its members.
    */
  val AnonK = 8L
  /** l-diversity threshold on the sensitive attribute. */
  val DiversityL = 2L

  // q186 — k-anonymity / l-diversity audit over the customer table:
  // quasi-identifiers (nation, market segment) partition the table
  // into equivalence classes; a class with fewer than K members
  // re-identifies, and a class whose sensitive attribute (account
  // balance bucket) takes fewer than L distinct values leaks it even
  // at size ≥ K — the two checks every tabular release gate runs
  // (generalize or suppress the failing classes before export). The
  // sensitive bucket is exact integer cents DIV 200000 (≈$2000 bands;
  // round(v·100) recovers the cent grid exactly in both engines, and
  // Spark DIV / DuckDB // both truncate toward zero on negatives).
  //
  // Scale shape: one scan into a QI-sized hash aggregate with
  // count + count(DISTINCT bucket) (Expand ×2, partials map-side
  // combined) — the shuffle carries equivalence classes, never rows.
  private def q186(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .select(col("c_nationkey").cast("long").as("nationkey"),
        col("c_mktsegment").as("mktsegment"),
        expr("CAST(round(c_acctbal * 100) AS BIGINT) DIV 200000").as("bal_bucket"))
      .groupBy(col("nationkey"), col("mktsegment"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("bal_bucket")).as("l_distinct"))
      .select(col("nationkey"), col("mktsegment"), col("n"), col("l_distinct"),
        (col("n") >= AnonK).as("k_ok"),
        (col("l_distinct") >= DiversityL).as("l_ok"))
      .orderBy(col("nationkey"), col("mktsegment"))

  private val q186Sql =
    s"""SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
      |  c_mktsegment AS mktsegment, count(*) AS n,
      |  count(DISTINCT CAST(round(c_acctbal * 100) AS BIGINT) // 200000)
      |    AS l_distinct,
      |  count(*) >= $AnonK AS k_ok,
      |  count(DISTINCT CAST(round(c_acctbal * 100) AS BIGINT) // 200000)
      |    >= $DiversityL AS l_ok
      |FROM customer
      |GROUP BY 1, 2
      |ORDER BY nationkey, mktsegment""".stripMargin

  // q187 — incremental aggregate maintenance (the materialized-view
  // pattern that makes 100 TB aggregates affordable): the pricing
  // cells are maintained by MERGING the previous snapshot's partial
  // aggregates (orderkey-parity 0 proxies "history") with the new
  // batch's partials (parity 1) — sums add, counts add, mins combine —
  // instead of rescanning history. The query's PLAN is the point: two
  // independent partial aggregations unioned into a cells-sized merge,
  // where at production scale the history partials are a stored table
  // and only the delta scans. The oracle computes the same cells
  // directly over the full table, verifying the merge is algebraically
  // exact (DECIMAL(14,2) sums — the q01 dsum discipline, no float
  // reassociation).
  private def q187(s: SparkSession, d: String): DataFrame = {
    def partials(df: DataFrame): DataFrame =
      df.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity").cast(DecimalType(14, 2))).as("sq"),
          sum(col("l_extendedprice").cast(DecimalType(14, 2))).as("sp"),
          count(lit(1)).as("cnt"),
          min(col("l_quantity").cast(DecimalType(14, 2))).as("mq"))
    val li = lineitem(s, d)
    val hist = partials(li.filter(pmod(col("l_orderkey"), lit(2)) === 0))
    val delta = partials(li.filter(pmod(col("l_orderkey"), lit(2)) === 1))
    hist.unionAll(delta)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("sq")).cast("double").as("sum_qty"),
        sum(col("sp")).cast("double").as("sum_price"),
        sum(col("cnt")).as("n_rows"),
        min(col("mq")).cast("double").as("min_qty"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  private val q187Sql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) AS sum_price,
      |  count(*) AS n_rows,
      |  CAST(min(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS min_qty
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Per-user contribution cap for the q207 clipped release. */
  val ClipCap = 8L

  // q207 — differential-privacy pre-release audit: user-level
  // contribution bounding for the per-event-type count release. A DP
  // count's noise scales with the SENSITIVITY — how much one user can
  // move the statistic — so before adding noise every DP pipeline (a)
  // measures the actual max per-user contribution, and (b) CLIPS each
  // user to a cap C, accepting the bias sum−clipped_sum in exchange
  // for sensitivity C instead of max_contrib. This query is that
  // audit: per event type, the raw count, the contributing-user count,
  // the worst contributor, the C=ClipCap clipped count, and the
  // clipping bias — everything needed to pick C and budget ε. All
  // exact integer counts (the noise itself is the one part that must
  // NOT be deterministic, so it is out of scope by design).
  //
  // Scale shape: two-level aggregate — (type, user) partial counts
  // (map-side combined, shuffled once on the pair key), then a
  // |types|-row roll-up. No row-sized shuffle; skew-safe because the
  // pair key splits any hot event type across its users.
  private def q207(s: SparkSession, d: String): DataFrame =
    graft.Tables.events(s, d)
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("event_type"))
      .agg(sum(col("c")).as("n_events"),
        count(lit(1)).as("n_users"),
        max(col("c")).as("max_user_contrib"),
        sum(least(col("c"), lit(ClipCap))).as("clipped_sum"))
      .select(col("event_type"), col("n_events"), col("n_users"),
        col("max_user_contrib"), col("clipped_sum"),
        (col("n_events") - col("clipped_sum")).as("clip_loss"))
      .orderBy(col("event_type"))

  private val q207Sql =
    s"""WITH uc AS (
      |  SELECT event_type, user_id, count(*) AS c
      |  FROM events GROUP BY 1, 2)
      |SELECT event_type, CAST(sum(c) AS BIGINT) AS n_events,
      |  count(*) AS n_users, max(c) AS max_user_contrib,
      |  CAST(sum(least(c, $ClipCap)) AS BIGINT) AS clipped_sum,
      |  CAST(sum(c) - sum(least(c, $ClipCap)) AS BIGINT) AS clip_loss
      |FROM uc GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** q251: recursive (c,l)-diversity parameters (Machanavajjhala et
    * al., "l-Diversity: Privacy Beyond k-Anonymity", ICDE 2006, §4).
    */
  val RecursiveL = 3
  val RecursiveC = 2L

  // q251 — recursive (c,l)-diversity audit: q186's distinct-l check
  // accepts a group where one sensitive value covers 99% of members —
  // frequency skew re-identifies even when l distinct values exist.
  // The recursive criterion fixes that: with per-group sensitive-value
  // counts r_1 ≥ r_2 ≥ … ≥ r_m (sorted desc), the group passes iff
  //   r_1 < c · (r_l + r_{l+1} + … + r_m)
  // — the top value must not dominate the tail beyond factor c. Here
  // the quasi-identifier is (lang, n_chars DIV 100) over documents and
  // the sensitive attribute is `source`; all arithmetic is exact
  // integer counts (the criterion is integer-native, no entropy/log).
  //
  // Scale shape: one scan → (QI, sensitive)-grouped counts (map-side
  // combine), then a row_number window PARTITIONED BY QI — each
  // partition holds one group's value census (≤ |sensitive domain|
  // rows, here ≤ 20), never member rows — and a QI-sized final
  // aggregate. Nothing row-sized shuffles twice.
  private def q251(s: SparkSession, d: String): DataFrame = {
    val counts = documents(s, d)
      .groupBy(col("lang"), expr("n_chars DIV 100").as("cb"), col("source"))
      .agg(count(lit(1)).as("r"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"), col("cb"))
      .orderBy(col("r").desc, col("source"))
    counts.withColumn("rn", row_number().over(w))
      .groupBy(col("lang"), col("cb"))
      .agg(sum(col("r")).as("n"),
        count(lit(1)).as("m"),
        max(when(col("rn") === 1, col("r"))).as("top1"),
        coalesce(sum(when(col("rn") >= RecursiveL, col("r"))), lit(0L))
          .as("tail_sum"))
      .select(col("lang"), col("cb"), col("n"), col("m"), col("top1"),
        col("tail_sum"),
        (col("top1") < col("tail_sum") * RecursiveC).as("rl_ok"))
      .orderBy(col("lang"), col("cb"))
  }

  private val q251Sql =
    s"""WITH counts AS (
      |  SELECT lang, n_chars // 100 AS cb, source, count(*) AS r
      |  FROM documents GROUP BY 1, 2, 3),
      |ranked AS (
      |  SELECT lang, cb, r,
      |    row_number() OVER (PARTITION BY lang, cb
      |      ORDER BY r DESC, source) AS rn
      |  FROM counts)
      |SELECT lang, cb, CAST(sum(r) AS BIGINT) AS n, count(*) AS m,
      |  CAST(max(CASE WHEN rn = 1 THEN r END) AS BIGINT) AS top1,
      |  CAST(coalesce(sum(CASE WHEN rn >= $RecursiveL THEN r END), 0)
      |    AS BIGINT) AS tail_sum,
      |  max(CASE WHEN rn = 1 THEN r END)
      |    < $RecursiveC * coalesce(sum(CASE WHEN rn >= $RecursiveL THEN r END), 0)
      |    AS rl_ok
      |FROM ranked GROUP BY lang, cb
      |ORDER BY lang, cb""".stripMargin

  /** t-closeness threshold in 2^20 fixed point (0.35). */
  val TCloseFp = 1048576L * 35 / 100

  // q252 — t-closeness audit, completing the release-gate triad with
  // q186 (k-anonymity) and q251 (recursive l-diversity): an
  // equivalence class passes only if its sensitive-value distribution
  // is CLOSE to the table-wide one — l-diversity can hold while the
  // class still leaks (e.g. 95% of a class in the top balance band).
  // Distance is the ordered-attribute Earth Mover's Distance of
  // Li/Li/Venkatasubramanian: over the globally-ordered m sensitive
  // buckets, t(c) = (1/(m−1))·Σ_{i<m} |Σ_{j≤i} (q_j − p_j)|. Computed
  // EXACTLY by scaling each term by N·n_c: the running deviation is
  // Σ_{j≤i} (c_cj·N − g_j·n_c) (integers; DECIMAL(38,0)/HUGEINT since
  // the product is O(N²)), and t_fp = 2^20·Σ|cum| DIV ((m−1)·N·n_c) —
  // bit-equal across engines, negative-free by abs.
  //
  // Scale shape: three grouped counts (cells, classes, global buckets;
  // all map-side combined), a classes×m dense grid via cross join of
  // two aggregate-sized frames, a per-class window over ≤m rows, and a
  // class-sized final aggregate. The shuffles carry distributions,
  // never members.
  private def q252(s: SparkSession, d: String): DataFrame = {
    val base = customer(s, d).select(
      col("c_nationkey").cast("long").as("nk"), col("c_mktsegment").as("seg"),
      expr("CAST(round(c_acctbal * 100) AS BIGINT) DIV 200000").as("b"))
    val g = base.groupBy(col("b")).agg(count(lit(1)).as("gj"))
    val tot = base.agg(count(lit(1)).as("n_tot"), countDistinct(col("b")).as("m"))
    val cls = base.groupBy(col("nk"), col("seg")).agg(count(lit(1)).as("nc"))
    val cells = base.groupBy(col("nk"), col("seg"), col("b"))
      .agg(count(lit(1)).as("c"))
    val grid = cls.crossJoin(g)
      .join(cells, Seq("nk", "seg", "b"), "left_outer")
      .withColumn("c0", coalesce(col("c"), lit(0L)))
      .crossJoin(broadcast(tot))
    val wc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("nk"), col("seg")).orderBy(col("b"))
    val cum = grid
      .withColumn("cd", sum(col("c0").cast(DecimalType(38, 0)) * col("n_tot")
        - col("gj").cast(DecimalType(38, 0)) * col("nc")).over(wc))
      .withColumn("rk", row_number().over(wc))
    cum.filter(col("rk") < col("m"))
      .groupBy(col("nk").as("nationkey"), col("seg").as("mktsegment"))
      .agg(max(col("nc")).as("n"),
        expr("""CAST(sum(abs(cd)) * 1048576
               |  DIV ((max(m) - 1) * CAST(max(n_tot) AS DECIMAL(38,0)) * max(nc))
               |  AS BIGINT)""".stripMargin).as("t_fp"))
      .withColumn("t_ok", col("t_fp") <= TCloseFp)
      .orderBy(col("nationkey"), col("mktsegment"))
  }

  private val q252Sql =
    s"""WITH base AS (
      |  SELECT CAST(c_nationkey AS BIGINT) AS nk, c_mktsegment AS seg,
      |    CAST(round(c_acctbal * 100) AS BIGINT) // 200000 AS b
      |  FROM customer),
      |g AS (SELECT b, count(*) AS gj FROM base GROUP BY b),
      |tot AS (SELECT count(*) AS n_tot, count(DISTINCT b) AS m FROM base),
      |cls AS (SELECT nk, seg, count(*) AS nc FROM base GROUP BY nk, seg),
      |cells AS (
      |  SELECT nk, seg, b, count(*) AS c FROM base GROUP BY nk, seg, b),
      |grid AS (
      |  SELECT cls.nk, cls.seg, cls.nc, g.b, g.gj,
      |    COALESCE(cells.c, 0) AS c0
      |  FROM cls CROSS JOIN g
      |  LEFT JOIN cells ON cells.nk = cls.nk AND cells.seg = cls.seg
      |    AND cells.b = g.b),
      |cum AS (
      |  SELECT nk, seg, nc, b, m, n_tot,
      |    sum(CAST(c0 AS HUGEINT) * n_tot - CAST(gj AS HUGEINT) * nc)
      |      OVER (PARTITION BY nk, seg ORDER BY b) AS cd,
      |    row_number() OVER (PARTITION BY nk, seg ORDER BY b) AS rk
      |  FROM grid, tot)
      |SELECT nk AS nationkey, seg AS mktsegment,
      |  CAST(max(nc) AS BIGINT) AS n,
      |  CAST(sum(abs(cd)) * 1048576
      |    // ((max(m) - 1) * CAST(max(n_tot) AS HUGEINT) * max(nc))
      |    AS BIGINT) AS t_fp,
      |  CAST(sum(abs(cd)) * 1048576
      |    // ((max(m) - 1) * CAST(max(n_tot) AS HUGEINT) * max(nc))
      |    <= $TCloseFp AS BOOLEAN) AS t_ok
      |FROM cum WHERE rk < m GROUP BY nk, seg
      |ORDER BY nationkey, mktsegment""".stripMargin

  // q264 — differentially-private histogram RELEASE via the geometric
  // mechanism (Ghosh, Roughgarden & Sundararajan 2009 — the universally
  // optimal mechanism for counting queries). This completes what q207
  // deliberately left out: q207 audits sensitivity and clips
  // contributions; q264 adds the noise and emits the released counts.
  // Cells are the (lang, source) counts over `documents` — disjoint
  // cells, so parallel composition gives the whole histogram the same
  // ε as one cell.
  //
  // α = 1/2 (ε = ln 2) is chosen because the two-sided geometric with
  // a dyadic α has EXACTLY rational probabilities: truncated at
  // |k| ≤ DpB, the distribution with weights 2^(DpB−|k|) per sign is
  // sampled exactly by integer arithmetic on u ∈ [0, 3·2^DpB − 2) —
  // magnitude = DpB + 1 − bitlen(2^DpB − 1 − m) recovers the geometric
  // tail from the bit length (DpNoiseSpec pins the full histogram of
  // the map against the closed-form weights). No float, no log: both
  // engines produce bit-identical noise. Honesty note on the
  // truncation: hard-truncating at ±DpB makes the guarantee
  // (ε, δ)-DP with δ = P(|k| = DpB)·(1 − 1/e^ε) ≈ 2^−DpB/3 ≈ 3·10⁻⁷
  // rather than pure ε-DP (adjacent counts can tell |k| = DpB from
  // the impossible |k| = DpB+1); the untruncated mechanism, or
  // reflecting the tail mass inward, restores pure ε at the cost of
  // unbounded (resp. non-dyadic) noise values.
  //
  // u comes from a SEEDED portable hash of the cell key — this makes
  // the release a deterministic test vector for the oracle compare; a
  // production release swaps the seed for real entropy (that single
  // line is the only nondeterminism a DP release needs, exactly the
  // boundary q207's doc comment drew). The seed is therefore an
  // INJECTED parameter: the test vector [[DpTestSeed]] appears only at
  // the oracle-checked query / spec / streaming-twin call sites, never
  // as a default.
  //
  // Scale shape: one map-side-combined groupBy on the (lang, source)
  // pair key; the noise is a per-cell scalar expression — nothing
  // after the aggregate touches corpus-sized data.
  val DpB = 20
  /** u-range of the truncated sampler: 2^DpB central + 2·(2^DpB − 1). */
  val DpT = 3L * (1L << DpB) - 2
  /** Deterministic TEST-VECTOR seed — makes the release reproducible
    * for the DuckDB oracle compare and the bit-equality specs. A code
    * constant is PUBLIC: noise drawn from it can be recomputed by any
    * consumer, so it carries zero privacy. Production callers must
    * inject fresh secret entropy instead (see [[dpRelease]]).
    */
  private[graft] val DpTestSeed = "dp-geom-1"

  /** The q264 release over any (lang, source) frame — shared by the
    * batch query and the streaming twin (`StatefulStreams.
    * streamingDpRelease`): because the noise is a function of the CELL
    * KEY alone, every re-release (each micro-batch refresh of a live
    * dashboard) is post-processing of the same single release — the
    * privacy budget stays one ε no matter how often the counts are
    * re-published, and the stream matches the batch bit-for-bit.
    */
  private[graft] def dpHistogramOf(docs: DataFrame, seed: String): DataFrame = {
    val half = 1L << DpB
    // NULL key components are coalesced to '' BEFORE hashing: concat_ws
    // silently SKIPS nulls while SQL || propagates them, so without the
    // coalesce the two engines would disagree on any cell with a NULL
    // lang/source (and the noise would collide with the non-null cell
    // that happens to serialize the same).
    docs
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("u",
        pmod(graft.functions.TextFns.hash60(
          concat_ws("|", lit(seed),
            coalesce(col("lang"), lit("")),
            coalesce(col("source"), lit("")))),
          lit(DpT)))
      .withColumn("noise", expr(
        s"""CASE WHEN u < $half THEN 0L ELSE
           |  (1 - 2 * ((u - $half) % 2))
           |  * ($DpB + 1 - length(bin($half - 1 - (u - $half) DIV 2)))
           |END""".stripMargin))
      .select(col("lang"), col("source"),
        greatest(col("cnt") + col("noise"), lit(0L)).as("n_released"),
        col("noise"))
  }

  /** The releasable projection: released counts ONLY. The noise column
    * stays inside [[dpHistogramOf]] (specs reach it there) — emitting
    * it would let any consumer reconstruct the exact count as
    * n_released − noise, voiding the guarantee, so neither the batch
    * query nor the streaming twin ever publishes it.
    *
    * PRIVACY WARNING — the seed must be SECRET ENTROPY or there is no
    * privacy at all: the noise is a deterministic function of (seed,
    * cell key), so a consumer who knows the seed recomputes the noise
    * and inverts n_released back to the exact count. Withholding the
    * noise column only helps when the seed is unknown. [[DpTestSeed]]
    * is a public code constant and therefore carries ZERO privacy — it
    * exists solely so the oracle compare and the batch/stream
    * bit-equality specs have a reproducible vector.
    */
  private[graft] def dpRelease(docs: DataFrame, seed: String): DataFrame =
    dpHistogramOf(docs, seed).select(col("lang"), col("source"), col("n_released"))

  private def q264(s: SparkSession, d: String): DataFrame =
    dpRelease(graft.Tables.documents(s, d), DpTestSeed)
      .orderBy(col("lang"), col("source"))

  private val q264Sql = {
    val half = 1L << DpB
    val u = s"(${graft.functions.TextFns.hash60Sql(
      s"'$DpTestSeed' || '|' || coalesce(lang, '') || '|' || coalesce(source, '')")} % $DpT + $DpT) % $DpT"
    s"""WITH cells AS (
      |  SELECT lang, source, count(*) AS cnt, $u AS u
      |  FROM documents GROUP BY 1, 2),
      |noised AS (
      |  SELECT lang, source, cnt,
      |    CASE WHEN u < $half THEN 0 ELSE
      |      (1 - 2 * ((u - $half) % 2))
      |      * ($DpB + 1 - length(bin($half - 1 - (u - $half) // 2)))
      |    END AS noise
      |  FROM cells)
      |SELECT lang, source,
      |  CAST(greatest(cnt + noise, 0) AS BIGINT) AS n_released
      |FROM noised
      |ORDER BY lang, source""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q("q186_k_anonymity", q186, Some(q186Sql)),
    Q("q187_incremental_agg", q187, Some(q187Sql)),
    Q("q207_dp_contribution", q207, Some(q207Sql)),
    Q("q251_recursive_ldiv", q251, Some(q251Sql)),
    Q("q252_t_closeness", q252, Some(q252Sql)),
    Q("q264_dp_histogram", q264, Some(q264Sql)),
  )
}
