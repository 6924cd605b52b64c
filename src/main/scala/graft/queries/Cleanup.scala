package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.TextFns._

/** Document REWRITE operators — the cleanup passes that edit text
  * in place rather than keep/drop whole documents: segment-level
  * boilerplate removal (the RefinedWeb/CCNet "line dedup" stage,
  * which strips nav bars / cookie banners / shared template text by
  * corpus-wide segment frequency and reassembles each document from
  * its surviving segments) and within-document adjacent-repetition
  * collapse (the degenerate-generation scrub applied to synthetic /
  * model-written corpora). The reference (affo/ssp) has no corpus
  * surface; these extend the beyond-reference pipeline of SURVEY
  * §2.4.
  *
  * Scale shape, q121: segment TEXT is never shuffled — the segment
  * frame carries (doc_id, k, fingerprint, token count), 32
  * bytes/segment, and the clean text is rebuilt IN-ROW from each
  * doc's token array against its dropped-index set (duplicate-mass-
  * sized). The hot set (segments shared by ≥ SegMinDf docs) is
  * template-mass-sized, not corpus-sized, but is NOT assumed
  * broadcastable: at 100 TB every page's boilerplate header lands in
  * it, so it flows through a shuffled equi-join on the hash — the
  * q114 rule. The frequency aggregate combines map-side.
  *
  * Scale shape, q124: pure single-scan codegen projection — every
  * measure folds over one token array; no join, no aggregation, no
  * shuffle of corpus data beyond the presentation sort.
  */
object Cleanup {

  /** Non-overlapping segment length in tokens — the "line" unit of the
    * segment-frequency dedup (the synthetic corpus has no newlines, so
    * the segmentation is positional; a web corpus would split on
    * newline/sentence boundaries instead, everything downstream is
    * unchanged).
    */
  val SegLen = 8

  /** A segment appearing in at least this many DISTINCT documents is
    * boilerplate. RefinedWeb uses 2 for exact line dedup; templates
    * shared by any two pages are template, not content.
    */
  val SegMinDf = 2

  /** 0..n-1 index array, empty when n <= 0 (sequence() counts DOWN for
    * a negative upper bound, so guard explicitly).
    */
  private def indices(n: Column): Column =
    when(n > 0, sequence(lit(0), n - 1)).otherwise(array().cast("array<int>"))

  // Both rewrites materialize the token array behind a doc_id exchange
  // before any Generate consumes it (the q73 lesson — a Generate whose
  // child inlines the tokenizer regex re-evaluates it per OUTPUT row).

  // q121 — segment-frequency boilerplate removal + reassembly: split
  // each document into fixed SegLen-token segments, count each exact
  // segment's document frequency corpus-wide, drop segments shared by
  // >= SegMinDf docs, and rebuild the document from the survivors in
  // order. Emits per doc the token count, tokens removed, segments
  // dropped, and the fingerprint of the reassembled text (downstream
  // consumes hashes, not text — the driver-contract output stays
  // narrow).
  private def q121(s: SparkSession, d: String): DataFrame =
    segmentDedupOf(documents(s, d))

  /** The q121 rewrite over any (doc_id, text) frame — public so specs
    * can pin the all-segments-dropped and partial-tail edges on
    * fixtures.
    */
  def segmentDedupOf(docs: DataFrame): DataFrame = {
    val base = docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .repartition(col("doc_id"))
      .withColumn("n", size(col("toks")))
      .localCheckpoint()
    // Segment rows carry ONLY (doc_id, k, fingerprint, token count) —
    // 32 bytes/segment; segment TEXT is never shuffled. Materialized
    // once: both the frequency aggregate and the dropped-set join read
    // the same frame.
    val segs = base
      .filter(col("n") > 0)
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0L),
          expr(s"(size(toks) + ${SegLen - 1}) div $SegLen").cast("long") - 1))
          .as("k"))
      .select(col("doc_id"), col("k"),
        hash60(concat_ws(" ", slice(col("toks"), (col("k") * SegLen + 1).cast("int"),
          lit(SegLen)))).as("h"),
        size(slice(col("toks"), (col("k") * SegLen + 1).cast("int"),
          lit(SegLen))).cast("long").as("seg_n"))
      .localCheckpoint()
    val hot = segs.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= SegMinDf)
      .select(col("h"), lit(1).as("__hot"))
    // dropped-segment index set per doc (duplicate-mass-sized, tiny
    // next to the corpus); the clean text is rebuilt IN-ROW from the
    // original token array against this set
    val dropped = segs.join(hot, Seq("h"))
      .groupBy(col("doc_id"))
      .agg(sum(col("seg_n")).as("n_removed"),
        count(lit(1)).as("n_segs_dropped"),
        collect_list(col("k")).as("dks"))
    base.join(dropped, Seq("doc_id"), "left")
      .withColumn("dks", coalesce(col("dks"), array().cast("array<bigint>")))
      .withColumn("clean_text", when(col("n") > 0, expr(
        s"""array_join(transform(
           |  filter(sequence(0L, (size(toks) + ${SegLen - 1}) div $SegLen - 1L),
           |    k -> NOT array_contains(dks, k)),
           |  k -> array_join(slice(toks, cast(k * $SegLen + 1 as int), $SegLen), ' ')),
           |  ' ')""".stripMargin)).otherwise(lit("")))
      .select(col("doc_id"), col("n").cast("long").as("n_toks"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"),
        coalesce(col("n_segs_dropped"), lit(0L)).as("n_segs_dropped"),
        hash60(col("clean_text")).as("clean_hash"))
      .orderBy(col("doc_id"))
  }

  private val q121Sql = {
    val slice = s"list_slice(toks, k*$SegLen+1, k*$SegLen+$SegLen)"
    s"""WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '$TokenPattern') AS toks
      |           FROM documents),
      |s AS (SELECT doc_id, k, array_to_string($slice, ' ') AS seg,
      |             len($slice) AS seg_n
      |      FROM (SELECT doc_id, toks,
      |              unnest(range((len(toks) + ${SegLen - 1}) // $SegLen)) AS k
      |            FROM t WHERE len(toks) > 0)),
      |hs AS (SELECT doc_id, k, seg, seg_n, ${hash60Sql("seg")} AS h FROM s),
      |hot AS (SELECT h FROM hs GROUP BY h
      |        HAVING count(DISTINCT doc_id) >= $SegMinDf),
      |f AS (SELECT hs.*, hs.h IN (SELECT h FROM hot) AS is_hot FROM hs),
      |agg AS (SELECT doc_id,
      |          SUM(CASE WHEN is_hot THEN seg_n ELSE 0 END) AS n_removed,
      |          SUM(CASE WHEN is_hot THEN 1 ELSE 0 END) AS n_segs_dropped,
      |          string_agg(CASE WHEN NOT is_hot THEN seg END, ' ' ORDER BY k)
      |            AS clean_text
      |        FROM f GROUP BY doc_id)
      |SELECT t.doc_id, CAST(len(toks) AS BIGINT) AS n_toks,
      |  CAST(coalesce(n_removed, 0) AS BIGINT) AS n_removed,
      |  CAST(coalesce(n_segs_dropped, 0) AS BIGINT) AS n_segs_dropped,
      |  ${hash60Sql("coalesce(clean_text, '')")} AS clean_hash
      |FROM t LEFT JOIN agg USING (doc_id)
      |ORDER BY doc_id""".stripMargin
  }

  // q124 — adjacent-repetition collapse: drop every token equal to its
  // immediate predecessor ("batch batch batch" → "batch"), emitting
  // tokens removed, distinct terms that repeated, and the cleaned-text
  // fingerprint. The whole rewrite is index lambdas over one token
  // array inside codegen — the cheapest of all the scrub passes, run
  // first in a real pipeline.
  private def q124(s: SparkSession, d: String): DataFrame =
    repetitionTrimOf(documents(s, d))

  /** The q124 rewrite over any (doc_id, text) frame — public for
    * fixture specs.
    */
  def repetitionTrimOf(docs: DataFrame): DataFrame = {
    val toks = col("toks")
    def at(i: Column): Column = element_at(toks, (i + 1).cast("int"))
    docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .repartition(col("doc_id"))
      .withColumn("n", size(toks))
      .withColumn("clean", transform(
        filter(indices(col("n")), i => (i === 0) || at(i) =!= at(i - 1)),
        i => at(i)))
      .withColumn("dups", transform(
        filter(indices(col("n")), i => (i > 0) && at(i) === at(i - 1)),
        i => at(i)))
      .select(col("doc_id"), col("n").cast("long").as("n_toks"),
        (col("n") - size(col("clean"))).cast("long").as("n_removed"),
        size(array_distinct(col("dups"))).cast("long").as("n_dup_terms"),
        hash60(concat_ws(" ", col("clean"))).as("clean_hash"))
      .orderBy(col("doc_id"))
  }

  private val q124Sql = {
    val keep = "list_filter(range(1, len(toks)+1), i -> i = 1 OR toks[i] <> toks[i-1])"
    val dups = "list_filter(range(2, len(toks)+1), i -> toks[i] = toks[i-1])"
    s"""WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '$TokenPattern') AS toks
      |           FROM documents)
      |SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_toks,
      |  CAST(len(toks) - len($keep) AS BIGINT) AS n_removed,
      |  CAST(len(list_distinct(list_transform($dups, i -> toks[i]))) AS BIGINT)
      |    AS n_dup_terms,
      |  ${hash60Sql(s"array_to_string(list_transform($keep, i -> toks[i]), ' ')")}
      |    AS clean_hash
      |FROM t
      |ORDER BY doc_id""".stripMargin
  }

  /** The corpus-wide hot-segment set as ONE row holding a (fingerprint
    * → 1) map — the static-model broadcast shape of
    * [[graft.queries.Fluency.fluencyStream]]. Bounded by template
    * mass, not corpus size; if a real corpus's template set outgrows
    * broadcast, the streaming form below degrades to the batch join.
    */
  private def hotSegmentsOf(staticCorpus: DataFrame): DataFrame = {
    val base = staticCorpus
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .repartition(col("doc_id"))
      .withColumn("n", size(col("toks")))
    base.filter(col("n") > 0)
      .select(col("doc_id"),
        explode(sequence(lit(0L),
          expr(s"(size(toks) + ${SegLen - 1}) div $SegLen").cast("long") - 1))
          .as("k"),
        col("toks"))
      .select(col("doc_id"),
        hash60(concat_ws(" ", slice(col("toks"),
          (col("k") * SegLen + 1).cast("int"), lit(SegLen)))).as("h"))
      .groupBy(col("h")).agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= SegMinDf)
      .agg(map_from_arrays(collect_list(col("h")),
        transform(collect_list(col("h")), _ => lit(1L))).as("m"))
  }

  /** Streaming form of q121 — the deployment shape: mine the
    * boilerplate set ONCE from a static corpus, then stream arriving
    * documents through the rewrite. The hot set broadcasts as a 1-row
    * map and the whole segment-split / probe / reassembly runs as
    * index lambdas over the in-row token array — no explode, no
    * streaming aggregation, no state; append mode at stateless-filter
    * cost. Emits the same five columns as batch q121.
    */
  def segmentDedupStream(stream: DataFrame, staticCorpus: DataFrame): DataFrame = {
    def h60(e: String) = s"cast(conv(substr(md5($e), 1, 15), 16, 10) as bigint)"
    val segsExpr = expr(
      s"""transform(
         |  sequence(0L, (size(toks) + ${SegLen - 1}) div $SegLen - 1L),
         |  k -> array_join(slice(toks, cast(k * $SegLen + 1 as int), $SegLen), ' '))
         |""".stripMargin)
    stream
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .withColumn("segs", when(size(col("toks")) > 0, segsExpr)
        .otherwise(array().cast("array<string>")))
      .crossJoin(broadcast(hotSegmentsOf(staticCorpus)))
      .withColumn("kept", expr(s"filter(segs, s -> m[${h60("s")}] is null)"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("n_toks"),
        (size(col("toks")).cast("long") -
          expr("aggregate(kept, 0L, (a, s) -> a + size(split(s, ' ')))")
            .as("n_kept")).as("n_removed"),
        (size(col("segs")) - size(col("kept"))).cast("long").as("n_segs_dropped"),
        hash60(array_join(col("kept"), " ")).as("clean_hash"))
  }

  // ---- q133: PII scrub (regex redaction pipeline) ------------------------

  /** Redaction patterns — deliberately written in the common subset of
    * Java regex (Spark, codegen'd RegExpReplace) and RE2 (DuckDB), so
    * the scrub is oracle-checkable character-for-character. Matches the
    * standard CC-pipeline scrub lists (email, phone, long digit runs /
    * IDs); additional patterns are rows in this list, not new code.
    */
  val EmailPat = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  val PhonePat = """\+[0-9]{2}-[0-9]{7}"""
  val IdRunPat = """[0-9]{4,}"""

  // q133 — PII redaction over a contact-log frame: each customer row is
  // rendered as a message carrying an email, a phone number, and the
  // numeric customer id (the synthetic corpus itself is digit-free, so
  // the PII-bearing frame is constructed deterministically from
  // customer columns — identically in the oracle). The scrub is the
  // standard sequential pipeline: emails → phones → remaining long
  // digit runs, counting each pattern against the text the stage
  // actually sees (so digit runs inside an already-redacted email are
  // not double-counted). Scale shape: a single-scan whole-stage-codegen
  // projection — no join, no aggregation, no shuffle beyond the
  // presentation sort; at 100 TB this runs at scan speed, which is why
  // production scrubs are regex passes and not lookups.
  private def q133(s: SparkSession, d: String): DataFrame = {
    val msg = concat(
      col("c_name"), lit(" <user"), col("c_custkey").cast("string"),
      lit("@example.com> tel +00-"),
      lpad((col("c_custkey") * 7919L % 10000000L).cast("string"), 7, "0"),
      lit(" seg "), col("c_mktsegment"))
    customer(s, d)
      .select(col("c_custkey"), msg.as("msg"))
      .withColumn("n_email", regexp_count(col("msg"), lit(EmailPat)).cast("long"))
      .withColumn("r1", regexp_replace(col("msg"), EmailPat, "[EMAIL]"))
      .withColumn("n_phone", regexp_count(col("r1"), lit(PhonePat)).cast("long"))
      .withColumn("r2", regexp_replace(col("r1"), PhonePat, "[PHONE]"))
      .withColumn("n_idrun", regexp_count(col("r2"), lit(IdRunPat)).cast("long"))
      .withColumn("redacted", regexp_replace(col("r2"), IdRunPat, "[ID]"))
      .select(col("c_custkey"), col("n_email"), col("n_phone"),
        col("n_idrun"), col("redacted"))
      .orderBy(col("c_custkey"))
  }

  private val q133Sql = {
    val msg = "c_name || ' <user' || CAST(c_custkey AS VARCHAR) || '@example.com> tel +00-' || " +
      "lpad(CAST(c_custkey * 7919 % 10000000 AS VARCHAR), 7, '0') || ' seg ' || c_mktsegment"
    s"""WITH m AS (SELECT c_custkey, $msg AS msg FROM customer),
      |s1 AS (SELECT c_custkey, msg,
      |         len(regexp_extract_all(msg, '$EmailPat')) AS n_email,
      |         regexp_replace(msg, '$EmailPat', '[EMAIL]', 'g') AS r1 FROM m),
      |s2 AS (SELECT *, len(regexp_extract_all(r1, '$PhonePat')) AS n_phone,
      |         regexp_replace(r1, '$PhonePat', '[PHONE]', 'g') AS r2 FROM s1)
      |SELECT c_custkey, n_email, n_phone,
      |  len(regexp_extract_all(r2, '$IdRunPat')) AS n_idrun,
      |  regexp_replace(r2, '$IdRunPat', '[ID]', 'g') AS redacted
      |FROM s2
      |ORDER BY c_custkey""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q("q121_segment_dedup", q121, Some(q121Sql)),
    Q("q124_repetition_trim", q124, Some(q124Sql)),
    Q("q133_pii_scrub", q133, Some(q133Sql)),
  )
}
