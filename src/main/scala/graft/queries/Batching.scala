package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.TextFns._

/** Length-grouped batch packing — the data-LOADER step that follows
  * all the selection/ordering stages: group documents into
  * token-length bands, shuffle deterministically within each band, and
  * pack fixed-size batches, reporting each batch's padding waste. This
  * is HF's LengthGroupedSampler / the "bucketed batching" trick —
  * batching similar-length sequences cuts the padding fraction (a
  * batch pads every member to its max length), directly measurable in
  * the emitted pad_fp column. The reference (affo/ssp) has no corpus
  * surface; beyond-reference pipeline op per SURVEY §2.4.
  *
  * Scale shape: the in-band order comes from a seeded hash draw ranked
  * by [[Sampling.rankDistributed]] (range partition + cluster-sized
  * carry broadcast — never a per-band sort window), and the per-batch
  * aggregation combines map-side. One corpus scan, two bounded
  * shuffles; nothing is collected or broadcast at corpus size.
  */
object Batching {

  /** Token-length band width: band = n_toks div BandWidth. */
  val BandWidth = 16

  /** Documents per packed batch. */
  val BatchDocs = 8

  /** Fixed-point scale for the padding fraction. */
  val FpScale = 1048576L // 2^20

  /** Seed for the in-band deterministic shuffle. */
  val PackSeed = "graft-pack-1"

  // q125 — length-bucketed batch packing: per batch, member count, max
  // and total token length, and the padding fraction in 2^20 fixed
  // point ((n·max − Σlen)·2^20 div (n·max)). Integer end to end.
  private def q125(s: SparkSession, d: String): DataFrame =
    packedBatchesOf(documents(s, d))

  /** The q125 packing over any (doc_id, text) frame — public for
    * fixture specs.
    */
  def packedBatchesOf(docs: DataFrame): DataFrame = {
    val sized = docs
      .select(col("doc_id"), tokenCount(col("text")).as("n_toks"))
      .withColumn("band", expr(s"n_toks div $BandWidth"))
      .withColumn("draw", hash60(concat(lit(PackSeed), col("doc_id").cast("string"))))
    Sampling.rankDistributed(sized, Seq("band"), Seq(col("draw"), col("doc_id")))
      .withColumn("batch_idx", expr(s"(rk - 1L) div $BatchDocs"))
      .groupBy(col("band"), col("batch_idx"))
      .agg(count(lit(1)).as("n_docs"),
        max(col("n_toks")).as("max_len"),
        sum(col("n_toks")).as("sum_len"))
      .withColumn("pad_fp", expr(
        s"((n_docs * max_len - sum_len) * $FpScale) div (n_docs * max_len)"))
      .orderBy(col("band"), col("batch_idx"))
  }

  private val q125Sql = {
    val draw = hash60Sql(s"'$PackSeed' || CAST(doc_id AS VARCHAR)")
    s"""WITH t AS (
      |  SELECT doc_id, len(regexp_extract_all(lower(text), '$TokenPattern'))
      |           AS n_toks
      |  FROM documents),
      |r AS (
      |  SELECT doc_id, n_toks, n_toks // $BandWidth AS band,
      |    row_number() OVER (PARTITION BY n_toks // $BandWidth
      |      ORDER BY $draw, doc_id) AS rk
      |  FROM t),
      |b AS (
      |  SELECT band, (rk - 1) // $BatchDocs AS batch_idx,
      |    count(*) AS n_docs, max(n_toks) AS max_len, sum(n_toks) AS sum_len
      |  FROM r GROUP BY band, (rk - 1) // $BatchDocs)
      |SELECT CAST(band AS BIGINT) AS band, CAST(batch_idx AS BIGINT) AS batch_idx,
      |  CAST(n_docs AS BIGINT) AS n_docs, CAST(max_len AS BIGINT) AS max_len,
      |  CAST(sum_len AS BIGINT) AS sum_len,
      |  CAST(((n_docs * max_len - sum_len) * $FpScale) // (n_docs * max_len)
      |    AS BIGINT) AS pad_fp
      |FROM b
      |ORDER BY band, batch_idx""".stripMargin
  }

  /** Output shard count for q129. */
  val Shards = 8

  // q129 — balanced shard assignment: the training-shard WRITER step.
  // Docs rank by token count descending (rankDistributed — no global
  // sort window) and stripe across shards in serpentine (boustrophedon)
  // order: block b = (rk−1) div S runs left-to-right when even,
  // right-to-left when odd — the classic LPT-approximation trick that
  // bounds per-shard token imbalance by one document per block pair
  // without any driver-side greedy loop (a true first-fit-decreasing
  // packer is inherently sequential; serpentine striping is its
  // order-free approximation and the per-shard totals this query
  // reports make the residual imbalance auditable). Deterministic
  // across runs, engines, and cluster sizes.
  private def q129(s: SparkSession, d: String): DataFrame =
    shardAssignOf(documents(s, d))

  /** The q129 assignment over any (doc_id, text) frame — public for
    * fixture specs (serpentine direction flip, balance bound).
    */
  def shardAssignOf(docs: DataFrame): DataFrame = {
    val sized = docs.select(col("doc_id"), tokenCount(col("text")).as("n_toks"))
    Sampling.rankDistributed(sized, Seq.empty,
        Seq(col("n_toks").desc, col("doc_id")))
      .withColumn("pos", expr(s"(rk - 1L) % $Shards"))
      .withColumn("shard", expr(
        s"CASE WHEN ((rk - 1L) div $Shards) % 2 = 0 THEN pos ELSE ${Shards - 1} - pos END"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("sum_toks"))
      .orderBy(col("shard"))
  }

  private val q129Sql =
    s"""WITH t AS (
      |  SELECT doc_id, len(regexp_extract_all(lower(text), '$TokenPattern'))
      |           AS n_toks
      |  FROM documents),
      |r AS (
      |  SELECT doc_id, n_toks,
      |    row_number() OVER (ORDER BY n_toks DESC, doc_id) AS rk
      |  FROM t),
      |a AS (
      |  SELECT n_toks,
      |    CASE WHEN ((rk - 1) // $Shards) % 2 = 0 THEN (rk - 1) % $Shards
      |         ELSE ${Shards - 1} - (rk - 1) % $Shards END AS shard
      |  FROM r)
      |SELECT CAST(shard AS BIGINT) AS shard, count(*) AS n_docs,
      |  CAST(sum(n_toks) AS BIGINT) AS sum_toks
      |FROM a GROUP BY shard
      |ORDER BY shard""".stripMargin

  // q142 — shard MANIFEST: the dataset-publishing record a training
  // run checks before reading a shard. Extends q129's serpentine
  // assignment with, per shard, the doc_id range and an ORDER-INVARIANT
  // content checksum — the sum of per-document 60-bit content hashes
  // mod 2^60, accumulated in DECIMAL(38,0) so it is exact at any shard
  // size (an int64 sum would wrap engine-dependently after ~8k docs;
  // DuckDB's sum(BIGINT) promotes to HUGEINT, so the decimal form is
  // what makes the checksum portable). Order-invariance means any
  // executor can verify a shard without knowing the write order —
  // a shard re-written by a different cluster layout still matches.
  // One scan, the rank's range-exchange, one aggregation.
  val ChecksumMod = 1152921504606846976L // 2^60

  /** Core: per-shard manifest rows over any (doc_id, text) frame. */
  def shardManifestOf(docs: DataFrame): DataFrame = {
    val sized = docs.select(col("doc_id"), tokenCount(col("text")).as("n_toks"),
      hash60(col("text")).as("h"))
    Sampling.rankDistributed(sized, Seq.empty,
        Seq(col("n_toks").desc, col("doc_id")))
      .withColumn("pos", expr(s"(rk - 1L) % $Shards"))
      .withColumn("shard", expr(
        s"CASE WHEN ((rk - 1L) div $Shards) % 2 = 0 THEN pos ELSE ${Shards - 1} - pos END"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("sum_toks"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"),
        expr(s"CAST(sum(CAST(h AS DECIMAL(38,0))) % $ChecksumMod AS BIGINT)")
          .as("checksum"))
      .orderBy(col("shard"))
  }

  private def q142(s: SparkSession, d: String): DataFrame =
    shardManifestOf(documents(s, d))

  private val q142Sql =
    s"""WITH t AS (
      |  SELECT doc_id, len(regexp_extract_all(lower(text), '$TokenPattern'))
      |           AS n_toks,
      |    ${graft.functions.TextFns.hash60Sql("text")} AS h
      |  FROM documents),
      |r AS (
      |  SELECT doc_id, n_toks, h,
      |    row_number() OVER (ORDER BY n_toks DESC, doc_id) AS rk
      |  FROM t),
      |a AS (
      |  SELECT doc_id, n_toks, h,
      |    CASE WHEN ((rk - 1) // $Shards) % 2 = 0 THEN (rk - 1) % $Shards
      |         ELSE ${Shards - 1} - (rk - 1) % $Shards END AS shard
      |  FROM r)
      |SELECT CAST(shard AS BIGINT) AS shard, count(*) AS n_docs,
      |  CAST(sum(n_toks) AS BIGINT) AS sum_toks,
      |  min(doc_id) AS min_doc, max(doc_id) AS max_doc,
      |  CAST(sum(h) % $ChecksumMod AS BIGINT) AS checksum
      |FROM a GROUP BY shard
      |ORDER BY shard""".stripMargin

  // q242 — prefix-cache reuse audit: for prefix lengths k ∈
  // [[PcPrefixLens]], how many documents share their first k tokens
  // with an earlier one? Shared prefixes are exactly what an
  // LLM-serving KV-cache (or a trie-based tokenizer cache) can reuse,
  // so `n_docs − distinct prefixes` is the corpus's cache-hit UPPER
  // BOUND at that depth, and the largest prefix group bounds the
  // single-entry payoff. One tokenize; each k contributes a (k, hash)
  // row per long-enough doc — the aggregate is (k × prefixes)-sized,
  // never corpus-quadratic, and the two-level (count per prefix →
  // stats per k) rollup is map-side combinable all the way.
  val PcPrefixLens = Seq(4, 8, 16)

  /** Core: prefix-cache report over a (doc_id, toks) frame.
    * Fixture-testable.
    */
  private[graft] def prefixCacheOf(toks0: DataFrame): DataFrame = {
    val toks = toks0.select(col("doc_id"), size(col("toks")).as("n"), col("toks"))
    val rows = toks.select(explode(array(PcPrefixLens.map { k =>
      when(col("n") >= k,
        struct(lit(k.toLong).as("k"),
          hash60(concat_ws(" ", slice(col("toks"), 1, k))).as("h")))
    }: _*)).as("r"))
      .filter(col("r").isNotNull)
      .select(col("r.k").as("k"), col("r.h").as("h"))
    rows.groupBy(col("k"), col("h")).agg(count(lit(1)).as("c"))
      .groupBy(col("k"))
      .agg(sum(col("c")).as("n_docs"), count(lit(1)).as("n_prefixes"),
        max(col("c")).as("max_share"))
      .select(col("k"), col("n_docs"), col("n_prefixes"),
        (col("n_docs") - col("n_prefixes")).as("n_hits"),
        expr("(n_docs - n_prefixes) * 1048576 DIV n_docs").as("hit_fp"),
        col("max_share"))
      .orderBy(col("k"))
  }

  private def q242(s: SparkSession, d: String): DataFrame =
    prefixCacheOf(documents(s, d).select(col("doc_id"), tokens(col("text")).as("toks")))

  private val q242Sql = {
    val branches = PcPrefixLens.map { k =>
      s"""SELECT CAST($k AS BIGINT) AS k,
        |  ${graft.functions.TextFns.hash60Sql(
             s"list_aggregate(list_slice(toks, 1, $k), 'string_agg', ' ')")} AS h
        |FROM t WHERE len(toks) >= $k""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH t AS (
      |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
      |  FROM documents),
      |rows_ AS (
      |$branches),
      |pc AS (SELECT k, h, count(*) AS c FROM rows_ GROUP BY k, h)
      |SELECT k, CAST(sum(c) AS BIGINT) AS n_docs, count(*) AS n_prefixes,
      |  CAST(sum(c) - count(*) AS BIGINT) AS n_hits,
      |  CAST((CAST(sum(c) AS BIGINT) - count(*)) * 1048576
      |    // CAST(sum(c) AS BIGINT) AS BIGINT) AS hit_fp,
      |  CAST(max(c) AS BIGINT) AS max_share
      |FROM pc GROUP BY k ORDER BY k""".stripMargin
  }

  // q243 — context-length planner: for candidate training context
  // lengths L ∈ [[CtxLens]], the exact token economics of the corpus —
  // tokens truncated away (docs longer than L), padding waste under
  // naive one-doc-per-row batching, and the bin-packing LOWER bound
  // ⌈kept/L⌉·L − kept that q80/q125-style packing approaches — the
  // table a pretraining config review reads before fixing max_seq_len.
  // One tokenize, a constant ×|L| explode, one aggregate; every number
  // is an exact integer and the ratios are 2^20 fixed point.
  val CtxLens = Seq(16L, 32L, 64L)

  /** Core: context-length economics over an (n) token-count frame.
    * Fixture-testable.
    */
  private[graft] def contextPlannerOf(lens: DataFrame): DataFrame = {
    lens.select(col("n"), explode(typedlit(CtxLens)).as("ctx"))
      .groupBy(col("ctx"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n") > col("ctx"), 1L).otherwise(0L)).as("n_trunc"),
        sum(col("n")).as("tokens_total"),
        sum(greatest(col("n") - col("ctx"), lit(0L))).as("tokens_lost"),
        sum(least(col("n"), col("ctx"))).as("tokens_kept"))
      .select(col("ctx"), col("n_docs"), col("n_trunc"), col("tokens_total"),
        col("tokens_lost"), col("tokens_kept"),
        expr("tokens_lost * 1048576 DIV tokens_total").as("lost_fp"),
        expr("(n_docs * ctx - tokens_kept) * 1048576 DIV (n_docs * ctx)")
          .as("naive_pad_fp"),
        expr("(((tokens_kept + ctx - 1) DIV ctx) * ctx - tokens_kept) * 1048576" +
          " DIV (((tokens_kept + ctx - 1) DIV ctx) * ctx)").as("packed_pad_fp"))
      .orderBy(col("ctx"))
  }

  private def q243(s: SparkSession, d: String): DataFrame =
    contextPlannerOf(documents(s, d).select(tokenCount(col("text")).as("n")))

  private val q243Sql = {
    val ls = CtxLens.mkString(", ")
    s"""WITH n AS (
      |  SELECT CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT)
      |    AS n
      |  FROM documents),
      |x AS (SELECT n, ctx FROM n, unnest([$ls]) t(ctx)),
      |a AS (
      |  SELECT ctx, count(*) AS n_docs,
      |    CAST(sum(CASE WHEN n > ctx THEN 1 ELSE 0 END) AS BIGINT) AS n_trunc,
      |    CAST(sum(n) AS BIGINT) AS tokens_total,
      |    CAST(sum(greatest(n - ctx, 0)) AS BIGINT) AS tokens_lost,
      |    CAST(sum(least(n, ctx)) AS BIGINT) AS tokens_kept
      |  FROM x GROUP BY ctx)
      |SELECT ctx, n_docs, n_trunc, tokens_total, tokens_lost, tokens_kept,
      |  CAST(tokens_lost * 1048576 // tokens_total AS BIGINT) AS lost_fp,
      |  CAST((n_docs * ctx - tokens_kept) * 1048576 // (n_docs * ctx) AS BIGINT)
      |    AS naive_pad_fp,
      |  CAST((((tokens_kept + ctx - 1) // ctx) * ctx - tokens_kept) * 1048576
      |    // (((tokens_kept + ctx - 1) // ctx) * ctx) AS BIGINT) AS packed_pad_fp
      |FROM a ORDER BY ctx""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q("q125_length_batching", q125, Some(q125Sql)),
    Q("q129_shard_balance", q129, Some(q129Sql)),
    Q("q142_shard_manifest", q142, Some(q142Sql)),
    Q("q242_prefix_cache", q242, Some(q242Sql)),
    Q("q243_context_planner", q243, Some(q243Sql)),
  )
}
