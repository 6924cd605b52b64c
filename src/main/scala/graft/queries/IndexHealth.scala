package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.TextFns._

/** Bucket-skew report across the engine's hash-bucketed index
  * structures — the operational dashboard that predicts whether a
  * 100 TB run will hot-spot BEFORE it runs: every LSH/feature-hash
  * structure in the engine degrades the same way (one degenerate
  * bucket goes quadratic, or one feature bucket swallows the
  * distribution), and the mitigation knobs (triangle split thresholds,
  * band counts, bucket counts) are sized from exactly these numbers.
  * Covers four structures, each through the SAME builder the
  * production operator uses — the report audits the real index frames,
  * not a reimplementation:
  *
  *   - `minhash_bands` — q32's banded signature buckets
  *     (Dedup.bandedSignatures);
  *   - `winnow_fps` — q86's sampled rolling-hash fingerprint buckets
  *     (Dedup.substringFingerprints);
  *   - `dsir_feats` — q115/q131's hashed-bigram feature buckets;
  *   - `phash_bands` — q127's perceptual-hash band buckets.
  *
  * Per structure: bucket count, item count, the largest bucket, and
  * the largest bucket's share of all items in 2^20 fixed point (the
  * skew alarm). Scale shape: each structure contributes one
  * bucket-keyed aggregate (map-side combined) followed by a 1-row
  * stats aggregate; the union is 4 rows.
  */
object IndexHealth {

  val FpScale = 1048576L // 2^20

  private def statsOf(buckets: DataFrame, name: String): DataFrame =
    buckets.groupBy(col("bucket")).agg(count(lit(1)).as("c"))
      .agg(count(lit(1)).as("n_buckets"),
        sum(col("c")).as("n_items"),
        max(col("c")).as("max_bucket"))
      .select(lit(name).as("structure"), col("n_buckets"), col("n_items"),
        col("max_bucket"),
        expr(s"(max_bucket * $FpScale) div n_items").as("top_share_fp"))

  private def q132(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val minhash = Dedup.bandedSignatures(docs)
      .select(concat_ws("|", col("band"), col("bkey")).as("bucket"))
    val winnow = Dedup.substringFingerprints(docs)
      .select(col("h").cast("string").as("bucket"))
    val dsir = docs
      .select(col("doc_id"), array_distinct(call_function("ngram_hash60",
        tokens(col("text")), lit(2), lit(Sampling.DsirBuckets))).as("fs"))
      .repartition(col("doc_id"))
      .select(explode(col("fs")).as("f"))
      .select(col("f").cast("string").as("bucket"))
    val phash = graft.multimodal.Multimodal.perceptualHashes(
        graft.multimodal.Multimodal.mediaFromDocuments(s, d))
      .toDF("media_id", "phash")
      .select(col("phash"), explode(sequence(lit(0), lit(3))).as("b"))
      .select(concat_ws("|", col("b"),
        expr("shiftright(phash, b * 15) & 32767")).as("bucket"))
    statsOf(minhash, "minhash_bands")
      .unionByName(statsOf(winnow, "winnow_fps"))
      .unionByName(statsOf(dsir, "dsir_feats"))
      .unionByName(statsOf(phash, "phash_bands"))
      .orderBy(col("structure"))
  }

  private val q132Sql = {
    def byteAt(i: String): String =
      s"((strpos('0123456789ABCDEF', substr(hx, 2*($i)+1, 1)) - 1) * 16" +
        s" + strpos('0123456789ABCDEF', substr(hx, 2*($i)+2, 1)) - 1)"
    def stats(src: String, name: String) =
      s"""SELECT '$name' AS structure, count(*) AS n_buckets,
         |  CAST(sum(c) AS BIGINT) AS n_items,
         |  CAST(max(c) AS BIGINT) AS max_bucket,
         |  CAST((max(c) * $FpScale) // sum(c) AS BIGINT) AS top_share_fp
         |FROM (SELECT bucket, count(*) AS c FROM $src GROUP BY bucket) ${name}_b"""
        .stripMargin
    s"""WITH ${Dedup.pairsCteSql},
      |${Dedup.winnowPairsCteSql},
      |mh AS (SELECT band || '|' || bkey AS bucket FROM banded),
      |wf AS (SELECT CAST(h AS VARCHAR) AS bucket FROM wfp),
      |df AS (
      |  SELECT CAST(unnest(list_distinct(list_transform(
      |    range(greatest(len(t) - 1, 0)),
      |    i -> ${hash60Sql("t[i+1] || ' ' || t[i+2]")} % ${Sampling.DsirBuckets})))
      |    AS VARCHAR) AS bucket
      |  FROM (SELECT regexp_extract_all(lower(text), '$TokenPattern') AS t
      |        FROM documents) dd),
      |pm AS (
      |  SELECT doc_id AS media_id, hex(encode(text)) AS hx,
      |    octet_length(encode(text)) AS len
      |  FROM documents),
      |pb AS (
      |  SELECT media_id, (60*j)//len AS blk, ${byteAt("j")} AS v
      |  FROM (SELECT media_id, hx, len, unnest(range(len)) AS j FROM pm)),
      |pbs AS (
      |  SELECT media_id, blk, sum(v) AS s,
      |    sum(sum(v)) OVER (PARTITION BY media_id) AS total
      |  FROM pb GROUP BY media_id, blk),
      |ph2 AS (
      |  SELECT media_id,
      |    sum(CASE WHEN s > total//60 THEN 1::BIGINT << blk ELSE 0 END) AS phash
      |  FROM pbs GROUP BY media_id),
      |pf AS (
      |  SELECT b || '|' || ((phash >> (b * 15)) & 32767) AS bucket
      |  FROM ph2, (SELECT unnest(range(4)) AS b) bb)
      |${stats("mh", "minhash_bands")}
      |UNION ALL ${stats("wf", "winnow_fps")}
      |UNION ALL ${stats("df", "dsir_feats")}
      |UNION ALL ${stats("pf", "phash_bands")}
      |ORDER BY structure""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q("q132_index_health", q132, Some(q132Sql)),
  )
}
