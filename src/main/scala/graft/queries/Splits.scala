package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.TextFns._

/** Leakage-safe train/val/test split assignment: hash every document's
  * NEAR-DUP CLUSTER id (q35's connected components over the MinHash-LSH
  * candidate pairs; singletons are their own cluster) into the split
  * buckets, so near-duplicate documents can never straddle a split
  * boundary — the dedup-across-splits hygiene Lee et al. 2021
  * ("Deduplicating Training Data Makes Language Models Better") showed
  * real corpora fail at: duplicated text leaking from train into eval
  * inflates benchmark scores.
  *
  * Completes the split family: q89 is the naive per-doc_id hash
  * assignment and q114 DETECTS the n-gram leakage it causes after the
  * fact — q279 PREVENTS the near-dup class of that leakage
  * structurally, by keying the hash on the cluster instead of the doc.
  * The query is its own audit: for every LSH candidate pair it counts
  * how many pairs CROSS splits under the naive per-doc_id hash versus
  * under the cluster-keyed assignment — the safe column is zero BY
  * CONSTRUCTION (both endpoints share a cluster, hence a split), and
  * the oracle proves it rather than asserting it.
  *
  * The bucketing IS q89's (same seed, same 100-bucket 80/10/10
  * thresholds) so the naive column audits the exact assignment the
  * registered pipeline runs, not a lookalike; the safe column feeds
  * the same seeded hash the cluster id instead of the doc id. Both are
  * deterministic, engine-independent, and stable under corpus growth:
  * a document's split never changes when unrelated documents arrive —
  * unless dedup MERGES its cluster, which is exactly the case where
  * moving it is the point. The report always carries all three split
  * rows (a static spine, zeros where a split is empty), and each cross
  * count is attributed to doc_a's split UNDER ITS OWN assignment —
  * naive crossings to doc_a's naive split, safe to doc_a's safe split
  * — so no count can land on (or vanish from) a row keyed by the other
  * scheme.
  *
  * Scale shape: the component frame holds only docs appearing in a
  * candidate pair (tiny at real dup rates); the corpus contributes one
  * scan for signatures (shared LSH front half) and one thin
  * (doc_id, n_chars) projection; the audit joins are keyed by doc_id
  * on the pair list (pair-sized, not corpus-sized, on the probe side).
  * Nothing here is quadratic and no text ever shuffles.
  */
object Splits {

  /** Split of a key — q89's bucketing verbatim (same seed, same
    * 100-bucket 80/10/10 thresholds), so feeding it doc_id reproduces
    * the registered q89 assignment bit-for-bit.
    */
  private[queries] def splitOf(key: Column): Column = {
    val b = pmod(hash60(concat(lit(Sampling.SplitSeed), key.cast("string"))),
      lit(100L))
    when(b < 80, "train").when(b < 90, "val").otherwise("test")
  }

  private[queries] def splitSql(key: String): String = {
    val b = s"${hash60Sql(s"'${Sampling.SplitSeed}' || CAST($key AS VARCHAR)")} % 100"
    s"CASE WHEN $b < 80 THEN 'train' WHEN $b < 90 THEN 'val' ELSE 'test' END"
  }

  private def q279(s: SparkSession, d: String): DataFrame =
    splitReportOf(documents(s, d), Dedup.candidatePairs(s, d))

  /** The q279 plan over any (doc_id, n_chars) frame and its candidate
    * pair list — public so specs can plant duplicate families that the
    * naive assignment demonstrably splits.
    */
  def splitReportOf(docs: DataFrame, pairs: DataFrame): DataFrame = {
    // the pair list feeds both the component pass and the audit join —
    // pin it so the LSH front half (the expensive part) runs once
    val p = pairs.select(col("doc_a"), col("doc_b")).localCheckpoint()
    val comp = graft.ops.ConnectedComponents
      .minLabel(p.select(col("doc_a").as("a"), col("doc_b").as("b")))
      .select(col("id").as("doc_id"), col("comp"))
    // consumed three times (per-split agg + both audit sides): pin the
    // thin (id, chars, cluster, 2 split tags) projection too
    val asg = docs.select(col("doc_id"), col("n_chars"))
      .join(comp, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chars"),
        coalesce(col("comp"), col("doc_id")).as("cluster_id"))
      .withColumn("safe_split", splitOf(col("cluster_id")))
      .withColumn("naive_split", splitOf(col("doc_id")))
      .localCheckpoint()
    val per = asg.groupBy(col("safe_split").as("split"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("cluster_id")).as("n_clusters"),
        sum(col("n_chars")).as("n_chars"))
    val px = p
      .join(asg.select(col("doc_id").as("doc_a"),
        col("safe_split").as("sa"), col("naive_split").as("na")), "doc_a")
      .join(asg.select(col("doc_id").as("doc_b"),
        col("safe_split").as("sb"), col("naive_split").as("nb")), "doc_b")
    val ncross = px.filter(col("na") =!= col("nb"))
      .groupBy(col("na").as("split")).agg(count(lit(1)).as("ncp"))
    val scross = px.filter(col("sa") =!= col("sb"))
      .groupBy(col("sa").as("split")).agg(count(lit(1)).as("scp"))
    // static 3-row spine: every split row always present, so a cross
    // count keyed by a split no document's SAFE assignment takes (the
    // counts are keyed by doc_a's own scheme) can never be dropped
    val sp = docs.sparkSession
    import sp.implicits._
    val spine = Seq("train", "val", "test").toDF("split")
    spine.join(broadcast(per), Seq("split"), "left")
      .join(broadcast(ncross), Seq("split"), "left")
      .join(broadcast(scross), Seq("split"), "left")
      .select(col("split"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("n_clusters"), lit(0L)).as("n_clusters"),
        coalesce(col("n_chars"), lit(0L)).as("n_chars"),
        coalesce(col("ncp"), lit(0L)).as("naive_cross_pairs"),
        coalesce(col("scp"), lit(0L)).as("safe_cross_pairs"))
      .orderBy(col("split"))
  }

  private val q279Sql =
    s"""WITH RECURSIVE ${Dedup.pairsCteSql},
      |pairs_m AS MATERIALIZED (SELECT doc_a, doc_b FROM pairs),
      |undirected(a, b) AS MATERIALIZED (
      |  SELECT doc_a, doc_b FROM pairs_m UNION SELECT doc_b, doc_a FROM pairs_m
      |  UNION SELECT doc_a, doc_a FROM pairs_m UNION SELECT doc_b, doc_b FROM pairs_m),
      |reach(a, b) AS (
      |  SELECT a, b FROM undirected
      |  UNION
      |  SELECT r.a, u.b FROM reach r JOIN undirected u ON r.b = u.a),
      |comp AS MATERIALIZED (
      |  SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a),
      |asg AS MATERIALIZED (
      |  SELECT d.doc_id, d.n_chars,
      |    coalesce(c.cluster_id, d.doc_id) AS cluster_id,
      |    ${splitSql("coalesce(c.cluster_id, d.doc_id)")} AS safe_split,
      |    ${splitSql("d.doc_id")} AS naive_split
      |  FROM documents d LEFT JOIN comp c USING (doc_id)),
      |per AS (
      |  SELECT safe_split AS split, count(*) AS n_docs,
      |    count(DISTINCT cluster_id) AS n_clusters, sum(n_chars) AS n_chars
      |  FROM asg GROUP BY 1),
      |px AS MATERIALIZED (
      |  SELECT a1.safe_split AS sa, a2.safe_split AS sb,
      |    a1.naive_split AS na, a2.naive_split AS nb
      |  FROM pairs_m p
      |  JOIN asg a1 ON p.doc_a = a1.doc_id
      |  JOIN asg a2 ON p.doc_b = a2.doc_id),
      |ncross AS (SELECT na AS split, count(*) AS ncp FROM px WHERE na <> nb GROUP BY 1),
      |scross AS (SELECT sa AS split, count(*) AS scp FROM px WHERE sa <> sb GROUP BY 1),
      |spine(split) AS (SELECT * FROM (VALUES ('train'), ('val'), ('test')) s(sp))
      |SELECT split, CAST(coalesce(n_docs, 0) AS BIGINT) AS n_docs,
      |  CAST(coalesce(n_clusters, 0) AS BIGINT) AS n_clusters,
      |  CAST(coalesce(n_chars, 0) AS BIGINT) AS n_chars,
      |  CAST(coalesce(ncp, 0) AS BIGINT) AS naive_cross_pairs,
      |  CAST(coalesce(scp, 0) AS BIGINT) AS safe_cross_pairs
      |FROM spine LEFT JOIN per USING (split)
      |  LEFT JOIN ncross USING (split) LEFT JOIN scross USING (split)
      |ORDER BY split""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q279_leakage_safe_split", q279, Some(q279Sql)),
  )
}
