package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is registered here as a
  * named query over the driver testdata, with (where SQL-expressible) an
  * equivalent DuckDB oracle statement.
  */
object SparkEntry {

  /** All registered query packs. */
  def packs: Seq[Q] =
    Relational.all ++ EventWindows.all ++ TextAnalysis.all ++ Dedup.all ++ Similarity.all ++
      Contamination.all ++ Sampling.all ++ Corpus.all ++ Sketches.all ++ Retrieval.all ++
      Extras.all ++ Extras2.all ++ Pipeline.all ++ ProductQuant.all ++ Filtering.all ++
      Graph.all ++ Cleanup.all ++ Fluency.all ++ Batching.all ++ IndexHealth.all ++
      Layout.all ++ Frontier.all ++ Expectations.all ++ Signals.all ++ Privacy.all ++
      Matching.all ++ Maintenance.all ++ Ranking.all ++ Classifier.all ++ Sequential.all ++ Linkage.all ++ Causal.all ++
      Mixture.all ++ Splits.all ++ Statistics.all ++
      Seq(Q("q70_media_features", graft.multimodal.Multimodal.mediaFeaturesQuery,
          Some(graft.multimodal.Multimodal.q70Sql)),
        Q("q71_frame_samples", graft.multimodal.Multimodal.frameSamplesQuery,
          Some(graft.multimodal.Multimodal.q71Sql)),
        Q("q127_media_neardup", graft.multimodal.Multimodal.mediaNearDupQuery,
          Some(graft.multimodal.Multimodal.q127Sql)),
        Q("q209_audio_segments", graft.multimodal.Multimodal.audioSegmentsQuery,
          Some(graft.multimodal.Multimodal.q209Sql)),
        Q("q284_pair_integrity", graft.multimodal.Multimodal.pairIntegrityQuery,
          Some(graft.multimodal.Multimodal.q284Sql)),
        Q("q72_topk_native", graft.plans.TopK.q72, Some(graft.plans.TopK.q72Sql)),
        Q("q76_topk_sql", graft.plans.TopK.q76, Some(graft.plans.TopK.q72Sql)))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q05_star_join")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.collect { case Q(n, _, Some(sql)) => n -> sql }.toMap
}
