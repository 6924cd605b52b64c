package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.{CosineSimilarity, MinHashSig, SimHash60, SortedIntersectCount}

/** Session-extension entry point: makes graft's native expressions
  * available in ANY session via config, no code changes —
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * — the standard deployment path for engine extensions
  * (SparkSessionExtensions; SURVEY.md §7.3). The same registrations are
  * available programmatically through
  * [[graft.functions.GraftFunctions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      exprs => CosineSimilarity(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      exprs => MinHashSig(exprs.head, graft.queries.Dedup.NumHashes)))
    e.injectFunction((
      FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName, "sorted_intersect_count"),
      exprs => SortedIntersectCount(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("simhash60"),
      new ExpressionInfo(classOf[SimHash60].getName, "simhash60"),
      exprs => SimHash60(exprs.head)))
    // whole-operator extension: plans graft.plans.TopKPerKeyNode as
    // partial/final bounded-heap execs (no sort, map-side combine)
    e.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    // optimizer extension: window top-n written the plain DataFrame way
    // rewrites to the operator above automatically
    e.injectOptimizerRule(_ => graft.plans.RankFilterToTopK)
  }
}
