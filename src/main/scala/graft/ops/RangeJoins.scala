package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (time-interval) joins, binned for scale.
  *
  * A naive `a.join(b, key && b.ts between a.ts-w and a.ts)` is a
  * non-equi join → Spark plans BroadcastNestedLoopJoin: O(|a|·|b|) per
  * key and a broadcast of a whole side — unusable at 100 TB. Binning
  * turns it into an EQUI-join: candidates land in time buckets of width
  * `windowMs`; a probe at time t only needs buckets floor(t/w)−1 and
  * floor(t/w) (a half-open window of width w spans at most 2 buckets).
  * The probe side explodes 2×, the join runs as a hash/sort-merge join
  * on (key, bucket), and the exact range predicate refines inside the
  * join condition. Shuffle volume: 2·|probe| + |cand| — linear.
  */
object RangeJoins {

  /** For each probe row, the count of candidate rows with the same key
    * whose `ts` lies in [probe.ts − windowMs, probe.ts).
    *
    * @param probe  columns: key, ts (ms), id (output granularity)
    * @param cand   columns: key, ts (ms)
    * @return one row per probe id: (id, n_preceding)
    */
  def countPreceding(
      probe: DataFrame, cand: DataFrame,
      key: String, ts: String, id: String,
      windowMs: Long): DataFrame = {
    val b = cand
      .withColumn("__bin", expr(s"$ts div ${windowMs}L"))
      .select(col(key).as("__ck"), col(ts).as("__cts"), col("__bin"))
    val p = probe
      .withColumn("__bin",
        explode(array(expr(s"$ts div ${windowMs}L") - 1, expr(s"$ts div ${windowMs}L"))))
    p.join(b,
        p(key) === col("__ck") && p("__bin") === b("__bin") &&
          col("__cts") >= p(ts) - windowMs && col("__cts") < p(ts),
        "left_outer")
      .groupBy(p(id).as(id))
      .agg(count(col("__cts")).as("n_preceding"))
  }
}
