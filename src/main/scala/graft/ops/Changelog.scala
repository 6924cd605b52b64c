package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Changelog materialization — the streaming↔table duality operator:
  * collapse a keyed change stream (upserts + tombstones) to the
  * current-state table it describes. This is Flink's upsert
  * materialization / a Delta MERGE's apply step, expressed as one
  * declarative aggregation.
  *
  * Scale shape: ONE hash aggregation on the key — `max_by` keeps the
  * lexicographically-latest (seq, payload) per key with map-side
  * partial aggregation, so a billion-row changelog reduces to one
  * shuffle of per-key partials, never a per-key sort window (the
  * row_number form serializes each hot key's history through one
  * task; the agg form combines early). Tombstones are filtered AFTER
  * the latest-wins pick, so a delete correctly erases a key even when
  * older upserts precede it.
  */
object Changelog {

  /** Collapse `changelog` to current state: for each key, keep the
    * payload of the row with the greatest `seq` (a struct column —
    * lexicographic, so pass e.g. struct(ts, id) for total order), then
    * drop rows whose latest change satisfies `isDelete`.
    *
    * @param payload  (name, column) pairs to carry into the state row
    */
  def apply(
      changelog: DataFrame,
      keys: Seq[String],
      seq: Column,
      payload: Seq[(String, Column)],
      isDelete: Column => Column): DataFrame = {
    val keyCols = keys.map(col)
    val last = changelog
      .groupBy(keyCols: _*)
      .agg(
        max_by(struct(payload.map { case (n, c) => c.as(n) }: _*), seq).as("__last"),
        count(lit(1)).as("n_changes"))
    val named = payload.map { case (n, _) => col(s"__last.$n").as(n) }
    last
      .filter(!isDelete(col("__last")))
      .select((keyCols ++ named :+ col("n_changes")): _*)
  }
}
