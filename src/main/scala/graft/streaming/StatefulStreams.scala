package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.core.{FixedWindowManager, Stamped}

/** Structured Streaming forms of the reference's stateful operators —
  * the incremental-execution side of graft.core. Works identically on
  * batch Datasets (Spark runs flatMapGroupsWithState in batch mode with
  * empty initial state), so one operator body serves both modes — the
  * reference's bounded/unbounded stream split (datastream.go:15-57)
  * collapses into the Dataset abstraction.
  */
object StatefulStreams {

  /** O3 (reference NewStatefulNode, node.go:66-105): keyed stateful
    * flatMap over a (possibly streaming) Dataset. Per-key state is a
    * Spark GroupState — checkpointed, watermark-evictable, RocksDB-
    * backable at scale — instead of the reference's unbounded in-memory
    * per-key node clones (engine.go:239-244).
    */
  def statefulByKey[K, T, S, U](
      ds: Dataset[T], key: T => K, init: S)(
      f: (S, T) => (S, Seq[U]))(
      implicit ek: Encoder[K], es: Encoder[S], eu: Encoder[U]): Dataset[U] =
    ds.groupByKey(key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: K, it: Iterator[T], gs: GroupState[S]) =>
          var s = gs.getOption.getOrElse(init)
          val out = Vector.newBuilder[U]
          it.foreach { v =>
            val (s2, us) = f(s, v)
            s = s2
            out ++= us
          }
          gs.update(s)
          out.result().iterator
      }

  /** O10 streaming parity mode: ssp-exact windowed aggregation via a
    * per-key FixedWindowManager checkpointed in GroupState. Late
    * records re-open windows (never dropped) and windows close on the
    * record-carried watermark — byte-for-byte the reference's golden
    * behavior (engine_test.go:616-744), incrementally.
    */
  def windowedParity[K, T, S](
      ds: Dataset[Stamped[T]], key: T => K, size: Long, slide: Long, init: () => S)(
      add: (S, T) => S)(
      implicit ek: Encoder[K], es: Encoder[(Long, Map[Long, S])],
      eu: Encoder[(K, Long, Long, S)]): Dataset[(K, Long, Long, S)] =
    ds.groupByKey(r => key(r.value))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (k: K, it: Iterator[Stamped[T]], gs: GroupState[(Long, Map[Long, S])]) =>
          val mgr = new FixedWindowManager[S](size, slide, init)
          gs.getOption.foreach { case (wm, snap) => mgr.restore(snap, wm) }
          val sorted = it.toIndexedSeq.sortBy(_.seq)
          val out = Vector.newBuilder[(K, Long, Long, S)]
          sorted.foreach { r =>
            mgr.add(r.ts)(s => add(s, r.value))
            mgr.advance(r.wm).foreach(w => out += ((k, w.start, w.stop, w.state)))
          }
          gs.update((mgr.watermark, mgr.openSnapshot))
          out.result().iterator
      }

  /** Production streaming windows (the non-parity path): Spark-native
    * watermark + sliding window aggregation — the semantics the
    * reference's README *wishes* it had (README.md:27-77): one global
    * watermark, late data dropped deterministically past the delay.
    */
  def slidingCounts(df: DataFrame, tsCol: String, keyCol: String,
      size: String, slide: String, delay: String): DataFrame =
    df.withWatermark(tsCol, delay)
      .groupBy(window(col(tsCol), size, slide), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col(s"window.start").as("win_start"), col(keyCol), col("n"))

  /** Native session windows (gap-based), beyond the reference's fixed
    * windows (SURVEY.md §2.2 notes sessions are absent there). Batch
    * oracle equivalent: graft.queries.EventWindows.q28.
    */
  def sessionCounts(df: DataFrame, tsCol: String, keyCol: String,
      gap: String, delay: String): DataFrame =
    df.withWatermark(tsCol, delay)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start").as("session_start"), col(keyCol), col("n"))

  /** O7 (broadcast fan-out, engine.go:196-211) for streams: one source
    * micro-batch delivered to N sinks via foreachBatch. The batch
    * DataFrame is persisted so the plan is computed once per epoch, not
    * once per sink — the micro-batch-consistent multi-sink pattern.
    */
  def fanOutSinks(df: DataFrame, sinks: Seq[DataFrame => Unit]): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      batch.persist()
      try sinks.foreach(sink => sink(batch))
      finally { batch.unpersist(); () }
    }
}
