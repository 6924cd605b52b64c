package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec
import graft.queries.Privacy

/** Pins the live DP release (streamingDpRelease) bit-equal to the
  * batch q264 release over the union of the micro-batches — the
  * property that makes a continuously-refreshed released dashboard
  * cost ONE ε: cell-keyed noise means each refresh is post-processing
  * of the same single release, never a new draw. The published frame
  * carries released counts ONLY; the noise column exists solely
  * inside dpHistogramOf, where the reuse assertion reads it.
  */
class StreamingDpSpec extends SparkSpec {
  import spark.implicits._

  test("streamed release equals the batch release over all batches") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[(String, String)]
    val rel = StatefulStreams.streamingDpRelease(
      in.toDF().toDF("lang", "source"), Privacy.DpTestSeed)
    assert(!rel.columns.contains("noise")) // the release never leaks it
    val q = rel.writeStream.format("memory").queryName("dprel")
      .outputMode("complete").trigger(Trigger.AvailableNow())
    val b1 = (1 to 40).map(i => (s"l${i % 3}", s"s${i % 4}"))
    val b2 = (1 to 25).map(i => (s"l${i % 4}", s"s${i % 3}"))
    in.addData(b1)
    val h1 = q.start(); h1.awaitTermination()
    val mid = spark.table("dprel").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    in.addData(b2)
    val h2 = q.start(); h2.awaitTermination()
    val got = spark.table("dprel").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val batch = Privacy.dpRelease((b1 ++ b2).toDF("lang", "source"), Privacy.DpTestSeed)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == batch, s"got $got want $batch")
    // refreshes reuse the cell's noise — post-processing, not a redraw:
    // the internal noise of every cell is identical across the two
    // release snapshots (read via the internal frame, never published)
    def noiseOf(rows: Seq[(String, String)]) =
      Privacy.dpHistogramOf(rows.toDF("lang", "source"), Privacy.DpTestSeed).collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap
    val n1 = noiseOf(b1); val n2 = noiseOf(b1 ++ b2)
    val common = n1.keySet intersect n2.keySet
    assert(common.nonEmpty && common.forall(k => n1(k) == n2(k)))
    assert(mid.keySet.subsetOf(got.keySet))
  }
}
