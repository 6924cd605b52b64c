package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec
import graft.queries.Privacy

/** Pins the live DP release (streamingDpRelease) bit-equal to the
  * batch q264 release over the union of the micro-batches — the
  * property that makes a continuously-refreshed released dashboard
  * cost ONE ε: cell-keyed noise means each refresh is post-processing
  * of the same single release, never a new draw.
  */
class StreamingDpSpec extends SparkSpec {
  import spark.implicits._

  test("streamed release equals the batch release over all batches") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[(String, String)]
    val rel = StatefulStreams.streamingDpRelease(
      in.toDF().toDF("lang", "source"))
    val q = rel.writeStream.format("memory").queryName("dprel")
      .outputMode("complete").trigger(Trigger.AvailableNow())
    val b1 = (1 to 40).map(i => (s"l${i % 3}", s"s${i % 4}"))
    val b2 = (1 to 25).map(i => (s"l${i % 4}", s"s${i % 3}"))
    in.addData(b1)
    val h1 = q.start(); h1.awaitTermination()
    val mid = spark.table("dprel").collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    in.addData(b2)
    val h2 = q.start(); h2.awaitTermination()
    val got = spark.table("dprel").collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val batch = Privacy.dpHistogramOf((b1 ++ b2).toDF("lang", "source"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got == batch, s"got $got want $batch")
    // refreshes reuse the cell's noise — post-processing, not a redraw
    val common = mid.keySet intersect got.keySet
    assert(common.nonEmpty &&
      common.forall(k => mid(k)._2 == got(k)._2))
  }
}
