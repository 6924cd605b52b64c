package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec
import graft.functions.TextFns.hash60
import graft.queries.{Maintenance, Sketches}

/** The mergeable-sketch queries are pure aggregates, so Structured
  * Streaming maintains their state incrementally with the SAME code
  * path as batch: these specs pin stream-built sketch state (built
  * across multiple micro-batches, Complete output) bit-equal to the
  * batch aggregate over the union of the batches — the property that
  * lets a 100 TB pipeline keep its distinct-count dashboards and
  * replica-diff sketches live instead of recomputing them per run.
  */
class StreamingSketchSpec extends SparkSpec {
  import spark.implicits._

  test("streaming HLL registers equal the batch registers over all batches") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[Long]
    val stream = Sketches.hllRegistersOf(
      in.toDF().select(lit("g").as("g"), col("value")),
      "g", hash60(col("value").cast("string")))
    val q = stream.writeStream.format("memory").queryName("hllregs")
      .outputMode("complete").trigger(Trigger.AvailableNow())
    in.addData(1L to 300L)
    val h1 = q.start(); h1.awaitTermination()
    in.addData(250L to 700L) // overlap: max-merge must absorb replays
    val h2 = q.start(); h2.awaitTermination()
    val got = spark.table("hllregs").collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    val batch = Sketches.hllRegistersOf(
      (1L to 700L).toDF("value").select(lit("g").as("g"), col("value")),
      "g", hash60(col("value").cast("string")))
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(got == batch)
  }

  test("streaming IBLT cells decode the same diff as the batch sketch") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[(Long, Long)] // (doc_id, sign)
    val cells = Maintenance.ibltCellsOf(in.toDF().toDF("doc_id", "sign"))
    val q = cells.writeStream.format("memory").queryName("ibltcells")
      .outputMode("complete").trigger(Trigger.AvailableNow())
    // replica A arrives first, replica B's deletions stream in later
    in.addData((1L to 200L).map(i => (i, 1L)))
    val h1 = q.start(); h1.awaitTermination()
    in.addData((1L to 200L).filterNot(Set(50L, 99L)).map(i => (i, -1L)) :+ ((901L, -1L)))
    val h2 = q.start(); h2.awaitTermination()
    val decoded = Maintenance.ibltDecode(
      spark.table("ibltcells").collect())
    assert(decoded == Seq(("a_only", 50L), ("a_only", 99L), ("b_only", 901L)),
      s"got $decoded")
  }
}
