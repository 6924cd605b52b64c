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

  test("streaming q-digest leaf counts compress to the batch digest") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[Long]
    val leaves = Sketches.qdLeafCounts(in.toDF().select(col("value").as("v")))
    val q = leaves.writeStream.format("memory").queryName("qdleaves")
      .outputMode("complete").trigger(Trigger.AvailableNow())
    val vals = (1L to 500L).map(i => (i * i) % 4096)
    in.addData(vals.take(200))
    val h1 = q.start(); h1.awaitTermination()
    in.addData(vals.drop(200))
    val h2 = q.start(); h2.awaitTermination()
    val thr = math.max(vals.length / Sketches.QdK, 1L)
    val streamDigest = Sketches.qdigestOf(spark.table("qdleaves"), thr)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batchDigest = Sketches.qdigestOf(
      Sketches.qdLeafCounts(vals.toDF("v")), thr)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamDigest == batchDigest && streamDigest.nonEmpty)
  }

  test("streaming AMS cells equal the batch sketch over all batches") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[Long]
    val cells = Sketches.amsCellsOf(in.toDF().select(col("value").as("user_id")))
    val q = cells.writeStream.format("memory").queryName("amscells")
      .outputMode("complete").trigger(Trigger.AvailableNow())
    val users = (1L to 600L).map(i => i % 37)
    in.addData(users.take(250))
    val h1 = q.start(); h1.awaitTermination()
    in.addData(users.drop(250))
    val h2 = q.start(); h2.awaitTermination()
    val got = spark.table("amscells").collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val batch = Sketches.amsCellsOf(users.toDF("user_id"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == batch && got.values.exists(_ != 0L))
  }
}
