package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec
import graft.queries.TextAnalysis

/** Pins the stateless streaming encode (TextAnalysis.encodeStream) —
  * arrivals tokenized under the frozen offline artifact — bit-equal to
  * batch q283's per-doc digests over the same corpus, across
  * micro-batch splits, plus the UNK contract for symbols outside the
  * frozen inventory.
  */
class EncodeStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streamed encode equals batch q283 digests over the same artifact") {
    implicit val sql = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, sf)
      .select($"doc_id", $"text")
    val (merges, symIds) = TextAnalysis.tokenizerArtifact(docs)
    val rows = docs.as[(Long, String)].collect().toSeq
    val in = MemoryStream[(Long, String)]
    val out = TextAnalysis.encodeStream(
      in.toDF().toDF("doc_id", "text"), merges, symIds)
    val q = out.writeStream.format("memory").queryName("encstream")
      .outputMode("append").trigger(Trigger.AvailableNow())
    // two uneven micro-batches, split mid-corpus
    val (b1, b2) = rows.splitAt(rows.size / 3)
    in.addData(b1); val h1 = q.start(); h1.awaitTermination()
    in.addData(b2); val h2 = q.start(); h2.awaitTermination()
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    val streamed = spark.table("encstream").collect().map(key).toSet
    val batch = graft.SparkEntry.queries("q283_bpe_encode")(spark, sf)
      .collect().map(key).toSet
    assert(streamed == batch,
      s"stream!=batch: only-stream=${(streamed -- batch).take(3)}, " +
        s"only-batch=${(batch -- streamed).take(3)}")
  }

  test("scalable mapPartitions path is bit-equal to the expression path " +
      "under the streaming planner") {
    implicit val sql = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, sf)
      .select($"doc_id", $"text")
    val (merges, symIds) = TextAnalysis.tokenizerArtifact(docs)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    val viaExpr = TextAnalysis.encodeStream(docs, merges, symIds)
      .collect().map(key).toSet
    val in = MemoryStream[(Long, String)]
    val out = TextAnalysis.encodeStreamScalable(
      in.toDF().toDF("doc_id", "text"), merges, symIds)
    val q = out.writeStream.format("memory").queryName("encscalable")
      .outputMode("append").trigger(Trigger.AvailableNow())
    in.addData(docs.as[(Long, String)].collect().toSeq)
    val h = q.start(); h.awaitTermination()
    val viaTable = spark.table("encscalable").collect().map(key).toSet
    assert(viaTable == viaExpr,
      s"scalable!=expr: only-scalable=${(viaTable -- viaExpr).take(3)}, " +
        s"only-expr=${(viaExpr -- viaTable).take(3)}")
  }

  test("unknown symbols map to UNK id 0, known arrivals are unaffected") {
    implicit val sql = spark.sqlContext
    // artifact frozen on a corpus that never saw the digit '7'
    val train = Seq((1L, "alpha beta alpha"), (2L, "beta gamma"))
      .toDF("doc_id", "text")
    val (merges, symIds) = TextAnalysis.tokenizerArtifact(train, rounds = 2)
    assert(!symIds.contains("7") && symIds.values.forall(_ >= 1L))
    val got = TextAnalysis.encodeStream(
      Seq((10L, "alpha 777"), (11L, "beta")).toDF("doc_id", "text"),
      merges, symIds)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // "777" contributes three UNK symbols + </w>; n_unique counts UNK
    // once — the serving contract: unseen characters degrade loudly
    // (id 0 in the stream) instead of dropping rows
    val (w10, t10, u10) = got(10L)
    assert(w10 == 2L)
    assert(t10 >= 4L)
    val (w11, _, _) = got(11L)
    assert(w11 == 1L)
  }
}
