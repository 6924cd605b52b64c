package graft.queries

import graft.SparkSpec

/** Pins the streaming fluency gate to its batch contract: scores match
  * q122 exactly when the stream's documents are the fit corpus, and
  * sub-bigram documents are dropped in both forms.
  */
class FluencyStreamSpec extends SparkSpec {
  import spark.implicits._

  private val fixture = Seq(
    (0L, "en", "spark table spark table spark table spark table spark"),
    (1L, "zz", "qqq www qqq www qqq www"),
    (2L, "en", "single"), // 1 token -> no bigrams -> dropped
    (3L, "fr", "table spark table spark"))

  test("streaming gate matches batch q122 when fit on the same corpus") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    val static = fixture.toDF("doc_id", "lang", "text")
    val batch = Fluency.fluencyOf(static).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(!batch.exists(_._1 == 2L), "sub-bigram doc must not appear in batch")
    val in = MemoryStream[(Long, String, String)]
    val out = Fluency.fluencyStream(
      in.toDF().toDF("doc_id", "lang", "text"), static)
    val q = out.writeStream.format("memory").queryName("fluency_stream")
      .outputMode("append").start()
    try {
      in.addData(fixture)
      q.processAllAvailable()
      val got = spark.table("fluency_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(got == batch, s"stream $got != batch $batch")
    } finally q.stop()
  }
}
