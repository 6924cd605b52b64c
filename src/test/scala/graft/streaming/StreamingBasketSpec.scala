package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

/** Pins the on-arrival basket pair generator to batch q220 semantics:
  * per-order unordered pairs emitted exactly once, across arbitrary
  * micro-batch splits, with duplicate part arrivals ignored.
  */
class StreamingBasketSpec extends SparkSpec {
  import spark.implicits._

  test("streaming basket pairs equal the batch distinct pair multiset") {
    implicit val sql = spark.sqlContext
    // order 1 split across three batches (incl. a duplicate part 10);
    // order 2 entirely in one batch; order 3 a singleton (no pairs)
    val rows = Seq(
      (1L, 10L), (1L, 20L),
      // --- split ---
      (1L, 30L), (2L, 5L), (2L, 7L), (2L, 9L),
      // --- split ---
      (1L, 10L) /* dup, ignored */, (1L, 40L), (3L, 99L))
    val expect = rows.distinct.groupBy(_._1).values.flatMap { ps =>
      val parts = ps.map(_._2).distinct
      for (a <- parts; b <- parts if a < b) yield (a, b)
    }.toSeq.sorted

    val in = MemoryStream[(Long, Long)]
    val out = StatefulStreams
      .streamingBasketPairs(in.toDF().toDF("l_orderkey", "l_partkey"))
      .toDF("p1", "p2")
    val q = out.writeStream.format("memory").queryName("sbask")
      .outputMode("append").start()
    try {
      in.addData(rows.take(2)); q.processAllAvailable()
      in.addData(rows.slice(2, 6)); q.processAllAvailable()
      in.addData(rows.drop(6)); q.processAllAvailable()
      val got = spark.table("sbask").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      assert(got == expect, s"got $got\nexp $expect")
      // order 1 has 4 distinct parts -> C(4,2)=6 pairs, exactly once each
      assert(got.count { case (a, b) => Seq(a, b).forall(Seq(10L, 20L, 30L, 40L).contains) } == 6)
    } finally q.stop()
  }
}
