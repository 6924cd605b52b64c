package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Property armor for the distributed-prefix token-budget cut
  * (Sampling.tokenBudgetOver): the range-partition + carry-broadcast
  * running sum must equal the sequential greedy fold for ANY corpus —
  * including quality ties (doc_id tiebreak) and sources straddling
  * range-partition boundaries, which is exactly where a carry bug
  * would hide.
  */
class SamplingBudgetSpec extends SparkSpec {
  import spark.implicits._

  private def reference(
      rows: Seq[(Long, String, Long, Double)], budget: Long): Set[(String, Long, Long, Long)] =
    rows.groupBy(_._2).flatMap { case (src, docs) =>
      var cum = 0L
      docs.sortBy { case (id, _, _, q) => (-q, id) }.flatMap { case (id, _, n, _) =>
        if (cum < budget) { cum += n; Some((src, id, n, cum)) } else None
      }
    }.toSet

  test("property: distributed budget cut equals the sequential greedy fold") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    val gen = for {
      n <- Gen.choose(0, 120)
      budget <- Gen.choose(1L, 60L)
      rows <- Gen.listOfN(n, for {
        src <- Gen.oneOf("a", "b", "c")
        toks <- Gen.choose(0L, 20L)
        // coarse quality grid forces ties -> exercises the doc_id tiebreak
        q <- Gen.oneOf(0.0, 0.25, 0.5, 1.0)
      } yield (src, toks, q))
    } yield (rows.zipWithIndex.map { case ((s, t, q), i) => (i.toLong, s, t, q) }, budget)
    val prop = Prop.forAll(gen) { case (rows, budget) =>
      val df = rows.toDF("doc_id", "source", "n_toks", "quality")
      val got = Sampling.tokenBudgetOver(df, budget).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      got == reference(rows, budget)
    }
    val res = check(Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: rankDistributed equals a sequential row_number for any frame") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    val gen = for {
      n <- Gen.choose(0, 150)
      rows <- Gen.listOfN(n, for {
        src <- Gen.oneOf("a", "b", "c", "giant")
        q <- Gen.oneOf(0.0, 0.25, 0.5, 1.0) // ties exercise the doc_id break
      } yield (src, q))
    } yield rows.zipWithIndex.map { case ((s, q), i) => (i.toLong, s, q) }
    val prop = Prop.forAll(gen) { rows =>
      val df = rows.toDF("doc_id", "source", "quality")
      val got = Sampling.rankDistributed(df, Seq("source"),
          Seq(col("quality").desc, col("doc_id"))).collect()
        .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
          r.getAs[Long]("rk"))).toSet
      val want = rows.groupBy(_._2).flatMap { case (src, docs) =>
        docs.sortBy { case (id, _, q) => (-q, id) }.zipWithIndex
          .map { case ((id, _, _), i) => (src, id, (i + 1).toLong) }
      }.toSet
      got == want
    }
    val res = check(Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  test("rankDistributed is invariant under input partitioning (skewed part values)") {
    // one part value holding 90% of rows straddles many range partitions
    // — exactly where the carry join would break
    val rows = (0L until 300L).map(i =>
      (i, if (i % 10 == 0) "rare" else "giant", (i % 7) * 0.1)).toSeq
    def run(parts: Int) = Sampling.rankDistributed(
      rows.toDF("doc_id", "source", "quality").repartition(parts),
      Seq("source"), Seq(col("quality").desc, col("doc_id"))).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("rk"))).toSet
    assert(run(1) == run(13) && run(13) == run(32))
  }

  test("budget cut is invariant under input partitioning") {
    val rows = (0L until 200L).map(i =>
      (i, "s" + (i % 4), (i * 7 % 23), (i % 5) * 0.2)).toSeq
    def run(parts: Int) = Sampling.tokenBudgetOver(
      rows.toDF("doc_id", "source", "n_toks", "quality").repartition(parts), 100L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet
    assert(run(1) == run(13) && run(13) == run(32))
  }
}
