package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SelfJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def expected(n: Int) =
    (for { i <- 0 until n; j <- i + 1 until n; if i % 3 == j % 3 }
      yield (i.toLong, j.toLong)).sorted

  test("pairsWithinBlocks emits each unordered in-block pair exactly once") {
    val df = (0 until 40).map(i => (i.toLong, s"b${i % 3}", s"v$i"))
      .toDF("id", "blk", "payload")
    for (split <- Seq(1, 3, 8)) {
      val pairs = SelfJoins.pairsWithinBlocks(df, Seq("blk"), "id", lit(split))
        .select(least(col("id_l"), col("id_r")).as("a"),
          greatest(col("id_l"), col("id_r")).as("b"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(pairs.length == pairs.distinct.length, s"split=$split emitted dup pairs")
      assert(pairs.sorted == expected(40), s"split=$split pair set wrong")
    }
  }

  test("property: pair set invariant under split factor and block shape") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    val gen = for {
      n <- Gen.choose(0, 30)
      nBlocks <- Gen.choose(1, 4)
      blocks <- Gen.listOfN(n, Gen.choose(0, nBlocks - 1))
      split <- Gen.choose(1, 6)
    } yield (blocks, split)
    val prop = Prop.forAll(gen) { case (blocks, split) =>
      val df = blocks.zipWithIndex.map { case (b, i) => (i.toLong, s"b$b") }
        .toDF("id", "blk")
      val got = SelfJoins.pairsWithinBlocks(df, Seq("blk"), "id", lit(split))
        .select(least(col("id_l"), col("id_r")), greatest(col("id_l"), col("id_r")))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val want = for {
        i <- blocks.indices; j <- (i + 1) until blocks.length
        if blocks(i) == blocks(j)
      } yield (i.toLong, j.toLong)
      got.sorted == want.sorted && got.distinct.length == got.length
    }
    val res = check(Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("validateSplit rejects a split that is not per-block constant") {
    // a row-dependent split silently loses pairs (the (p,q) tilings of
    // the two rows disagree) — the validation mode must fail fast
    val df = (0 until 10).map(i => (i.toLong, "b0")).toDF("id", "blk")
    val rowDependent = (pmod(col("id"), lit(2)) + 1).cast("int")
    val e = intercept[IllegalArgumentException] {
      SelfJoins.pairsWithinBlocks(df, Seq("blk"), "id", rowDependent,
        validateSplit = true).collect()
    }
    assert(e.getMessage.contains("functionally dependent"))
    // the legitimate shapes pass validation unchanged
    val ok = SelfJoins.pairsWithinBlocks(df, Seq("blk"), "id", lit(3),
      validateSplit = true)
      .select(least(col("id_l"), col("id_r")), greatest(col("id_l"), col("id_r")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(ok.sorted == (for { i <- 0 until 10; j <- i + 1 until 10 }
      yield (i.toLong, j.toLong)).sorted)
  }

  test("adaptive split preserves the pair set across heterogeneous block sizes") {
    // one tiny block (R must stay 1), one large block (R > 1 with a
    // small pairsPerTask) — the derived split is block-constant by
    // construction, so the tiling invariant holds per block
    val df = ((0 until 5).map(i => (i.toLong, "small")) ++
      (100 until 180).map(i => (i.toLong, "big")))
      .toDF("id", "blk")
    val got = SelfJoins.adaptivePairsWithinBlocks(df, Seq("blk"), "id",
      pairsPerTask = 100, validateSplit = true)
      .select(least(col("id_l"), col("id_r")), greatest(col("id_l"), col("id_r")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = (for { i <- 0 until 5; j <- i + 1 until 5 } yield (i.toLong, j.toLong)) ++
      (for { i <- 100 until 180; j <- i + 1 until 180 } yield (i.toLong, j.toLong))
    assert(got.length == got.distinct.length, "adaptive split emitted dup pairs")
    assert(got.sorted == want.sorted)
  }

  test("payload columns ride through on both sides") {
    val df = Seq((1L, "x", "p1"), (2L, "x", "p2")).toDF("id", "blk", "payload")
    val row = SelfJoins.pairsWithinBlocks(df, Seq("blk"), "id", lit(2)).collect()
    assert(row.length == 1)
    val r = row.head
    val got = Set(r.getAs[String]("payload_l"), r.getAs[String]("payload_r"))
    assert(got == Set("p1", "p2"))
  }
}
