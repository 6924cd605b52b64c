package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ArrayExprSpec extends SparkSpec {
  import spark.implicits._

  private val P = 2147483647L

  test("minhash_sig matches the reference affine-permutation formula") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(11)
    val rows = (1 to 30).map(_ => Seq.fill(rnd.nextInt(60) + 1)(rnd.nextLong().abs % P))
    val got = rows.toDF("h").select(expr("minhash_sig(h)")).as[Seq[Long]].collect().toSeq
    val want = rows.map { hs =>
      (0 until graft.queries.Dedup.NumHashes).map { j =>
        hs.map(x => ((2L * j + 1) * x + 12345L * j + 6789L) % P).min
      }
    }
    assert(got.map(_.toSeq) == want.map(_.toSeq))
  }

  test("minhash_sig of empty input is all-p sentinel") {
    GraftFunctions.register(spark)
    val got = Seq(Seq.empty[Long]).toDF("h")
      .select(expr("minhash_sig(h)")).as[Seq[Long]].head()
    assert(got == Seq.fill(graft.queries.Dedup.NumHashes)(P))
  }

  test("simhash60 matches the majority-vote reference formula") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(19)
    val rows = (1 to 30).map(_ => Seq.fill(rnd.nextInt(50) + 1)(rnd.nextLong().abs % (1L << 60)))
    val got = rows.toDF("hs").select(expr("simhash60(hs)")).as[Long].collect().toSeq
    val want = rows.map { hs =>
      (0 until 60).map { b =>
        val votes = hs.map(h => if (((h >> b) & 1L) == 1L) 1 else -1).sum
        if (votes > 0) 1L << b else 0L
      }.sum
    }
    assert(got == want)
    // known example from the oracle probe: [5, 12, 5] -> 5
    val known = Seq(Seq(5L, 12L, 5L)).toDF("hs")
      .select(expr("simhash60(hs)")).as[Long].head()
    assert(known == 5L)
  }

  test("rolling_hashes: rolling update equals direct Horner formula") {
    GraftFunctions.register(spark)
    val P = 2147483647L
    def direct(s: String, w: Int): Seq[Long] = {
      val b = s.getBytes("UTF-8")
      if (b.length < w) Seq.empty
      else (0 to b.length - w).map { i =>
        (i until i + w).foldLeft(0L)((acc, j) => (acc * 257 + (b(j) & 0xff)) % P)
      }
    }
    val rnd = new scala.util.Random(23)
    val strs = (1 to 20).map(_ =>
      (0 until rnd.nextInt(80)).map(_ => ('a' + rnd.nextInt(27)).toChar).mkString)
    val got = strs.toDF("s").select(expr("rolling_hashes(s, 16)"))
      .as[Seq[Long]].collect().toSeq
    assert(got.map(_.toSeq) == strs.map(direct(_, 16)))
    // short input -> empty
    assert(Seq("abc").toDF("s").select(expr("rolling_hashes(s, 16)"))
      .as[Seq[Long]].head().isEmpty)
  }

  test("sorted_intersect_count equals set intersection size") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(13)
    val rows = (1 to 50).map { _ =>
      val a = (1 to rnd.nextInt(80)).map(_ => rnd.nextInt(100).toLong).distinct.sorted
      val b = (1 to rnd.nextInt(80)).map(_ => rnd.nextInt(100).toLong).distinct.sorted
      (a, b)
    }
    val got = rows.toDF("a", "b")
      .select(expr("sorted_intersect_count(a, b)")).as[Long].collect().toSeq
    val want = rows.map { case (a, b) => (a.toSet intersect b.toSet).size.toLong }
    assert(got == want)
  }
}
