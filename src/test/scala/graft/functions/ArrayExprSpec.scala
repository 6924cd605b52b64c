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
