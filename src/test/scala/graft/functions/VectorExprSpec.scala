package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class VectorExprSpec extends SparkSpec {
  import spark.implicits._

  private def cosRef(a: Seq[Float], b: Seq[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    a.indices.foreach { i =>
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("cosine_sim matches reference formula bit-for-bit (codegen path)") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(7)
    val rows = (1 to 50).map { i =>
      (Seq.fill(64)(rnd.nextFloat() - 0.5f), Seq.fill(64)(rnd.nextFloat() - 0.5f))
    }
    val got = rows.toDF("a", "b")
      .select(expr("cosine_sim(a, b)")).as[Double].collect().toSeq
    val want = rows.map { case (a, b) => cosRef(a, b) }
    assert(got == want) // bit-exact, not approx
  }

  test("cosine_sim nulls: zero vector, length mismatch, null input") {
    GraftFunctions.register(spark)
    val df = Seq(
      (Seq(0f, 0f), Seq(1f, 2f)), // zero norm -> null
      (Seq(1f, 2f, 3f), Seq(1f, 2f)) // length mismatch -> null
    ).toDF("a", "b")
    val got = df.select(expr("cosine_sim(a, b)")).collect().map(r => r.isNullAt(0)).toSeq
    assert(got == Seq(true, true))
    val withNull = spark.sql("SELECT cosine_sim(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1.0 AS FLOAT)))")
    assert(withNull.collect().head.isNullAt(0))
  }

  test("identical vectors give cosine 1.0") {
    GraftFunctions.register(spark)
    val df = Seq((Seq(1f, 2f, 3f), Seq(1f, 2f, 3f))).toDF("a", "b")
    val v = df.select(expr("cosine_sim(a, b)")).as[Double].head()
    assert(math.abs(v - 1.0) < 1e-12)
  }
}
