package graft

import org.apache.spark.sql.functions._

/** Pre-driver gate for the oracle contract's sortability rule: every
  * registered query's top-level output columns must be scalar (the
  * driver's pandas canonicalization sorts each column before hashing,
  * and array/map cells are unhashable there — the round-9 q101 red
  * row). Building the DataFrames only plans them (no execution), so
  * sweeping all ~174 registered queries is cheap.
  */
class SchemaLintSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("the lint flags a synthetic array-output query") {
    import spark.implicits._
    val bad = Seq((1L, Seq(1, 2, 3))).toDF("id", "codes")
    val v = SchemaLint.violations(bad.schema)
    assert(v.nonEmpty && v.head.startsWith("codes:"), v.toString)
  }

  test("the lint flags map columns and collections nested in structs") {
    import spark.implicits._
    val m = Seq((1L, Map("a" -> 1))).toDF("id", "m")
    assert(SchemaLint.violations(m.schema).nonEmpty)
    val nested = Seq((1L, (2L, Seq(1, 2)))).toDF("id", "s")
    assert(SchemaLint.violations(nested.schema).exists(_.startsWith("s.")))
    val okStruct = Seq((1L, (2L, "x"))).toDF("id", "s")
    assert(SchemaLint.violations(okStruct.schema).isEmpty)
  }

  test("every registered query's output schema is driver-sortable") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val v = SchemaLint.violations(fn(spark, sf).schema)
      if (v.isEmpty) Nil else Seq(s"$name -> ${v.mkString("; ")}")
    }
    assert(offenders.isEmpty,
      s"non-scalar top-level output columns:\n${offenders.mkString("\n")}")
  }
}
