package graft

import org.apache.spark.sql.SparkSession

class GraftExtensionsSpec extends SparkSpec {

  test("extensions inject graft functions into a fresh session") {
    // reuse the shared SparkContext; build a sibling session with the
    // extension applied via withExtensions (same mechanism as the
    // spark.sql.extensions config)
    val base = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // getOrCreate reuses the live SparkContext but builds a new
      // session with the extension applied
      val extended = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions())
        .getOrCreate()
      val v = extended.sql(
        "SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
          "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)))")
        .collect().head.getDouble(0)
      assert(v == 1.0)
      val k = extended.sql("SELECT size(minhash_sig(array(CAST(5 AS BIGINT))))")
        .collect().head.getInt(0)
      assert(k == graft.queries.Dedup.NumHashes)
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }
}
