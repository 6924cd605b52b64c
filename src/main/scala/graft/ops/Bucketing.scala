package graft.ops

import org.apache.spark.sql.DataFrame

/** Bucketed-table helpers: pre-shuffle a table ONCE at write time so
  * every later join/aggregation on the bucket key runs exchange-free.
  *
  * At 100 TB this is the difference between re-shuffling 100 TB per
  * join and never shuffling it again: two tables bucketed by the same
  * key and count sort-merge-join with zero Exchange nodes
  * (BucketingSpec asserts this on the physical plan). The reference has
  * no storage layer at all (SURVEY.md §2.2 Scans), so this surface is
  * pure Spark: `bucketBy` + `sortBy` + `saveAsTable`.
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)
}
