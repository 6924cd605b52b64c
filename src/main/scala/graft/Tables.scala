package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Parquet table readers over the driver testdata directory layout
  * (`TESTDATA.md`): one parquet file per table under `sfDir`.
  *
  * All reads go through `spark.read.parquet` so Catalyst sees a plain
  * file scan: filter pushdown (`PushedFilters`) and column pruning
  * (`ReadSchema`) apply to every downstream query with zero extra work.
  * At cluster scale these would be partitioned-directory datasets; the
  * API surface is identical.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** `events.ts` is parquet timestamp[ns], which Spark 4 rejects by
    * default (PARQUET_TYPE_ILLEGAL). Read it as a raw nanosecond Long
    * (`spark.sql.legacy.parquet.nanosAsLong`) and derive:
    *   - `ts`    — μs-precision TimestampType (same truncation DuckDB
    *               applies, since DuckDB timestamps are μs too);
    *   - `ts_ms` — millisecond epoch Long, matching the oracle's
    *               `epoch_ms(ts)` exactly, so all event-time arithmetic
    *               runs on identical integers in both engines.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
      .withColumn("ts_ms", expr("ts div 1000000"))
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
