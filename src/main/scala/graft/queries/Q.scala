package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered query: a Spark implementation plus (when the semantics
  * are ANSI-SQL-expressible) an equivalent DuckDB oracle statement over
  * the same parquet tables. Column names/aliases MUST match between the
  * two — the driver sorts columns by name before hashing values.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
)
