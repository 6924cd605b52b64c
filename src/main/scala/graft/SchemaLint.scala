package graft

import org.apache.spark.sql.types.{ArrayType, MapType, StructField, StructType}

/** Output-schema lint for the driver's oracle contract.
  *
  * The driver canonicalizes each query result in pandas by sorting every
  * column before hashing; an `array<...>` or `map<...>` top-level column
  * makes that sort crash (`TypeError: unhashable type: 'numpy.ndarray'`
  * — the exact q101 failure in round 9), leaving the query forever
  * unverified. The rule is therefore structural, not stylistic: every
  * REGISTERED query's top-level output columns must be scalar. Nested
  * collections (e.g. an array serialized through `concat_ws`, or a
  * struct column that Spark writes as one parquet group and pandas reads
  * as a hashable tuple-like) are fine only once flattened to a scalar
  * representation; this lint simply refuses Array/Map at the top level.
  */
object SchemaLint {

  /** Column-level violations ("col: array<int>") for a result schema. */
  def violations(schema: StructType): Seq[String] =
    schema.fields.toSeq.flatMap {
      case StructField(name, t: ArrayType, _, _) =>
        Seq(s"$name: ${t.simpleString}")
      case StructField(name, t: MapType, _, _) =>
        Seq(s"$name: ${t.simpleString}")
      case StructField(name, st: StructType, _, _) =>
        // a struct of scalars round-trips; a struct CONTAINING a
        // collection hits the same pandas wall one level down
        violations(st).map(v => s"$name.$v")
      case _ => Nil
    }
}
