package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

/** Source/sink format coverage beyond parquet (the reference has no
  * file IO at all — SURVEY.md §2.2 Scans): CSV and JSON round-trips
  * with explicit schemas, plus schema-on-read JSON lines.
  */
class SourceFormatsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("CSV round-trip preserves rows with an explicit schema") {
    val dir = Files.createTempDirectory("graft_csv").toString
    val src = graft.Tables.nation(spark, sf)
    src.write.mode("overwrite").option("header", "true").csv(dir)
    val schema = StructType(Seq(
      StructField("n_nationkey", IntegerType),
      StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType)))
    val back = spark.read.schema(schema).option("header", "true").csv(dir)
    assert(back.count() == src.count())
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      src.orderBy("n_nationkey").collect().toSeq)
  }

  test("JSON-lines round-trip and schema-on-read") {
    val dir = Files.createTempDirectory("graft_json").toString
    val src = graft.Tables.region(spark, sf)
    src.write.mode("overwrite").json(dir)
    val back = spark.read.json(dir)
    assert(back.count() == src.count())
    // schema-on-read infers the columns (types may widen: int -> bigint)
    assert(back.columns.sorted.toSeq == src.columns.sorted.toSeq)
    val names = back.select("r_name").collect().map(_.getString(0)).sorted.toSeq
    assert(names == src.select("r_name").collect().map(_.getString(0)).sorted.toSeq)
  }

  test("DSv2 wordgen source: planned partitions, partition-count-invariant data") {
    def read(parts: Int) = spark.read.format("graft.sources.WordGenSource")
      .option("rows", "10000").option("partitions", parts.toString)
      .option("seed", "42").load()
    val df8 = read(8)
    assert(df8.rdd.getNumPartitions == 8, "source must plan the requested partitions")
    assert(df8.count() == 10000)
    // word(i) is a pure function of the row id: same data at any
    // generation parallelism (physical, never semantic — like O4b)
    val a = df8.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val b = read(1).orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(a == b)
    // corpus bound holds and the distribution is roughly uniform
    val distinct = df8.select("word").distinct().count()
    assert(distinct == 100, s"expected the full 100-word corpus, got $distinct")
  }

  test("malformed JSON rows are captured, not silently dropped") {
    // ingestion robustness: PERMISSIVE mode routes undecodable rows to
    // _corrupt_record so the pipeline can quarantine and count them
    // (the q161 admission-gate discipline applied at decode time);
    // FAILFAST turns the same input into a loud error
    val dir = Files.createTempDirectory("graft_badjson")
    Files.write(dir.resolve("part0.json"), java.util.Arrays.asList(
      """{"id": 1, "v": "ok"}""",
      """{"id": 2 "v": "missing comma"}""",
      """{"id": 3, "v": "fine"}""",
      """not json at all"""))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType),
      StructField("_corrupt_record", StringType)))
    val df = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir.toString).cache() // corrupt-record queries need the full row cached
    try {
      assert(df.count() == 4)
      val bad = df.filter(col("_corrupt_record").isNotNull)
      assert(bad.count() == 2)
      val good = df.filter(col("_corrupt_record").isNull)
        .select("id").collect().map(_.getLong(0)).toSet
      assert(good == Set(1L, 3L))
      // FAILFAST on the same files throws at action time
      val strict = spark.read
        .schema(StructType(schema.fields.filter(_.name != "_corrupt_record")))
        .option("mode", "FAILFAST").json(dir.toString)
      intercept[org.apache.spark.SparkException](strict.collect())
    } finally df.unpersist()
  }

  test("ORC round-trip with predicate pushdown reaching the scan") {
    val dir = Files.createTempDirectory("graft_orc").toString
    val src = graft.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    src.write.mode("overwrite").option("compression", "zlib").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.count() == src.count())
    val filtered = back.filter(col("l_returnflag") === "R")
    val plan = filtered.queryExecution.executedPlan.toString
    // the ORC reader must receive the filter (searchArgument pushdown),
    // not evaluate it post-scan only
    assert(plan.contains("PushedFilters: [IsNotNull(l_returnflag), EqualTo(l_returnflag,R)"),
      plan.take(800))
    assert(filtered.count() ==
      src.filter(col("l_returnflag") === "R").count())
  }

  test("partitioned parquet write prunes partitions on read") {
    val dir = Files.createTempDirectory("graft_part").toString
    graft.Tables.documents(spark, sf)
      .write.mode("overwrite").partitionBy("lang").parquet(dir)
    val one = spark.read.parquet(dir).filter(col("lang") === "en")
    val plan = one.queryExecution.executedPlan.toString
    // partition filter must reach the scan, not a post-filter
    assert(one.count() > 0)
    assert(plan.contains("PartitionFilters: [isnotnull(lang"), plan.take(500))
  }
}
