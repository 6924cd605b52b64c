package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Port of the reference's only benchmark workload
  * (bench/wordcount_test.go:12-49): ~10 MiB of words drawn from a
  * 100-word corpus with a fixed seed, keyed by word, emitting a RUNNING
  * count per input record (ssp's signature output shape), discarded
  * sink, parallelism 12.
  *
  * Differences, both deliberate:
  *  - the corpus is generated from a seeded RNG rather than copying the
    *  reference's lorem list (distribution parity is what matters —
    *  FIXTURES.md F8); generation is the PLANNED DSv2 source
    *  (sources/WordGenSource) — N input partitions each producing
    *  their slice independently, bit-identical at any parallelism —
    *  not a driver-side loop feeding a channel like the reference;
  *  - two implementations are timed: the analytic-window form (codegen,
    *  the scalable path) and the graft.core stateful-operator form
    *  (the reference's actual operator semantics).
  *
  * Prints one JSON line: {"bytes":..,"words":..,"window_sec":..,
  * "stateful_sec":..}.
  */
object WordCountBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "12")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "12")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // 100 deterministic pseudo-words, avg length ~6.4 chars (like the
    // reference's lorem corpus); ~10 MiB of them, planned end-to-end by
    // the DSv2 generator source (12 input partitions, like the
    // reference's parallelism-12 run).
    val avgLen = graft.sources.WordGenSource.corpus(0L).map(_.length + 1).sum /
      graft.sources.WordGenSource.CorpusSize.toDouble
    val bytesIn = 10L * 1024 * 1024
    val nWords = (bytesIn / avgLen).toLong

    val words = spark.read.format("graft.sources.WordGenSource")
      .option("rows", nWords.toString)
      .option("partitions", "12")
      .option("seed", "0")
      .load()

    // (a) analytic-window running count (whole-stage codegen)
    val t0 = System.nanoTime()
    val w = Window.partitionBy($"word").orderBy($"id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    words.withColumn("n", count(lit(1)).over(w))
      .select(concat($"word", lit(": "), $"n"))
      .write.format("noop").mode("overwrite").save()
    val windowSec = (System.nanoTime() - t0) / 1e9

    // (b) stateful-operator form (groupByKey + ordered fold — the
    // reference's NewStatefulNode semantics via graft.core)
    val t1 = System.nanoTime()
    words.as[(Long, String)].groupByKey(_._2)
      .flatMapGroups { (word: String, it: Iterator[(Long, String)]) =>
        var n = 0L
        it.map { _ => n += 1; s"$word: $n" }
      }
      .write.format("noop").mode("overwrite").save()
    val statefulSec = (System.nanoTime() - t1) / 1e9

    println(f"""{"bytes":$bytesIn,"words":$nWords,"window_sec":$windowSec%.3f,"stateful_sec":$statefulSec%.3f}""")
    spark.stop()
  }
}
