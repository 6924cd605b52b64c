package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 generator source: the reference's random-word bench
  * source (bench/words.go:131-148) as a first-class Spark table.
  *
  * The reference generates its corpus on one goroutine and feeds a
  * channel; at 100 TB a source must instead be PLANNED — N input
  * partitions, each producing its slice independently with no driver
  * involvement. `word(i)` is a pure function of the global row id
  * (splitmix64 bit-mix into a seeded corpus), so the dataset is
  * bit-identical for ANY partition count — generation parallelism is
  * physical, never semantic, the same invariant as O4b round-robin.
  *
  * Usage:
  * {{{
  * spark.read.format("graft.sources.WordGenSource")
  *   .option("rows", "1000000").option("partitions", "32")
  *   .option("seed", "42").load()   // schema: (id long, word string)
  * }}}
  */
class WordGenSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WordGenSource.Schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = new WordGenTable
}

object WordGenSource {
  val Schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("word", StringType, nullable = false)))

  val CorpusSize = 100

  /** 100 deterministic pseudo-words, 3-10 chars (the reference corpus
    * shape; FIXTURES.md F8 — distribution parity, not literal words).
    */
  def corpus(seed: Long): Array[String] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(CorpusSize) {
      val len = 3 + rnd.nextInt(8)
      Array.fill(len)(('a' + rnd.nextInt(26)).toChar).mkString
    }
  }

  /** splitmix64 finalizer — decorrelates sequential ids. */
  def mix(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}

private class WordGenTable extends Table with SupportsRead {
  override def name(): String = "wordgen"
  override def schema(): StructType = WordGenSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new WordGenScan(
      options.getLong("rows", 1000L),
      options.getInt("partitions", 4),
      options.getLong("seed", 0L))
}

private case class WordGenPartition(start: Long, end: Long, seed: Long)
  extends InputPartition

private class WordGenScan(rows: Long, partitions: Int, seed: Long)
  extends ScanBuilder with Scan with Batch {
  override def build(): Scan = this
  override def readSchema(): StructType = WordGenSource.Schema
  override def toBatch: Batch = this

  /** Even row-range slices: partition i owns [i·rows/n, (i+1)·rows/n). */
  override def planInputPartitions(): Array[InputPartition] =
    (0 until partitions).map { i =>
      WordGenPartition(i * rows / partitions, (i + 1) * rows / partitions, seed)
    }.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val p = partition.asInstanceOf[WordGenPartition]
      new PartitionReader[InternalRow] {
        private val words = WordGenSource.corpus(p.seed).map(UTF8String.fromString)
        private var i = p.start - 1
        override def next(): Boolean = { i += 1; i < p.end }
        override def get(): InternalRow = InternalRow(
          i,
          words(java.lang.Math.floorMod(WordGenSource.mix(i), WordGenSource.CorpusSize.toLong).toInt))
        override def close(): Unit = ()
      }
    }
}
