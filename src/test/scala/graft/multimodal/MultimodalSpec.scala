package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions.{col, lit, regexp_extract}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._
  import Multimodal._

  test("binaryFile source ingests raw payloads into the media pipeline") {
    // the production ingest path: a directory of opaque media blobs read
    // by Spark's binaryFile source (path, modificationTime, length,
    // content), mapped to MediaRecord, features extracted batched —
    // end-to-end from files on disk, no parquet intermediary
    val dir = java.nio.file.Files.createTempDirectory("graft_media")
    val payloads = (0L until 20L).map { i =>
      val bytes = Array.tabulate[Byte]((i % 30).toInt + 2)(j => (i * 3 + j).toByte)
      java.nio.file.Files.write(dir.resolve(f"m$i%04d.bin"), bytes)
      i -> bytes
    }.toMap
    val recs = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.bin").load(dir.toString)
      .select(
        regexp_extract(col("path"), "m(\\d+)\\.bin$", 1).cast("long").as("media_id"),
        lit("image").as("kind"), col("content").as("payload"))
      .as[MediaRecord]
    val got = extractFeatures(recs).collect().map(f => f.media_id -> f).toMap
    assert(got.size == 20)
    payloads.foreach { case (id, bytes) =>
      assert(got(id).byte_len == bytes.length.toLong)
      assert(got(id).checksum == bytes.map(_ & 0xff).sum.toLong % 997)
    }
  }

  test("decode stub is deterministic and batch-shape independent") {
    val recs = (0L until 150L).map(i =>
      MediaRecord(i, Seq("image", "audio", "video")(i.toInt % 3),
        Array.tabulate[Byte]((i % 40).toInt + 1)(j => (i + j).toByte)))
    val oneByOne = recs.flatMap(r => decodeBatch(Seq(r)))
    val batched = recs.grouped(64).flatMap(decodeBatch).toSeq
    assert(oneByOne == batched)
  }

  test("extractFeatures runs distributed and matches local decode") {
    val recs = (0L until 100L).map(i =>
      MediaRecord(i, "image", Array.tabulate[Byte](10)(j => (i * 7 + j).toByte)))
    val ds = spark.createDataset(recs).repartition(5)
    val got = extractFeatures(ds).collect().sortBy(_.media_id).toSeq
    val want = decodeBatch(recs).sortBy(_.media_id)
    assert(got == want)
  }

  test("frame sampling strides through video chunks only") {
    val video = MediaRecord(1, "video", Array.fill[Byte](300)(7))
    val audio = MediaRecord(2, "audio", Array.fill[Byte](300)(7))
    val ds = spark.createDataset(Seq(video, audio))
    val frames = sampleFrames(ds, stride = 2).collect().toSeq
    assert(frames.map(_._1).distinct == Seq(1L))
    assert(frames.map(_._2) == Seq(0, 2, 4)) // 300 bytes -> 5 chunks, stride 2
  }

  test("media features query over documents produces full coverage") {
    val df = mediaFeaturesQuery(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.length == 500)
    assert(df.columns.toSeq ==
      Seq("media_id", "kind", "byte_len", "checksum", "width", "height", "n_frames"))
    assert(rows.forall(_.getLong(2) > 0))
  }

  test("pHash60: identical payloads collide, uniform payloads hash to zero") {
    val a = Array.tabulate[Byte](200)(j => (j * 13).toByte)
    assert(pHash60(a) == pHash60(a.clone()))
    // uniform bytes: every block sum equals the mean, no strict exceed
    assert(pHash60(Array.fill[Byte](240)(42)) == 0L)
    assert(pHash60(Array.empty[Byte]) == 0L)
    // a single flipped byte moves few bits
    val b = a.clone(); b(100) = (b(100) + 120).toByte
    assert(java.lang.Long.bitCount(pHash60(a) ^ pHash60(b)) <= 3)
  }
}
