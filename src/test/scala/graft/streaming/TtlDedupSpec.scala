package graft.streaming

import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec

/** Spark 4 transformWithState TTL dedup (StatefulStreams.ttlDedup):
  * first occurrence of a key is emitted, repeats within the TTL horizon
  * are dropped, and a key re-arriving after its state entry expired is
  * emitted again — the rolling-horizon semantics of continuous-ingest
  * dedup. Runs on the RocksDB provider (transformWithState rejects the
  * HDFS-backed one) with a nofork:// checkpoint: stock local-FS
  * checkpointing forks ls/chmod per state-schema/metadata file, which
  * made the first micro-batch take minutes in this container
  * (NoForkFileSystem scaladoc).
  *
  * Driving note: with TimeMode.ProcessingTime the engine ALWAYS has
  * another batch to run (processing time must advance for TTL/timer
  * expiry), so `noNewData` is never set and
  * `StreamingQuery.processAllAvailable()` would block forever — the
  * spec polls the sink with a deadline instead, and settles (waits out
  * extra triggers) before asserting nothing else was emitted.
  */
class TtlDedupSpec extends SparkSpec {
  import spark.implicits._

  private def withRocksDb[A](body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private def run(ttl: java.time.Duration)(
      drive: (MemoryStream[(Long, String)],
              ConcurrentLinkedQueue[(Long, String)]) => Unit): Unit =
    withRocksDb {
      implicit val sql = spark.sqlContext
      val ckpt = NoForkFileSystem.install(
        spark, Files.createTempDirectory("graft_tws").toString)
      val in = MemoryStream[(Long, String)]
      val out = StatefulStreams.ttlDedup(in.toDS(), (r: (Long, String)) => r._1, ttl)
      val received = new ConcurrentLinkedQueue[(Long, String)]()
      val q = out.writeStream
        .foreachBatch { (batch: Dataset[(Long, String)], _: Long) =>
          batch.collect().foreach(received.add)
        }
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.ProcessingTime("100 milliseconds"))
        .start()
      try drive(in, received)
      finally q.stop()
    }

  /** Poll until the sink holds `n` rows (micro-batches keep firing on
    * the trigger clock; there is no "done" signal to await).
    */
  private def awaitCount(
      received: ConcurrentLinkedQueue[(Long, String)], n: Int): Unit = {
    val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
    while (received.size < n && System.nanoTime() < deadline) Thread.sleep(50)
    assert(received.size >= n, s"sink never reached $n rows: $received")
  }

  /** Wait out several further trigger intervals so a wrongly-emitted
    * duplicate would have landed, then assert the exact sink contents.
    */
  private def settleAndAssert(
      received: ConcurrentLinkedQueue[(Long, String)],
      expect: Seq[(Long, String)]): Unit = {
    Thread.sleep(500)
    assert(received.toArray(Array.empty[(Long, String)]).sorted.toSeq == expect)
  }

  test("first occurrence per key emitted; repeats within TTL dropped") {
    run(java.time.Duration.ofHours(1)) { (in, received) =>
      in.addData(Seq((1L, "a1"), (2L, "b1"), (1L, "a-dup-same-batch")))
      awaitCount(received, 2)
      settleAndAssert(received, Seq((1L, "a1"), (2L, "b1")))

      // next micro-batches: repeats of 1 and 2 dropped, new key 3 emitted
      in.addData(Seq((1L, "a-dup-next-batch"), (3L, "c1"), (2L, "b-dup")))
      awaitCount(received, 3)
      settleAndAssert(received, Seq((1L, "a1"), (2L, "b1"), (3L, "c1")))
    }
  }

  test("key re-arriving past the TTL horizon is emitted again") {
    run(java.time.Duration.ofMillis(100)) { (in, received) =>
      in.addData(Seq((7L, "first")))
      awaitCount(received, 1)
      // let the state entry expire (TTL is processing-time based)
      Thread.sleep(1000)
      in.addData(Seq((7L, "after-expiry")))
      awaitCount(received, 2)
      settleAndAssert(received, Seq((7L, "after-expiry"), (7L, "first")))
    }
  }
}
