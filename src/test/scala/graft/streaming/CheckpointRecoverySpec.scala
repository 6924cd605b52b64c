package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.{Dataset, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec

/** Fault tolerance: a stateful streaming query stopped mid-stream and
  * restarted from its checkpoint resumes with per-key GroupState
  * intact — the property that makes flatMapGroupsWithState state
  * durable on a real cluster (the reference has no recovery at all:
  * SURVEY.md §3 "no checkpointing, no recovery"). Sink is foreachBatch
  * (the memory sink does not support checkpoint recovery).
  */
class CheckpointRecoverySpec extends SparkSpec {
  import spark.implicits._

  test("stateful query resumes from checkpoint with state intact") {
    implicit val sql = spark.sqlContext
    val ckpt = Files.createTempDirectory("graft_ckpt").toString
    val in = MemoryStream[String]
    val counts = StatefulStreams.statefulByKey(in.toDS(), (w: String) => w, 0) {
      (n: Int, w: String) => (n + 1, Seq(s"$w:${n + 1}"))
    }
    val received = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    def start() = counts.writeStream
      .foreachBatch { (batch: Dataset[String], _: Long) =>
        batch.collect().foreach(received.add)
      }
      .option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()

    in.addData(Seq("a", "b", "a"))
    val q1 = start()
    q1.awaitTermination()
    assert(received.toArray(Array.empty[String]).sorted.toSeq ==
      Seq("a:1", "a:2", "b:1"))

    // second incarnation of the query, same checkpoint: the running
    // counts must continue from 2/1, not restart at 0
    in.addData(Seq("a", "b"))
    val q2 = start()
    q2.awaitTermination()
    assert(received.toArray(Array.empty[String]).sorted.toSeq ==
      Seq("a:1", "a:2", "a:3", "b:1", "b:2"))
  }

  test("token-budget gate resumes from checkpoint: spent budget survives restart") {
    implicit val sql = spark.sqlContext
    val ckpt = Files.createTempDirectory("graft_ckpt_budget").toString
    def doc(words: Int) = Seq.fill(words)("w").mkString(" ")
    val in = MemoryStream[(Long, String, String)]
    val gate = StatefulStreams.streamingTokenBudget(
      in.toDF().toDF("doc_id", "source", "text"), budget = 10L)
    val received = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    def start() = gate.writeStream
      .foreachBatch { (batch: Dataset[(Long, String, Long, Long)], _: Long) =>
        batch.collect().foreach(r => received.add((r._1, r._4)))
      }
      .option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()

    in.addData(Seq((1L, "a", doc(6))))
    val q1 = start()
    q1.awaitTermination()
    assert(received.toArray(Array.empty[(Long, Long)]).toSet == Set((1L, 6L)))

    // restart: the 6 spent tokens must persist — doc 2 (6 toks) crosses
    // the line (admitted, cum 12), doc 3 starts past budget (rejected).
    // A reset-to-zero state would admit both.
    in.addData(Seq((2L, "a", doc(6)), (3L, "a", doc(6))))
    val q2 = start()
    q2.awaitTermination()
    assert(received.toArray(Array.empty[(Long, Long)]).toSet ==
      Set((1L, 6L), (2L, 12L)))
  }

  test("stateful streaming runs on the RocksDB state store") {
    // the at-scale state backend (bounded executor memory, state
    // spills to local RocksDB instances) — same operator, one config
    implicit val sql = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[String]
      in.addData(Seq("x", "y", "x"))
      in.addData(Seq("x"))
      val counts = StatefulStreams.statefulByKey(in.toDS(), (w: String) => w, 0) {
        (n: Int, w: String) => (n + 1, Seq(s"$w:${n + 1}"))
      }
      val q = counts.writeStream.format("memory").queryName("rocks_out")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val got = spark.table("rocks_out").as[String].collect().toSeq.sorted
      assert(got == Seq("x:1", "x:2", "x:3", "y:1"))
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("attribution-edge stream resumes from checkpoint: open session survives restart") {
    implicit val sql = spark.sqlContext
    val ckpt = Files.createTempDirectory("graft_ckpt_attr").toString
    val h = 1700000000000L
    val in = MemoryStream[(Long, Long, String, Long)]
    // flushAfterMs = None: this spec pins batch parity via AvailableNow,
    // which never terminates under a processing-time flush timer (the
    // engine always schedules another batch so timers can fire);
    // StateBoundSpec drives the timer path with a polling sink.
    val edges = StatefulStreams.streamingAttributionEdges(
      in.toDF().toDF("event_id", "user_id", "event_type", "ts_ms"), None)
    val received = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
    def start() = edges.writeStream
      .foreachBatch { (batch: Dataset[(String, String)], _: Long) =>
        batch.collect().foreach(received.add)
      }
      .option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()

    // session open, unconverted, at the stop point
    in.addData(Seq((1L, 1L, "view", h), (2L, 1L, "click", h + 1000)))
    val q1 = start(); q1.awaitTermination()
    assert(received.toArray(Array.empty[(String, String)]).sorted.toSeq ==
      Seq(("START", "view"), ("view", "click")))

    // restart from checkpoint: the in-session edge must continue from
    // the recovered (last_ts, last_kept) state — no replayed START,
    // and the NEXT session's arrival still emits the old one's NULL
    in.addData(Seq((3L, 1L, "purchase", h + 2000),
      (4L, 1L, "view", h + 9000000L)))
    val q2 = start(); q2.awaitTermination()
    assert(received.toArray(Array.empty[(String, String)]).sorted.toSeq ==
      Seq(("START", "view"), ("START", "view"),
        ("click", "CONV"), ("view", "click")))
  }
}
