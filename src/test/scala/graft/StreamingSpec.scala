package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Sessionize
import graft.streaming.Sessionize.{Event, Session}

/** Streaming custom-state sessionization vs the batch window form. */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  import spark.implicits._

  val gap = 3600L * 1000000000L // 1h in ns

  test("flatMapGroupsWithState sessions match batch sessionization (closed sessions)") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val batch = spark.read.parquet("/root/testdata/sf0.001/events.parquet")

    // batch truth: all sessions per user
    val truth = Sessionize.sessionizeBatch(batch, gap)
      .select("user_id", "start_ns", "end_ns", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

    // streaming: drive the same events through flatMapGroupsWithState
    val inDir = Files.createTempDirectory("graft-sess-in")
    Files.copy(java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      inDir.resolve("events.parquet"))
    val stream = spark.readStream
      .schema(graft.streaming.EventsIngest.eventsSchema)
      .parquet(inDir.toString)
      .select(col("event_id"), col("ts"), col("user_id")).as[Event]
    val sessions = Sessionize.sessionizeStream(stream, gap)
    val qname = "sessions_out_" + System.nanoTime()
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName(qname)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val streamed = spark.table(qname).as[Session].collect()
      .map(s => (s.user_id, s.start_ns, s.end_ns, s.n_events)).toSet

    // the stream never closes each user's LAST session (no more input), so
    // streamed == truth minus exactly one trailing open session per user
    val users = truth.map(_._1)
    assert(streamed.subsetOf(truth), s"phantom sessions: ${streamed -- truth}")
    val missing = truth -- streamed
    assert(missing.size === users.size, s"expected one open session per user, got ${missing.size}")
    val lastStart = truth.groupBy(_._1).map { case (u, ss) => u -> ss.map(_._2).max }
    assert(missing.forall(s => lastStart(s._1) === s._2),
      "a non-trailing session failed to close")
  }
}
