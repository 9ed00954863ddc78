package graft

import graft.streaming.StreamingSessions
import graft.streaming.StreamingSessions.{Event, OpenSession, Session}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Stateful streaming sessionization: gap-closed sessions emit exactly
  * once; open sessions stay in (bounded) state across micro-batches.
  */
class StreamingSessionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("sessions close on gap across micro-batches, emit once") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Event]
    // timeoutMs = 0: with a processing-time timeout armed, Spark keeps
    // scheduling timeout-check batches and processAllAvailable never
    // quiesces (see StreamingSessions.sessions scaladoc)
    val out = StreamingSessions.sessions(source.toDS(), gapSeconds = 100L, timeoutMs = 0L)
    val q = out.writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: u1 opens a session (3 events), u2 opens one
      source.addData(Event("u1", 10L), Event("u1", 50L), Event("u1", 120L), Event("u2", 40L))
      q.processAllAvailable()
      assert(spark.table("sess_out").count() == 0, "nothing closed yet")
      // batch 2: u1 jumps past the gap → first session closes, new opens
      source.addData(Event("u1", 500L), Event("u2", 90L))
      q.processAllAvailable()
      val closed = spark.table("sess_out").as[Session].collect().toSet
      assert(closed == Set(Session("u1", 10L, 120L, 3L, "gap")))
      // batch 3: another gap on u1 → the 500 session closes too
      source.addData(Event("u1", 1000L))
      q.processAllAvailable()
      val closed2 = spark.table("sess_out").as[Session].collect().toSet
      assert(closed2 == Set(
        Session("u1", 10L, 120L, 3L, "gap"),
        Session("u1", 500L, 500L, 1L, "gap")))
    } finally q.stop()
  }

  test("step folds unordered events and never shrinks the open session") {
    // pure-function check of the fold, no streaming harness
    var state: Option[OpenSession] = None
    val closed = scala.collection.mutable.Buffer[Session]()
    def fold(secs: Seq[Long]): Unit = {
      val sorted = secs.sorted
      sorted.foreach { t =>
        state match {
          case Some(s) if t - s.end <= 100L =>
            state = Some(OpenSession(s.start, math.max(s.end, t), s.n + 1))
          case Some(s) =>
            closed += Session("k", s.start, s.end, s.n, "gap")
            state = Some(OpenSession(t, t, 1))
          case None => state = Some(OpenSession(t, t, 1))
        }
      }
    }
    fold(Seq(120L, 10L, 50L)) // arrives out of order
    assert(state.contains(OpenSession(10L, 120L, 3)))
    fold(Seq(120L)) // duplicate at the open end: extends count, not end
    assert(state.contains(OpenSession(10L, 120L, 4)))
    assert(closed.isEmpty)
  }
}
