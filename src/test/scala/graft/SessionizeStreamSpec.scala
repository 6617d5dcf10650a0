package graft

import graft.streaming.SessionizeStream
import org.scalatest.funsuite.AnyFunSuite

/** Stateful streaming sessionization must agree with the relational q31 on
  * session structure over the same bounded input.
  */
class SessionizeStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("flatMapGroupsWithState sessions == relational q31 sessions") {
    val streamed = SessionizeStream.run(spark, TestSpark.sf0001)
    val batch = SparkEntry.queries("q31_sessionize")(spark, TestSpark.sf0001)

    // same number of sessions per user, same total events
    val sCounts = streamed.groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bCounts = batch.groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sCounts === bCounts)

    val sEvents = streamed.agg(org.apache.spark.sql.functions.sum("n_events"))
      .head().getLong(0)
    assert(sEvents === Tables.events(spark, TestSpark.sf0001).count())
  }

  test("sessionsOf splits on gap and orders deterministically") {
    import SessionizeStream._
    def ev(id: Long, sec: Long) = Event(1L, id, new java.sql.Timestamp(sec * 1000), 1.0)
    val sessions = sessionsOf(Seq(ev(3, 100000), ev(1, 0), ev(2, 100)))
    assert(sessions.length === 2)
    assert(sessions.head.n_events === 2) // events at 0 and 100
    assert(sessions.last.n_events === 1)
  }
}
