package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization — the canonical custom-state operator a
  * training-data / clickstream pipeline needs (the reference has no
  * event-time concept at all, SURVEY §2.5; this is north-star surface).
  *
  * A session is a maximal run of one user's events where consecutive gaps
  * are ≤ `gapSec`. Two implementations with identical semantics:
  *
  *  - [[assign]] — batch: one window partitioned BY USER (never global — the
  *    partition key bounds WindowExec memory and parallelizes perfectly at
  *    100 TB: shuffle on user_id, linear scan per user).
  *  - [[assignStream]] — Structured Streaming via
  *    `mapGroupsWithState` (flat variant): per-user `GroupState` carries
  *    (last event time, session counter) across micro-batches.
  */
object Sessionize {

  /** Batch gap sessionization: adds `session_seq` (1-based per user) —
    * deterministic tiebreak on `orderCols` after the timestamp. */
  def assign(df: DataFrame, userCol: String, tsCol: String, gapSec: Long,
             orderCols: Seq[String] = Seq.empty): DataFrame = {
    val ord = (col(tsCol) +: orderCols.map(col)).map(_.asc)
    val w = Window.partitionBy(col(userCol)).orderBy(ord: _*)
    val prev = lag(col(tsCol), 1).over(w)
    // timestamp → epoch seconds; via timestamp because ntz→numeric is not
    // a supported cast (same route as Maintain.segmentOf)
    def secs(c: org.apache.spark.sql.Column) = c.cast("timestamp").cast("double")
    df.withColumn("_new_session",
        when(prev.isNull || secs(col(tsCol)) - secs(prev) > gapSec, 1).otherwise(0))
      .withColumn("session_seq",
        sum(col("_new_session")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_new_session")
  }

  /** Session summary: one row per (user, session) with bounds and size. */
  def summarize(df: DataFrame, userCol: String, tsCol: String, gapSec: Long,
                orderCols: Seq[String] = Seq.empty): DataFrame =
    assign(df, userCol, tsCol, gapSec, orderCols)
      .groupBy(col(userCol), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"))

  /** Session summary via Spark's NATIVE `session_window` aggregation —
    * one hash aggregate with mergeable session state instead of
    * [[assign]]'s per-user sort window; at 100 TB that buys map-side
    * partial merging and removes the WindowExec sort entirely. Gap
    * semantics match [[summarize]] (an event exactly `gap` after the
    * last one stays in-session — Spark's merge is inclusive); the one
    * shape difference is `session_end` = last event + gap (the native
    * window's close), not the last event time. */
  def summarizeNative(df: DataFrame, userCol: String, tsCol: String,
                      gap: String): DataFrame =
    df.groupBy(col(userCol),
        session_window(graft.Tsx.ltz(col(tsCol)), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col(userCol),
        col("sw.start").as("session_start"),
        col("sw.end").as("session_end"),
        col("n_events"))

  /** Streaming event for [[assignStream]]: epoch-second event time. */
  final case class SessEvent(user: String, eventId: Long, tsSec: Double)
  final case class SessOut(user: String, eventId: Long, sessionSeq: Int)
  // public: the state encoder's generated code must reach the constructor
  final case class SessState(lastTs: Double, seq: Int)

  /** Streaming sessionization with explicit per-user state
    * (`flatMapGroupsWithState`): assumes per-user event-time order within
    * the stream (enforce upstream with a watermark + sort per micro-batch
    * if the source can reorder). State is O(1) per user — the 100 TB-stream
    * shape; `NoTimeout` keeps the demo deterministic, production would set
    * an event-time timeout to expire idle users. */
  def assignStream(events: Dataset[SessEvent], gapSec: Long): Dataset[SessOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user)
      .flatMapGroupsWithState[SessState, SessOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: String, batch: Iterator[SessEvent], state: GroupState[SessState]) =>
          var st = state.getOption.getOrElse(SessState(Double.NegativeInfinity, 0))
          val out = batch.toSeq.sortBy(e => (e.tsSec, e.eventId)).map { e =>
            val seq = if (e.tsSec - st.lastTs > gapSec) st.seq + 1 else st.seq
            st = SessState(e.tsSec, seq)
            SessOut(user, e.eventId, seq)
          }
          state.update(st)
          out.iterator
      }
  }

  /** Streaming event for [[assignStreamExpiring]]: a real timestamp column
    * so the source can carry a watermark. */
  final case class SessEventT(user: String, eventId: Long, ts: java.sql.Timestamp)

  /** Production variant of [[assignStream]]: `EventTimeTimeout` expires
    * idle users' state once the watermark passes `lastTs + gapSec` — the
    * state store stays bounded by ACTIVE users, not all users ever seen
    * (the unbounded-state leak `NoTimeout` tolerates for demo determinism).
    *
    * `events` must carry a watermark (`withWatermark` on `ts`) upstream —
    * Spark requires one for event-time timeouts. An expired user's next
    * event simply starts a new session: identical output to the
    * never-expire variant, because an over-gap event opens a new session
    * anyway — dropping the state changes memory, not semantics. (Only the
    * per-user `session_seq` counter restarts at 1, which is why sessions
    * are keyed `(user, session_start)` downstream, not by seq alone.) */
  def assignStreamExpiring(events: Dataset[SessEventT], gapSec: Long): Dataset[SessOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user)
      .flatMapGroupsWithState[SessState, SessOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: String, batch: Iterator[SessEventT], state: GroupState[SessState]) =>
          if (batch.isEmpty && state.hasTimedOut) {
            // watermark passed lastTs + gap with no new events: the session
            // can never continue — drop the state
            state.remove()
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(SessState(Double.NegativeInfinity, 0))
            val out = batch.toSeq.sortBy(e => (e.ts.getTime, e.eventId)).map { e =>
              val tsSec = e.ts.getTime / 1000.0
              val seq = if (tsSec - st.lastTs > gapSec) st.seq + 1 else st.seq
              st = SessState(tsSec, seq)
              SessOut(user, e.eventId, seq)
            }
            state.update(st)
            // round, don't truncate: lastTs round-tripped millis through a
            // double — truncation would fire the timeout 1ms early and split
            // a session whose next event lands exactly at the gap boundary
            state.setTimeoutTimestamp(math.round(st.lastTs * 1000) + gapSec * 1000)
            out.iterator
          }
      }
  }
}
