package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the events table
  * (event_id, ts, user_id, event_type, value, props).
  *
  * The reference is batch-only (SURVEY.md §2.8) — these are the
  * training-pipeline streaming utilities: watermarked windowed aggregation
  * and custom sessionization state. Each transform is defined on a plain
  * DataFrame so the same code runs in batch (for the DuckDB oracle) and
  * under readStream (tested with the memory sink).
  */
object EventStreams {

  /** Tumbling-window counts/sums per event type. Works identically on
    * batch and streaming inputs; callers add withWatermark for streams.
    */
  def windowedCounts(events: DataFrame, windowLen: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("total"))

  /** Streaming variant with a watermark (late data beyond `late` dropped). */
  def windowedCountsStream(events: DataFrame, windowLen: String = "1 hour",
                           late: String = "30 minutes"): DataFrame =
    // parquet timestamps surface as TIMESTAMP_NTZ; event-time watermarks
    // require TIMESTAMP
    windowedCounts(events.withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", late), windowLen)

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                   event_type: String, value: Double)

  case class Session(user_id: Long, n_events: Int, start_ms: Long, end_ms: Long)

  /** Batch gap-sessionization via window functions: a new session starts
    * after more than `gapSec` of per-user silence; session ids are the
    * running count of session starts. Exact ANSI-SQL-expressible semantics
    * (mirrors the DuckDB oracle) with a deterministic (ts, event_id) order.
    *
    * This is the BATCH surface: the streaming `sessionize` below never
    * emits its trailing open session under batch execution (its
    * processing-time timeout cannot fire and final state is discarded), so
    * batch callers must use this one.
    *
    * Scale note: the window partitions by user_id, so one pathological
    * user's full history lands in a single task (sessionization is
    * inherently per-user sequential). At web scale, pre-filter bot-grade
    * users (count > threshold) before sessionizing, or bound history by a
    * time window — both compose as plain filters in front of this operator.
    *
    * @return (user_id, session_id, n_events, start_s, end_s) — integers
    *         only (epoch seconds), hash-stable across engines
    */
  def sessionizeBatch(events: DataFrame, gapSec: Long = 1800): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("es"), col("event_id"))
    events
      .select(col("user_id"), col("event_id"),
        unix_seconds(col("ts").cast("timestamp")).as("es"))
      .withColumn("ns",
        when(lag("es", 1).over(w).isNull ||
          col("es") - lag("es", 1).over(w) > gapSec, 1).otherwise(0))
      .withColumn("sid",
        sum("ns").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sid").as("session_id"))
      .agg(count(lit(1)).as("n_events"), min("es").as("start_s"), max("es").as("end_s"))
  }

  /** Gap-based sessionization with flatMapGroupsWithState: a user's session
    * closes after `gapMs` of silence (processing-time timeout drives
    * emission in streams). STREAMING-ONLY: in batch execution the trailing
    * open session per user is never emitted — use sessionizeBatch there.
    */
  def sessionize(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[Session, Session](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        (uid: Long, evs: Iterator[Event], state: GroupState[Session]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.toSeq
            state.remove()
            out.iterator
          } else {
            val sorted = evs.toSeq.sortBy(_.ts.getTime)
            var cur = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.end_ms <= gapMs =>
                  cur = Some(s.copy(n_events = s.n_events + 1, end_ms = t))
                case Some(s) =>
                  closed += s
                  cur = Some(Session(uid, 1, t, t))
                case None =>
                  cur = Some(Session(uid, 1, t, t))
              }
            }
            cur.foreach(state.update)
            state.setTimeoutDuration(gapMs)
            closed.result().iterator
          }
      }
  }
}
