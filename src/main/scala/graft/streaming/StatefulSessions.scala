package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Custom stateful streaming: gap-based sessionization with
  * `flatMapGroupsWithState` — per-user session state survives across
  * micro-batches, closed sessions stream out as they close.
  *
  * The batch twin is operators/WindowOps.sessionize (same gap
  * semantics); this is the continuous form: state per user is one
  * open session (start, last ts, count) — O(users), not O(events).
  * reference analog: proteofav/sifts.py:64 (contiguous region
  * segmentation), recast as unbounded-stream state.
  */
object StatefulSessions {

  case class Event(user_id: Long, ts_us: Long)
  case class OpenSession(startUs: Long, lastUs: Long, n: Long)
  case class Session(user_id: Long, session_start_us: Long,
                     session_end_us: Long, n_events: Long, closed: Boolean)

  /** Per-group state transition: sort the micro-batch's events,
    * extend or close sessions on gaps > gapMicros. Emits closed
    * sessions plus (for availableNow verification) the still-open
    * one flagged `closed = false`. */
  private[graft] def step(gapMicros: Long)(
      userId: Long, events: Iterator[Event],
      state: GroupState[OpenSession]): Iterator[Session] = {
    val sorted = events.map(_.ts_us).toArray.sorted
    var out = List.empty[Session]
    var cur = state.getOption
    sorted.foreach { ts =>
      cur match {
        case Some(s) if ts - s.lastUs <= gapMicros =>
          cur = Some(s.copy(lastUs = ts, n = s.n + 1))
        case Some(s) =>
          out ::= Session(userId, s.startUs, s.lastUs, s.n, closed = true)
          cur = Some(OpenSession(ts, ts, 1))
        case None =>
          cur = Some(OpenSession(ts, ts, 1))
      }
    }
    cur.foreach(state.update)
    // open session emitted un-closed so a finite run reports it too;
    // downstream can filter on `closed` for the pure streaming view
    (out.reverse ++ cur.map(s =>
      Session(userId, s.startUs, s.lastUs, s.n, closed = false))).iterator
  }

  /** Run gap sessionization over a parquet events directory as a
    * stream; returns the final update-mode table. */
  def sessionize(spark: SparkSession, eventsDir: String,
                 fileGlob: String = "events.parquet",
                 gapMicros: Long = 1800L * 1000000L,
                 queryName: String = "graft_sessions"): DataFrame = {
    import spark.implicits._
    val schema = spark.read
      .option("pathGlobFilter", fileGlob).parquet(eventsDir).schema
    val stream = graft.sources.Tables.normalizeNanoTs(
      spark.readStream.schema(schema)
        .option("pathGlobFilter", fileGlob).parquet(eventsDir))
    val events: Dataset[Event] = stream
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"))
      .as[Event]
    val sessions = events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(step(gapMicros))
    spark.catalog.dropTempView(queryName) // rerun-safe
    EventStreams.withStatefulShuffle(spark) {
      val q = sessions.writeStream
        .outputMode("update")
        .format("memory")
        .queryName(queryName)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    spark.table(queryName)
  }
}
