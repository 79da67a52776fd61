package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function operators: best-per-key dedup, lag deltas,
  * gap-based sessionization.
  *
  * reference analogs: proteofav/structures.py:399
  * (_remove_multiple_altlocs — keep the max-occupancy alternate
  * location per atom), variants.py:394 (sequence index maps —
  * sequential neighbour comparison), sifts.py:64 (region
  * segmentation — contiguous run grouping).
  */
object WindowOps {

  /** Loud-failure guard for DELIBERATELY-global windows (r18, the
    * [[OrderStats.boundedGroupRows]] contract at expression level):
    * the six global-Window sites in this codebase all operate on
    * inputs that are bounded by construction (per-stratum counts, a
    * ≤ nBuckets grouped table, one structure's atoms, one file's
    * lines), but nothing ASSERTED the bound — fed an unbounded table
    * they would silently single-partition the world. This wraps a
    * kept output column: `count(1)` over the same single-partition
    * frame (no extra exchange, no extra pass — the frame is already
    * global) feeds an `assert_true`, so the task fails with the
    * measured row count the moment the assumption breaks instead of
    * degrading. */
  private[graft] def guardedGlobalFrame(keep: Column, what: String,
                                        maxRows: Long): Column = {
    val n = count(lit(1)).over(Window.partitionBy())
    when(assert_true(n <= lit(maxRows),
      concat(lit(s"$what holds its input in ONE window partition and " +
        s"is bounded at $maxRows rows; got "), n.cast("string"),
        lit(" — repartition/regroup on a real key or raise the bound")))
      .isNull, keep)
  }

  /** Keep the single best row per key group: order by `ordering`,
    * take row 1. One shuffle; at 100 TB prefer this over
    * dropDuplicates because the ordering makes the survivor
    * deterministic. reference: proteofav/structures.py:399. */
  def keepBestPerKey(df: DataFrame, keys: Seq[String],
                     ordering: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordering: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Per-key previous-row delta on a monotonic bigint column (e.g.
    * epoch micros). Pass a tie-breaking ordering (e.g. ts, id) so the
    * previous row is deterministic. reference: proteofav/variants.py:394. */
  def lagDelta(df: DataFrame, keys: Seq[String], ordering: Seq[Column],
               valueCol: Column, as: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordering: _*)
    df.withColumn(as, valueCol - lag(valueCol, 1).over(w))
  }

  /** Rolling statistics over the trailing `nRows` rows per key
    * (smoothing / trailing-sum over an ordered series). Decimal
    * accumulation keeps the sum bit-stable across engines and
    * partitionings; one shuffle, same partitioning as the other
    * per-key windows so stacking stays shuffle-free. */
  def rollingStats(df: DataFrame, keys: Seq[String], ordering: Seq[Column],
                   valueCol: Column, nRows: Int): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordering: _*)
      .rowsBetween(-(nRows - 1), 0)
    df.withColumn("roll_sum",
        sum(valueCol.cast("decimal(28,2)")).over(w).cast("double"))
      .withColumn("roll_n", count(valueCol).over(w))
      .withColumn("roll_mean", col("roll_sum") / col("roll_n"))
  }

  /** Gap-based sessionization: a new session starts when the gap to
    * the previous event exceeds `gapMicros`. Two stacked windows
    * (lag → conditional cumulative sum), one shuffle total since both
    * share the same partitioning. reference: proteofav/sifts.py:64
    * (contiguous region segmentation). */
  def sessionize(df: DataFrame, keys: Seq[String], tsMicros: Column,
                 gapMicros: Long): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(tsMicros)
    val newSession = when(
      tsMicros - lag(tsMicros, 1).over(w) > gapMicros || lag(tsMicros, 1).over(w).isNull, 1
    ).otherwise(0)
    df.withColumn("__ts_us", tsMicros)
      .withColumn("session_idx",
        sum(newSession).over(w.rowsBetween(Window.unboundedPreceding, 0)))
  }

  /** SESSION TRANSCRIPT assembly — interaction logs rewritten as
    * conversation-style DOCUMENTS (the shape assistant session logs
    * and user-interaction traces take on the way into a training
    * mix): [[sessionize]] the event stream, then render each
    * session as one ordered transcript — `"<offset>s <event_type>
    * <cents>"` lines, offsets in whole seconds from session start,
    * `value` quantized to integer cents through ONE fixed IEEE tree
    * (floor(v·100 + 0.5) — a rendered DOUBLE would hash differently
    * across engines; integers never do).
    *
    * Shape: the per-session ordering happens INSIDE the aggregation
    * — `sort_array(collect_list(struct(ts, event_id, …)))` — so no
    * second window runs over the event stream; ties are impossible
    * by the (ts, event_id) struct prefix whatever the input layout.
    * Session state is bounded by the gap definition, not the
    * stream: one user's session is minutes of events, never the
    * whole history.
    *
    * @return (user_id, session_idx, n_turns, transcript)
    */
  def sessionTranscripts(events: DataFrame,
                         gapMicros: Long = 1800L * 1000000L): DataFrame = {
    val se = sessionize(events, Seq("user_id"),
      unix_micros(col("ts")), gapMicros)
    val cents = floor(col("value") * 100 + 0.5).cast("long")
    se.select(col("user_id"), col("session_idx"),
        struct(col("__ts_us").as("us"), col("event_id").as("eid"),
          col("event_type").as("et"), cents.as("cents")).as("t"))
      .groupBy("user_id", "session_idx")
      .agg(sort_array(collect_list(col("t"))).as("turns"))
      .select(col("user_id"),
        col("session_idx").cast("long").as("session_idx"),
        size(col("turns")).cast("long").as("n_turns"),
        array_join(transform(col("turns"), t =>
          concat(
            ((t.getField("us") -
              element_at(col("turns"), 1).getField("us")) /
              lit(1000000L)).cast("long").cast("string"),
            lit("s "), t.getField("et"), lit(" "),
            t.getField("cents").cast("string"))), "\n")
          .as("transcript"))
  }
}
