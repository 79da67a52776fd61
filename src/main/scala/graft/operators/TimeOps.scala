package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Batch time-window aggregation — the batch twin of
  * streaming/EventStreams. reference analog: per-interval collapse of
  * time/sequence-indexed observations (proteofav/sifts.py:64 region
  * segmentation; the events table is the driver's time-series).
  */
object TimeOps {

  /** Epoch-microsecond tumbling-window bucket start. Pure integer
    * arithmetic (`div`) — engine-portable and exact, unlike
    * float-division + floor at 1e15 magnitudes. */
  def windowStartUs(ts: Column, windowMicros: Long): Column =
    call_function("div", unix_micros(ts), lit(windowMicros)) * windowMicros

  /** Tumbling-window count + decimal-exact sum per (window, key).
    * Single hash aggregation; map-side partial combine makes the
    * shuffle carry |windows × keys| states only.
    * Output: window_start_us, <keys...>, n, sum_value. */
  def tumblingAgg(df: DataFrame, tsCol: String, keys: Seq[String],
                  valueCol: String, windowMicros: Long): DataFrame =
    df.groupBy((windowStartUs(col(tsCol), windowMicros).as("window_start_us")
        +: keys.map(col)): _*)
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast(DecimalType(28, 2))).cast("double").as("sum_value"))

  /** Sliding (overlapping) window count + decimal-exact sum per
    * (window, key): each event lands in width/slide windows. Uses
    * Spark's native `window(ts, width, slide)` — the multi-window
    * replication is a codegen'd generator in the scan stage, then one
    * hash aggregation whose shuffle carries |windows × keys| states;
    * no self-join, no range join. Requires width to be a multiple of
    * slide (the standard hopping-window contract).
    * Output: window_start_us, <keys...>, n, sum_value. */
  def slidingAgg(df: DataFrame, tsCol: String, keys: Seq[String],
                 valueCol: String, widthMicros: Long, slideMicros: Long)
  : DataFrame = {
    require(widthMicros % slideMicros == 0,
      "width must be a multiple of slide")
    df.groupBy((window(col(tsCol), s"$widthMicros microseconds",
        s"$slideMicros microseconds").as("w") +: keys.map(col)): _*)
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast(DecimalType(28, 2))).cast("double")
          .as("sum_value"))
      .select((unix_micros(col("w.start")).as("window_start_us")
        +: keys.map(col)) ++ Seq(col("n"), col("sum_value")): _*)
  }
}
