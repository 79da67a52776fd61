package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming over the events table.
  *
  * The same tumbling-window aggregation as the batch path, expressed
  * as a stream: file source → watermark → windowed agg → memory sink,
  * driven to completion with availableNow (batch-equivalent result,
  * streaming execution). On a cluster this runs continuously with the
  * same plan; state is bounded by the watermark.
  */
object EventStreams {

  /** Windowed count+sum per event_type over a parquet events path,
    * executed as a streaming query and returned as the final batch
    * result. Output: window_start_us, event_type, n, sum_value. */
  def windowedCounts(spark: SparkSession, eventsPath: String,
                     windowDur: String = "15 minutes",
                     queryName: String = "graft_stream_window"): DataFrame = {
    val schema = spark.read.parquet(eventsPath).schema
    val stream = spark.readStream.schema(schema).parquet(eventsPath)
    val agg = stream
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), windowDur), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(28,2)")).as("sum_dec"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("event_type"), col("n"),
        col("sum_dec").cast("double").as("sum_value"))
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }
}
