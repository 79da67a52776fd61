package graft.streaming

import graft.SparkSpec
import graft.operators.WindowOps
import org.apache.spark.sql.functions._
import java.nio.file.Files

class StatefulSessionsSpec extends SparkSpec {
  import sqlImplicits._

  test("stateful streaming sessions equal batch sessionize") {
    val dir = Files.createTempDirectory("graft_sess").toString
    val events = Seq(
      (1L, "2024-01-01 00:00:00"), (1L, "2024-01-01 00:10:00"),
      (1L, "2024-01-01 02:00:00"), // gap > 30min → new session
      (2L, "2024-01-01 01:00:00"))
      .toDF("user_id", "s").withColumn("ts", to_timestamp(col("s"))).drop("s")
    events.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")

    val streamed = StatefulSessions.sessionize(spark, s"$dir/events.parquet",
        fileGlob = "*.parquet", queryName = "graft_sess_test")
      .groupBy("user_id")
      .agg(count(lit(1)).cast("long").as("n_sessions"),
        sum("n_events").cast("long").as("n_events"))
      .orderBy("user_id").as[(Long, Long, Long)].collect().toSeq

    val batch = WindowOps.sessionize(
        spark.read.parquet(s"$dir/events.parquet"), Seq("user_id"),
        unix_micros(col("ts")), 1800L * 1000000L)
      .groupBy("user_id")
      .agg(max("session_idx").cast("long").as("n_sessions"),
        count(lit(1)).cast("long").as("n_events"))
      .orderBy("user_id").as[(Long, Long, Long)].collect().toSeq

    assert(streamed == batch)
    assert(streamed == Seq((1L, 2L, 3L), (2L, 1L, 1L)))
  }
}
