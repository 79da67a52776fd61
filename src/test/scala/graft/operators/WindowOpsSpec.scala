package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WindowOpsSpec extends SparkSpec {
  import sqlImplicits._

  test("keepBestPerKey keeps deterministic best row") {
    val df = Seq(("a", 1, 0.5), ("a", 2, 0.9), ("a", 3, 0.9), ("b", 4, 0.1))
      .toDF("k", "id", "occ")
    val out = WindowOps.keepBestPerKey(df, Seq("k"),
      Seq(col("occ").desc, col("id").asc))
    assert(out.count() == 2)
    // ties on occ broken by id asc → id=2 survives
    assert(out.filter(col("k") === "a").select("id").as[Int].head() == 2)
  }

  test("lagDelta computes per-key deltas") {
    val df = Seq(("u", 100L, 1L), ("u", 150L, 2L), ("v", 10L, 3L))
      .toDF("k", "ts", "id")
    val out = WindowOps.lagDelta(df, Seq("k"),
      Seq(col("ts"), col("id")), col("ts"), "d")
    val rows = out.orderBy("id").select("d").as[Option[Long]].collect().toSeq
    assert(rows == Seq(None, Some(50L), None))
  }

  test("sessionize splits on gap") {
    val df = Seq(
      ("u", 0L), ("u", 60L), ("u", 1000L), ("u", 1030L), ("v", 5L)
    ).toDF("k", "ts")
    val out = WindowOps.sessionize(df, Seq("k"), col("ts"), gapMicros = 100L)
    val sessions = out.filter(col("k") === "u")
      .orderBy("ts").select("session_idx").as[Long].collect().toSeq
    assert(sessions == Seq(1L, 1L, 2L, 2L))
    assert(out.filter(col("k") === "v")
      .select("session_idx").as[Long].head() == 1L)
  }

  test("rollingStats trailing window sums and means") {
    val df = Seq(("u", 1L, 10.0), ("u", 2L, 20.0), ("u", 3L, 30.0),
      ("u", 4L, 40.0)).toDF("k", "t", "v")
    val out = WindowOps.rollingStats(df, Seq("k"), Seq(col("t")),
        col("v"), nRows = 2)
      .orderBy("t").select("roll_sum", "roll_n", "roll_mean")
      .as[(Double, Long, Double)].collect().toSeq
    assert(out == Seq((10.0, 1L, 10.0), (30.0, 2L, 15.0),
      (50.0, 2L, 25.0), (70.0, 2L, 35.0)))
  }
}
