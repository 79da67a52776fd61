package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WindowOpsSpec extends SparkSpec {
  import sqlImplicits._

  test("guardedGlobalFrame: passthrough under the bound, loud over it") {
    val df = Seq(1L, 2L, 3L).toDF("v")
    val w = org.apache.spark.sql.expressions.Window.orderBy("v")
    val rn = row_number().over(w)
    // under the bound: values pass through unchanged
    val ok = df.withColumn("r",
        WindowOps.guardedGlobalFrame(rn, "test frame", 3L))
      .select("r").as[Int].collect().sorted
    assert(ok.toSeq == Seq(1, 2, 3))
    // over the bound: the task raises with the measured count
    val err = intercept[Exception] {
      df.withColumn("r",
          WindowOps.guardedGlobalFrame(rn, "test frame", 2L))
        .collect()
    }
    val msg = Option(err.getMessage).getOrElse("") +
      Option(err.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("bounded at 2") && msg.contains("got 3"), msg)
  }

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

  test("sessionTranscripts: gap split, second offsets, cents, order") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000L)
    // user 7: three events in one session (0s, 5s, 65s), then a
    // 31-minute gap opens session 2; user 8: one event
    val events = Seq(
      // cents: 1.005·100 = 100.4999… in IEEE (1.005 has no exact
      // double), +0.5 floors to 100 — the FIXED tree is the
      // contract, not decimal rounding folklore
      (1L, ts(100), 7L, "view", 1.005),
      (2L, ts(105), 7L, "click", 2.0),
      (3L, ts(165), 7L, "buy", 9.99),
      (4L, ts(165 + 31 * 60), 7L, "view", 0.0),
      (5L, ts(500), 8L, "signup", 50.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = WindowOps.sessionTranscripts(events)
      .as[(Long, Long, Long, String)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got((7L, 1L)) ==
      ((3L, "0s view 100\n5s click 200\n65s buy 999")))
    assert(got((7L, 2L)) == ((1L, "0s view 0")))
    assert(got((8L, 1L)) == ((1L, "0s signup 5000")))
    assert(got.size == 3)
    // layout independence: the in-aggregation sort decides order
    val scrambled = WindowOps.sessionTranscripts(events.repartition(5))
      .as[(Long, Long, Long, String)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(scrambled == got)
  }
}
