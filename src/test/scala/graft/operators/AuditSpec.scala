package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AuditSpec extends SparkSpec {
  import sqlImplicits._

  test("kAnonymity sizes classes and flags small / homogeneous ones") {
    val df = Seq(
      // class (NY, 10001): 3 rows, 3 distinct salaries — safe both ways
      ("NY", 10001, 50.0), ("NY", 10001, 60.0), ("NY", 10001, 70.0),
      // class (NY, 10002): 2 rows, ONE salary — k-risky and l-risky
      ("NY", 10002, 80.0), ("NY", 10002, 80.0),
      // class (SF, 94110): singleton — k-risky AND trivially
      // l-homogeneous (one row can only carry one sensitive value)
      ("SF", 94110, 90.0)
    ).toDF("city", "zip", "salary")
    val out = Audit.kAnonymity(df, Seq("city", "zip"), "salary", k = 3)
      .orderBy("city", "zip")
      .select("city", "zip", "class_size", "l_distinct",
        "at_risk_k", "at_risk_l")
      .as[(String, Int, Long, Long, Boolean, Boolean)].collect().toSeq
    assert(out == Seq(
      ("NY", 10001, 3L, 3L, false, false),
      ("NY", 10002, 2L, 1L, true, true),
      ("SF", 94110, 1L, 1L, true, true)))
  }

  test("referentialIntegrity counts orphans, null fks, and exact ppm") {
    val child = Seq(Some(1L), Some(1L), Some(2L), Some(9L), None)
      .toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val row = Audit.referentialIntegrity("c->p", child, "fk", parent, "pk")
      .as[(String, Long, Long, Long, Long, Long)].head()
    // 5 children, 1 null fk, 1 orphan row (9) over 4 non-null fks
    // -> floor(1e6 / 4) = 250000 ppm
    assert(row == (("c->p", 5L, 1L, 1L, 1L, 250000L)))
  }

  test("referentialIntegrity on an intact edge reports zero orphans") {
    val child = Seq(1L, 2L, 2L).toDF("fk")
    val parent = Seq(1L, 2L).toDF("pk")
    val row = Audit.referentialIntegrity("ok", child, "fk", parent, "pk")
      .as[(String, Long, Long, Long, Long, Long)].head()
    assert(row == (("ok", 3L, 0L, 0L, 0L, 0L)))
  }

  test("halfLifeScore halves per elapsed half-life and clamps the age") {
    // asOf = 4 000 000 us; half-life = 1 000 000 us
    val df = Seq(
      ("u", 4000000L, 8.0),  // age 0      -> k=0 -> 8e6 ticks
      ("u", 3000000L, 8.0),  // age 1 HL   -> k=1 -> 4e6
      ("u", 1000000L, 8.0),  // age 3 HL   -> k=3 -> 1e6
      ("u", 9000000L, 8.0),  // FUTURE     -> clamped k=0 -> 8e6
      ("v", 3999999L, 2.0)   // age < 1 HL -> k=0 -> 2e6
    ).toDF("key", "us", "value")
      .withColumn("ts", timestamp_micros(col("us")))
    val out = TimeOps.halfLifeScore(df, "key", "ts", "value",
        halfLifeMicros = 1000000L, asOfUs = 4000000L)
      .orderBy("key")
      .select("key", "n_events", "decayed_ticks")
      .as[(String, Long, Long)].collect().toSeq
    assert(out == Seq(("u", 4L, 21000000L), ("v", 1L, 2000000L)))
  }

  test("halfLifeScore caps the exponent at 62 instead of overflowing") {
    val df = Seq(("u", 0L, 1e18))
      .toDF("key", "us", "value")
      .withColumn("ts", timestamp_micros(col("us")))
    // asOf 200 half-lives later: k clamps to 62, weight 2^-62 — the
    // tick floors to 0 here, but the shift itself must stay in-range
    val out = TimeOps.halfLifeScore(df, "key", "ts", "value",
        halfLifeMicros = 1000L, asOfUs = 200000L)
      .select("decayed_ticks").as[Long].head()
    assert(out == math.floor(1e6 * 1e18 / math.pow(2, 62)).toLong)
  }

  test("benfordProfile: digit census, zero-fill, baked expectation") {
    // 111, 19, 150 -> digit 1 x3; 25 -> 2; 0.5 excluded (|v| < 1)
    val df = Seq(111.0, 19.0, 150.0, 25.0, 0.5).toDF("v")
    val out = Audit.benfordProfile(df, "v")
      .orderBy("digit")
      .select("digit", "n", "obs_ppm", "benford_ppm", "dev_ppm")
      .as[(Int, Long, Long, Long, Long)].collect().toSeq
    assert(out.size == 9)
    assert(out.head == ((1, 3L, 750000L, 301029L, 448971L)))
    assert(out(1)._2 == 1L && out(1)._3 == 250000L)
    // digits 3..9 present with n = 0 and dev = their benford ppm
    assert(out.drop(2).forall(r => r._2 == 0L && r._5 == r._4))
    // the baked table is the closed-form log10 floor
    assert(Audit.benfordTicks.head == ((1, 301029L)))
    assert(Audit.benfordTicks.map(_._2).sum <= 1000000L)
  }
}
