package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AggregationsSpec extends SparkSpec {
  import sqlImplicits._

  test("decAvg ignores nulls (pandas/DuckDB semantics)") {
    val df = Seq(("g", Some(1.0)), ("g", Some(3.0)), ("g", None))
      .toDF("k", "v")
    val out = df.groupBy("k").agg(Aggregations.decAvg(col("v")).as("a"))
    assert(out.select("a").as[Double].head() == 2.0) // not 4/3
  }

  test("centroid keeps coordinate precision at scale 6") {
    val df = Seq(("r1", 1.000001, 2.0), ("r1", 1.000003, 4.0))
      .toDF("res", "x", "y")
    val out = Aggregations.centroid(df, Seq("res"), Seq("x", "y"))
    val row = out.head()
    assert(math.abs(row.getAs[Double]("x_centroid") - 1.000002) < 1e-9)
    assert(row.getAs[Double]("y_centroid") == 3.0)
    assert(row.getAs[Long]("n") == 2L)
  }

  test("firstPerGroup deterministic under ordering") {
    val df = Seq((1, 2, "b"), (1, 1, "a"), (2, 5, "c")).toDF("g", "o", "v")
    val out = Aggregations.firstPerGroup(df, Seq("g"), Seq(col("o")))
    assert(out.filter(col("g") === 1).select("v").as[String].head() == "a")
  }

  test("orderedConcat concatenates in order-col order") {
    val df = Seq((1, 3, "C"), (1, 1, "A"), (1, 2, "B")).toDF("g", "o", "v")
    val out = df.groupBy("g").agg(Aggregations.orderedConcat("o", "v").as("s"))
    assert(out.select("s").as[String].head() == "ABC")
  }

  test("completeGroups filters on group predicate") {
    val df = Seq((1, "a"), (1, "b"), (2, "c")).toDF("g", "v")
    val out = Aggregations.completeGroups(df, Seq("g"), col("n_members") >= 2)
    assert(out.select("g").as[Int].collect().toSeq == Seq(1))
  }

  test("pricingSummary decimal-exact sums") {
    val df = Seq(
      ("A", "F", 10.0, 100.0, 0.10, 0.05),
      ("A", "F", 20.0, 200.0, 0.20, 0.00)
    ).toDF("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
      "l_discount", "l_tax")
    val r = Aggregations.pricingSummary(df).head()
    assert(r.getAs[Double]("sum_qty") == 30.0)
    assert(r.getAs[Double]("sum_base_price") == 300.0)
    // 100*0.9 + 200*0.8 = 250; charge = 90*1.05 + 160*1.0 = 254.5
    assert(r.getAs[Double]("sum_disc_price") == 250.0)
    assert(r.getAs[Double]("sum_charge") == 254.5)
    assert(r.getAs[Double]("avg_qty") == 15.0)
    assert(r.getAs[Long]("count_order") == 2L)
  }

  test("histogram clamps out-of-range values into edge bins") {
    val df = Seq(("a", -3.0), ("a", 0.0), ("a", 4.9), ("a", 5.0),
      ("a", 47.0), ("a", 999.0)).toDF("k", "v")
    val out = Aggregations.histogram(df, "v", Seq("k"),
        lo = 0.0, width = 5.0, nBins = 10)
      .select("bin", "n", "bin_lo").as[(Long, Long, Double)]
      .collect().toSet
    // -3 clamps to bin 0; 47 and 999 clamp to bin 9; 5.0 is bin 1
    assert(out == Set((0L, 3L, 0.0), (1L, 1L, 5.0), (9L, 2L, 45.0)))
  }

  test("histogram drops null values instead of binning them at 0") {
    val df = Seq(("a", Some(1.0)), ("a", None), ("a", None))
      .toDF("k", "v")
    val out = Aggregations.histogram(df, "v", Seq("k"),
        lo = 0.0, width = 5.0, nBins = 10)
      .select("bin", "n").as[(Long, Long)].collect().toSet
    assert(out == Set((0L, 1L)))
  }

  test("columnStats: one table pass, nulls excluded from ndv/extremes") {
    val df = Seq[(java.lang.Double, java.lang.Double)](
      (1.0, 10.0), (2.0, 10.0), (2.0, null), (null, 40.0))
      .toDF("a", "b")
    val got = Aggregations.columnStats(df, Seq("a", "b"))
      .collect().map(r => r.getString(0) -> r).toMap
    val a = got("a")
    assert((a.getLong(1), a.getLong(2), a.getLong(3)) == ((4L, 1L, 2L)))
    assert((a.getDouble(4), a.getDouble(5)) == ((1.0, 2.0)))
    assert(a.getDouble(7) == 2.0) // p50 of (1, 2, 2)
    val b = got("b")
    assert((b.getLong(2), b.getLong(3)) == ((1L, 2L)))
    assert((b.getDouble(4), b.getDouble(5)) == ((10.0, 40.0)))
    // the scale claim: NO multi-distinct Expand anywhere (the trap
    // that funnels the whole table through one reducer — measured
    // 16.4 s vs 1.4 s at sf0.1), and every per-leg scan prunes to
    // at most one profiled column
    val dir = java.nio.file.Files.createTempDirectory("graft_stats").toString
    df.write.mode("overwrite").parquet(dir)
    val plan = Aggregations.columnStats(
      spark.read.parquet(dir), Seq("a", "b"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"),
      s"multi-distinct expand crept back in:\n$plan")
    // exactly ONE scan reads all profiled columns (the base pass);
    // every ndv/percentile leg prunes to its single column
    assert("struct<a:double,b:double>".r.findAllIn(plan).length == 1,
      s"leg scans stopped pruning (or base duplicated):\n$plan")
  }

  test("columnStats sketched: equals the exact quartiles while the " +
      "column fits the sketch's exact regime") {
    import sqlImplicits._
    // 101 values 0..100: (n−1)·q integral → the exact path's
    // interpolation lands on data points, and n < the KLL level-0
    // capacity (k=200) → the sketch is EXACT, so the two forms must
    // agree bit-for-bit here
    val df = (0 to 100).map(i => (i.toDouble, (100 - i).toDouble))
      .toDF("a", "b")
    def quarts(sk: Boolean) =
      Aggregations.columnStats(df, Seq("a", "b"), sketched = sk)
        .select("column", "p25", "p50", "p75")
        .as[(String, Double, Double, Double)].collect().toSet
    assert(quarts(sk = true) == quarts(sk = false))
    assert(quarts(sk = true) ==
      Set(("a", 25.0, 50.0, 75.0), ("b", 25.0, 50.0, 75.0)))
  }

  test("columnStats: column names needing quoting survive the " +
      "percentile SQL round-trip") {
    val df = Seq((1.0, 2.0), (3.0, 4.0))
      .toDF("my col", "a-b.c")
    val got = Aggregations.columnStats(df, Seq("my col", "a-b.c"))
      .collect().map(r => r.getString(0) -> r.getDouble(7)).toMap
    assert(got("my col") == 2.0 && got("a-b.c") == 3.0)
  }

  test("chiSquare: independent table near zero, perfect association high") {
    import sqlImplicits._
    // perfectly associated 2x2: a1 only with b1, a2 only with b2
    val assoc = Seq.fill(5)(("a1", "b1")) ++ Seq.fill(5)(("a2", "b2"))
    val r1 = Aggregations.chiSquare(assoc.toDF("x", "y"), "x", "y")
      .select("n", "dof", "chi2_ticks", "cramers_v2_ppm")
      .as[(Long, Long, Long, Long)].head()
    // chi2 = n = 10 for a perfect 2x2 -> 1e7 ticks; V^2 = 1 -> 1e6
    assert(r1 == ((10L, 1L, 10000000L, 1000000L)))
    // perfectly independent 2x2 (counts proportional): chi2 = 0
    val indep = Seq.fill(4)(("a1", "b1")) ++ Seq.fill(2)(("a1", "b2")) ++
      Seq.fill(2)(("a2", "b1")) ++ Seq.fill(1)(("a2", "b2"))
    val r2 = Aggregations.chiSquare(indep.toDF("x", "y"), "x", "y")
      .select("chi2_ticks").as[Long].head()
    // not exactly proportional (4:2 vs 2:1 IS proportional) -> 0
    assert(r2 == 0L, s"expected 0 ticks, got $r2")
  }
}
