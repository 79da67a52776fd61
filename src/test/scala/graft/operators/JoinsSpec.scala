package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class JoinsSpec extends SparkSpec {
  import sqlImplicits._

  private def left = Seq((1, "x", 10), (2, "y", 20), (3, "x", 30))
    .toDF("id", "kk", "v")
  private def right = Seq((1, "x", "r1"), (3, "x", "r3"), (9, "z", "r9"))
    .toDF("rid", "rk", "tag")

  test("leftMerge keeps unmatched left rows") {
    val out = Joins.leftMerge(left, right,
      Seq("id" -> "rid", "kk" -> "rk"))
    assert(out.count() == 3)
    assert(out.filter(col("id") === 2).select("tag").head().isNullAt(0))
    assert(out.filter(col("id") === 1).select("tag").as[String].head() == "r1")
  }

  test("chainMerge folds pairwise merges") {
    val dim = Seq(("x", "X!"), ("y", "Y!")).toDF("dk", "dv")
    val out = Joins.chainMerge(left, Seq(
      (right, Seq("id" -> "rid", "kk" -> "rk")),
      (dim, Seq("kk" -> "dk"))))
    assert(out.count() == 3)
    assert(out.filter(col("id") === 2).select("dv").as[String].head() == "Y!")
  }

  test("broadcastDim inner join on dim key") {
    val out = Joins.broadcastDim(left, right.withColumnRenamed("rid", "did"),
      "id", "did")
    assert(out.count() == 2)
  }

  test("unionDedup") {
    val a = Seq(1, 2).toDF("k")
    val b = Seq(2, 3).toDF("k")
    assert(Joins.unionDedup(a, b).count() == 3)
  }

  test("semiJoin / antiJoin membership") {
    val ids = Seq(1, 3).toDF("mid")
    val semi = Joins.semiJoin(left, ids, Seq("id" -> "mid"))
    val anti = Joins.antiJoin(left, ids, Seq("id" -> "mid"))
    assert(semi.select("id").as[Int].collect().toSet == Set(1, 3))
    assert(anti.select("id").as[Int].collect().toSet == Set(2))
    assert(semi.columns.toSeq == left.columns.toSeq) // no right columns
  }

  test("leftMergeWithFallback prefers the alternate key when present") {
    val right = Seq((10, "hit")).toDF("rk", "tag")
    // alternate column present → used (orig chain maps to 10)
    val withAlt = Seq((1, 99, 10)).toDF("id", "k", "orig_k")
    val a = Joins.leftMergeWithFallback(withAlt, right,
      Seq(("k", Some("orig_k"), "rk")))
    assert(a.select("tag").as[String].head() == "hit")
    // alternate absent → primary used (k = 10 maps directly)
    val noAlt = Seq((1, 10)).toDF("id", "k")
    val b = Joins.leftMergeWithFallback(noAlt, right,
      Seq(("k", Some("orig_k"), "rk")))
    assert(b.select("tag").as[String].head() == "hit")
    // both missing → loud error, not a silent empty join
    val err = intercept[IllegalArgumentException] {
      Joins.leftMergeWithFallback(Seq(1).toDF("id"), right,
        Seq(("k", Some("orig_k"), "rk")))
    }
    assert(err.getMessage.contains("fallback"))
  }

  test("bloomPrefilter: zero false negatives, prefilter in the plan") {
    // spark.range probe (not a LocalRelation) so Catalyst can't
    // constant-fold the might_contain filter out of the plan
    val probe = spark.range(1, 2001).select(col("id").as("k"),
      concat(lit("p"), col("id")).as("pv"))
    val build = (1 to 2000 by 40).map(i => (i.toLong, "b")).toDF("bk", "bv")
    val pre = Joins.bloomPrefilter(probe, build, Seq("k" -> "bk"),
      expectedItems = 64L)
    // every true match survives the bloom (no false negatives) …
    val exact = Joins.semiJoin(probe, build, Seq("k" -> "bk"))
    assert(exact.join(pre, Seq("k"), "left_anti").count() == 0)
    // … and the sketch actually cuts the probe side (50 of 2000 keys
    // match; fpp at these sizes keeps survivors well under a quarter)
    val survivors = pre.count()
    assert(survivors >= exact.count() && survivors < 500,
      s"survivors=$survivors")
    // the prefilter is a codegen'd might_contain in the scan stage,
    // not a join
    val plan = pre.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan)
  }

  test("bloom key guard: resolver-consistent names pass, type mismatch fails") {
    val probe = Seq((1L, "x")).toDF("k", "v")
    val build = Seq((1L, "y")).toDF("bk", "w")
    // case-insensitive resolution (the session default) must work in
    // the guard exactly as it does in the join itself
    assert(Joins.bloomSemiJoin(probe, build, Seq("K" -> "BK")).count() == 1)
    val intBuild = Seq((1, "y")).toDF("bk", "w")
    val err = intercept[IllegalArgumentException] {
      Joins.bloomPrefilter(probe, intBuild, Seq("k" -> "bk"))
    }
    assert(err.getMessage.contains("type mismatch"))
  }

  test("bloomSemiJoin is exactly the semi join") {
    val probe = (1 to 500).map(i => (i.toLong, i % 7)).toDF("k", "v")
    val build = (1 to 500 by 3).map(i => (i.toLong, "x")).toDF("bk", "bv")
    val bloom = Joins.bloomSemiJoin(probe, build, Seq("k" -> "bk"),
      expectedItems = 256L)
    val exact = Joins.semiJoin(probe, build, Seq("k" -> "bk"))
    assert(bloom.columns.toSeq == probe.columns.toSeq)
    assert(bloom.collect().map(_.toSeq).toSet ==
      exact.collect().map(_.toSeq).toSet)
  }
}
