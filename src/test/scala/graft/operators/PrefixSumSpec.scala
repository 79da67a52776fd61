package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The range-partitioned running sum must be BIT-IDENTICAL to the
  * window form for any bucket count — the whole point of the
  * machinery is that boundaries only balance load. */
class PrefixSumSpec extends SparkSpec {
  import sqlImplicits._

  private def windowSum(df: DataFrame, parts: Seq[String]): DataFrame = {
    val base = if (parts.isEmpty) Window.orderBy(col("ck"), col("id"))
      else Window.partitionBy(parts.map(col): _*)
        .orderBy(col("ck"), col("id"))
    df.withColumn("run", sum(col("v"))
      .over(base.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  private def rangeSum(df: DataFrame, parts: Seq[String],
                       nBuckets: Int): DataFrame =
    PrefixSum.withRunningSum(df, parts, Seq(col("ck"), col("id")),
      col("ck"), col("v"), "run", nBuckets)

  private def sortedRows(df: DataFrame): Seq[(Long, Option[Long])] =
    df.select(col("id"), col("run")).as[(Long, Option[Long])]
      .collect().sortBy(_._1).toSeq

  test("grouped running sum equals the window form for every bucket count") {
    val rnd = new scala.util.Random(7)
    val df = (1L to 500L).map { i =>
      (i, s"g${rnd.nextInt(3)}", rnd.nextInt(20).toLong, rnd.nextInt(100).toLong)
    }.toDF("id", "g", "ck", "v")
    val expect = sortedRows(windowSum(df, Seq("g")))
    for (nb <- Seq(1, 2, 7, 64, 1000))
      assert(sortedRows(rangeSum(df, Seq("g"), nb)) == expect,
        s"nBuckets=$nb diverged from the window running sum")
  }

  test("ungrouped (driver-offset) path equals the window form, incl. ties") {
    // heavy ties in ck force boundary collisions into shared buckets
    val df = (1L to 300L).map(i => (i, i % 5, i % 13)).toDF("id", "ck", "v")
    val expect = sortedRows(windowSum(df, Seq.empty))
    for (nb <- Seq(1, 3, 16, 64))
      assert(sortedRows(rangeSum(df, Seq.empty, nb)) == expect,
        s"nBuckets=$nb diverged on the tied-key corpus")
  }

  test("null values keep SQL window-sum semantics (null until first value)") {
    val df = Seq(
      (1L, "a", 0L, None), (2L, "a", 0L, None), (3L, "a", 5L, Some(7L)),
      (4L, "a", 9L, None), (5L, "b", 1L, None), (6L, "b", 2L, Some(3L)))
      .toDF("id", "g", "ck", "v")
    val w = Window.partitionBy(col("g")).orderBy(col("ck"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expect = sortedRows(
      df.withColumn("run", sum(col("v")).over(w)))
    for (nb <- Seq(1, 2, 8)) {
      assert(sortedRows(rangeSum(df, Seq("g"), nb)) == expect,
        s"nBuckets=$nb broke null-prefix semantics")
      // rows 1,2 (all-null prefix) must be null, row 4 must carry 7
      val m = sortedRows(rangeSum(df, Seq("g"), nb)).toMap
      assert(m(1L).isEmpty && m(2L).isEmpty && m(4L).contains(7L))
    }
  }

  test("empty input and single-row input survive the quantile pass") {
    val empty = Seq.empty[(Long, Long, Long)].toDF("id", "ck", "v")
    assert(rangeSum(empty, Seq.empty, 8).count() == 0)
    val one = Seq((1L, 5L, 9L)).toDF("id", "ck", "v")
    assert(sortedRows(rangeSum(one, Seq.empty, 8)) ==
      Seq((1L, Some(9L))))
  }

  test("md5PrefixKey is monotone in md5-hex lexicographic order") {
    val df = (1L to 400L).toDF("id")
      .withColumn("hex", md5(col("id").cast("string")))
      .withColumn("k", PrefixSum.md5PrefixKey(col("id")))
    val rows = df.select("hex", "k").as[(String, Long)].collect()
      .sortBy(_._1)
    assert(rows.sliding(2).forall {
      case Array((_, a), (_, b)) => a <= b
      case _ => true
    })
    assert(rows.forall { case (_, k) => k >= 0 && k < (1L << 48) })
  }

  test("packSequencesByRange == packSequences (incl. tied lengths)") {
    val rnd = new scala.util.Random(11)
    val df = (1L to 400L).map(i => (i, 1L + rnd.nextInt(8).toLong))
      .toDF("doc_id", "n_tokens")
    val expect = Sampling.packSequences(df, "n_tokens", "doc_id", 16L)
      .select("doc_id", "n_tokens", "bin_id")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    for (nb <- Seq(1, 5, 64)) {
      val got = Sampling
        .packSequencesByRange(df, "n_tokens", "doc_id", 16L, nb)
        .select("doc_id", "n_tokens", "bin_id")
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
      assert(got == expect, s"nBuckets=$nb diverged from packSequences")
    }
  }

  test("tokenBudgetSampleByRange == tokenBudgetSample") {
    val rnd = new scala.util.Random(13)
    val df = (1L to 600L).map { i =>
      (i, s"src${rnd.nextInt(4)}", 1L + rnd.nextInt(30).toLong)
    }.toDF("doc_id", "source", "n_tokens")
    val expect = Sampling
      .tokenBudgetSample(df, "source", "doc_id", "n_tokens", 300L)
      .select("doc_id").as[Long].collect().sorted.toSeq
    for (nb <- Seq(1, 4, 64)) {
      val got = Sampling
        .tokenBudgetSampleByRange(df, "source", "doc_id", "n_tokens",
          300L, nb)
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(got == expect, s"nBuckets=$nb diverged from tokenBudgetSample")
    }
  }

  test("stratifiedSampleByRange == stratifiedSample (exact output size)") {
    val rnd = new scala.util.Random(17)
    val df = (1L to 700L).map { i =>
      (i, s"lang${rnd.nextInt(5)}")
    }.toDF("doc_id", "lang")
    val expect = Sampling.stratifiedSample(df, "lang", "doc_id", 90L)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(expect.size == 90)
    for (nb <- Seq(1, 6, 64)) {
      val got = Sampling
        .stratifiedSampleByRange(df, "lang", "doc_id", 90L, nb)
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(got == expect, s"nBuckets=$nb diverged from stratifiedSample")
    }
  }

  test("reserved-name collision fails loudly") {
    val df = Seq((1L, 1L, 1L)).toDF("id", "ck", "__bkt")
    val e = intercept[IllegalArgumentException] {
      PrefixSum.withRunningSum(df, Seq.empty, Seq(col("id")),
        col("ck"), col("ck"), "run")
    }
    assert(e.getMessage.contains("__bkt"))
  }
}
