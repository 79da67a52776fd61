package graft.operators

import graft.SparkSpec
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

class DecontaminateSpec extends SparkSpec {
  import sqlImplicits._

  test("flags docs sharing >= tau of their 2-grams with the benchmark") {
    val bench = Seq((100L, "alpha beta gamma")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "alpha beta gamma delta"), // 2-grams: ab bg gd → 2/3 overlap
      (2L, "x y z w"),                // 0/3
      (3L, "alpha beta")).toDF("doc_id", "text") // 1/1
    val out = Corpus.decontaminate(corpus, bench, shingleN = 2, tau = 0.5)
      .as[(Long, Long, Long, Boolean)].collect().toSet
    assert(out == Set((1L, 3L, 2L, true), (2L, 3L, 0L, false),
      (3L, 1L, 1L, true)))
  }

  test("short docs yield zero shingles and are not contaminated") {
    val bench = Seq((9L, "a b c")).toDF("doc_id", "text")
    val corpus = Seq((1L, "solo")).toDF("doc_id", "text")
    val out = Corpus.decontaminate(corpus, bench, shingleN = 3, tau = 0.5)
      .as[(Long, Long, Long, Boolean)].head()
    assert(out == ((1L, 0L, 0L, false)))
  }

  test("scrubPii replaces emails and long digit runs, counts match") {
    val df = Seq(
      "contact me at a.b@x.io or 1234567 now",
      "no pii here 12345").toDF("text")
    val out = df.select(
      TextFunctions.scrubPii(col("text")).as("s"),
      TextFunctions.emailCount(col("text")).as("e"),
      TextFunctions.longNumCount(col("text")).as("n"))
      .as[(String, Int, Int)].collect()
    assert(out(0) == (("contact me at <EMAIL> or <NUM> now", 1, 1)))
    assert(out(1) == (("no pii here 12345", 0, 0))) // 5 digits: kept
  }
}
