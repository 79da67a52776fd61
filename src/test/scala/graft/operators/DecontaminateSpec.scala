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

  test("bloom path: bit-identical to the broadcast path, no bench broadcast") {
    // 60 docs, ~1/3 overlapping the benchmark — enough shingle
    // volume that a dropped overlap or a surviving false positive
    // would move a count
    val corpus = (1L to 60L).map(i =>
      (i, if (i % 3 == 0) s"alpha beta gamma delta doc$i extra words here"
          else s"unique$i text$i nothing$i shared$i at$i all$i"))
      .toDF("doc_id", "text")
    val bench = Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val broad = Corpus.decontaminate(corpus, bench, shingleN = 3, tau = 0.2)
    val bloom = Corpus.decontaminate(corpus, bench, shingleN = 3, tau = 0.2,
      broadcastBench = false)
    assert(broad.except(bloom).isEmpty && bloom.except(broad).isEmpty,
      "bloom path diverged from the broadcast path")
    // plan pin: the sketch prefilter is present and the exact
    // overlap join is NOT a broadcast of the bench side
    bloom.collect()
    val p = bloom.queryExecution.executedPlan.toString
    assert(p.contains("might_contain") || p.contains("BloomFilterMightContain"),
      s"bloom prefilter missing from the plan:\n$p")
    assert(p.contains("ShuffledHashJoin"),
      s"exact overlap join not the shuffle-hash shape:\n$p")
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
