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

  test("fuzzyDecontaminate catches a punctuation-perturbed eval clone " +
    "the exact-shingle gate misses") {
    // the corpus doc is the eval doc with punctuation drift on 4 of
    // its 31 tokens (spaced >= 4 apart): 16 of the 28 4-gram
    // shingles break (exact overlap 12/28 = 0.43 < tau) while the
    // token jaccard stays 23/31 = 0.74
    val evalText = ("the quick brown fox jumps over the lazy dog while " +
      "seventeen green turtles watch from the river bank and four " +
      "owls hoot in the old oak tree near the farm house")
    val cloneText = evalText
      .replace("fox", "fox,").replace("dog", "dog!")
      .replace("turtles", "turtles;").replace("tree", "tree.")
    val corpus = Seq((1L, cloneText), (2L, "totally unrelated words " +
      "about database engines and query planners only")).toDF("doc_id", "text")
    val bench = Seq((100L, evalText)).toDF("doc_id", "text")
    // H10 exact 4-gram gate at tau=0.5: the clone is NOT flagged
    val exact = Corpus.decontaminate(corpus, bench, shingleN = 4, tau = 0.5)
      .filter(col("doc_id") === 1L)
      .select("contaminated").as[Boolean].head()
    assert(!exact, "exact-shingle gate unexpectedly caught the clone")
    // fuzzy gate at jaccard 0.7 with narrow bands: flagged, and the
    // per-doc report pins the matching bench doc
    def md5int15(c: org.apache.spark.sql.Column) =
      conv(substring(md5(c), 1, 15), 16, 10).cast("long")
    def sketch(df: org.apache.spark.sql.DataFrame) = {
      val sh = sort_array(array_distinct(transform(
        TextFunctions.tokens(col("text")), t => md5int15(t))))
      df.select(col("doc_id").as("id"), sh.as("sh"))
        .filter(size(col("sh")) > 0)
        .withColumn("sig", transform(sequence(lit(0), lit(31)),
          j => array_min(transform(col("sh"), v =>
            md5int15(concat(v.cast("string"), lit("_"),
              j.cast("string")))))))
    }
    val out = Dedup.fuzzyDecontaminate(sketch(corpus), sketch(bench),
        threshold = 0.7, numHashes = 32, bands = 16)
      .orderBy("id")
      .as[(Long, Double, Option[Long], Boolean)].collect().toSeq
    val hit = out.head
    assert(hit._1 == 1L && hit._4, s"fuzzy gate missed the clone: $hit")
    assert(hit._3.contains(100L))
    assert(math.abs(hit._2 - 23.0 / 31.0) < 1e-12, s"jaccard off: $hit")
    assert(out(1) == ((2L, 0.0, None, false)))
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
