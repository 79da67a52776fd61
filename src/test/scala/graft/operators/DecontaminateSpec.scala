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

  test("fuzzyDecontaminate: the bench-too-big (shuffle-hash) form is " +
    "bit-identical to the broadcast form and actually shuffle-joins") {
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
    val rnd = new scala.util.Random(83)
    val words = (1 to 40).map(i => s"w$i")
    def doc(n: Int) =
      (1 to 30).map(_ => words(rnd.nextInt(words.size))).mkString(" ")
    val corpus = (1L to 60L).map(i => (i, doc(30))).toDF("doc_id", "text")
    val bench = (101L to 115L).map(i => (i, doc(30))).toDF("doc_id", "text")
    val cs = sketch(corpus).localCheckpoint()
    val bs = sketch(bench).localCheckpoint()
    // the big-bench form FIRST (the cache manager canonicalizes
    // hints away, so whichever form materializes first serves the
    // other from cache — the plan assertion must run on a fresh
    // plan), with the real regime modeled: AQE would re-broadcast a
    // test-sized bench, hiding the join shape the hint requests
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val prev = keys.map(k => k -> spark.conf.getOption(k))
    keys.foreach(k => spark.conf.set(k, "-1"))
    val b = try {
      val b0 = Dedup.fuzzyDecontaminate(cs, bs, 0.5, 32, 16,
        broadcastBench = false)
      val p = b0.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(p.contains("ShuffledHashJoin"),
        s"big-bench form must shuffle-hash, not broadcast:\n$p")
      assert(!p.contains("BroadcastHashJoin"), p)
      b0.collect().map(_.toSeq).toSet
    } finally prev.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
    val a = Dedup.fuzzyDecontaminate(cs, bs, 0.5, 32, 16)
    assert(a.collect().map(_.toSeq).toSet == b)
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
