package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EvalSpec extends SparkSpec {
  import sqlImplicits._

  test("rougeN clips repeated n-grams against the reference multiset") {
    // cand has 'the cat' TWICE; ref only once — clipping must count 1
    val pairs = Seq((1L, "the cat the cat sat", "the cat sat on mat"))
      .toDF("id", "cand", "ref")
    val out = Eval.rougeN(pairs, "id", "cand", "ref", Seq(1, 2))
      .orderBy("n")
      .select("n", "overlap", "cand_total", "ref_total",
        "p_ticks", "r_ticks", "f_ticks")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    // unigrams: min(2,1)+min(2,1)+min(1,1) = 3 of 5 -> 0.6 all around
    // bigrams: 'the cat' clips to 1, 'cat sat' matches -> 2 of 4
    assert(out == Seq(
      (1L, 3L, 5L, 5L, 600000L, 600000L, 600000L),
      (2L, 2L, 4L, 4L, 500000L, 500000L, 500000L)))
  }

  test("rougeN guards zero-gram sides instead of dividing") {
    // 1-token candidate has NO bigrams; empty ref has no tokens at all
    val pairs = Seq((1L, "word", "word more text"), (2L, "a b", ""))
      .toDF("id", "cand", "ref")
    val out = Eval.rougeN(pairs, "id", "cand", "ref", Seq(2))
      .orderBy("id")
      .select("id", "overlap", "cand_total", "ref_total",
        "p_ticks", "r_ticks", "f_ticks")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 0L, 0L, 2L, 0L, 0L, 0L),
      (2L, 0L, 1L, 0L, 0L, 0L, 0L)))
  }

  test("rougeN F1 is the exact harmonic mean at unequal P/R") {
    // cand 2 tokens both in ref; ref 4 tokens -> P=1, R=0.5, F=2/3
    val pairs = Seq((1L, "a b", "a b c d")).toDF("id", "cand", "ref")
    val row = Eval.rougeN(pairs, "id", "cand", "ref", Seq(1))
      .select("p_ticks", "r_ticks", "f_ticks")
      .as[(Long, Long, Long)].head()
    assert(row == ((1000000L, 500000L,
      math.floor(1e6 * (2.0 * 1.0 * 0.5) / 1.5).toLong)))
  }

  test("bleuKernel scores an identical corpus at exactly 1e12 ticks") {
    val pairs = Seq((1L, "a b c d", "a b c d")).toDF("id", "cand", "ref")
    val row = Eval.bleuKernel(pairs, "id", "cand", "ref")
      .select("p1_ticks", "p4_ticks", "bp_ticks", "bleu_ticks")
      .as[(Long, Long, Long, Long)].head()
    assert(row == ((1000000L, 1000000L, 1000000L, 1000000000000L)))
  }

  test("bleuKernel: truncated reference zeroes the high orders") {
    val pairs = Seq((1L, "a b c d", "a b")).toDF("id", "cand", "ref")
    val row = Eval.bleuKernel(pairs, "id", "cand", "ref")
      .select("clip_1", "tot_1", "clip_2", "tot_2", "clip_3",
        "p1_ticks", "p2_ticks", "p3_ticks", "bp_ticks", "bleu_ticks")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .head()
    // p1 = 2/4, p2 = 1/3, trigram ref empty -> p3 = 0 -> product 0;
    // candidate longer than ref -> brevity factor caps at 1
    assert(row == ((2L, 4L, 1L, 3L, 0L,
      500000L, 333333L, 0L, 1000000L, 0L)))
  }

  test("ngrams guards docs shorter than n") {
    val df = Seq(Seq("a")).toDF("toks")
    assert(df.select(Eval.ngrams(col("toks"), 3).as("g"))
      .select(size(col("g"))).as[Int].head() == 0)
  }

  test("distinctN: template collapse scores low, diverse text high") {
    val docs = Seq("a b a b", "a b a b", "c d e f").toDF("text")
    val out = Eval.distinctN(docs, "text", Seq(1, 2))
      .orderBy("n")
      .select("n", "n_distinct", "n_total", "distinct_ticks")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // unigrams: {a,b,c,d,e,f} = 6 distinct of 12; bigrams: 'a b' x4,
    // 'b a' x2 + {c d, d e, e f} = 5 distinct of 9
    assert(out == Seq((1L, 6L, 12L, 500000L),
      (2L, 5L, 9L, math.floor(1e6 * 5.0 / 9.0).toLong)))
  }
}
