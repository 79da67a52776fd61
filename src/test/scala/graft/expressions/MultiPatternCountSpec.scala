package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultiPatternCountSpec extends SparkSpec {
  import sqlImplicits._

  // naive reference: all (end-position, pattern) matches
  private def refCount(text: String, pats: Seq[String]): (Long, Int) = {
    val per = pats.map { p =>
      (0 to text.length - p.length)
        .count(i => text.regionMatches(i, p, 0, p.length)).toLong
    }
    (per.sum, per.count(_ > 0))
  }

  private def run(text: String, pats: Seq[String]): (Long, Int) = {
    val r = Seq(Tuple1(text)).toDF("text")
      .select(MultiPatternCount(col("text"), pats).as("m"))
      .select(col("m.n_hits"), col("m.n_patterns"))
      .as[(Long, Int)].head()
    r
  }

  test("counts every occurrence of every pattern, overlaps included") {
    assert(run("aaa", Seq("aa")) == ((2L, 1)))
    assert(run("aaa", Seq("a", "aa", "aaa")) == ((6L, 3)))
    assert(run("batch batch batch", Seq("batch batch")) == ((2L, 1)))
    assert(run("no hits here", Seq("qq", "zz")) == ((0L, 0)))
  }

  test("matches the naive reference on random text and patterns") {
    val rnd = new scala.util.Random(11)
    val alpha = "abc "
    for (_ <- 1 to 200) {
      val text = (1 to (rnd.nextInt(60) + 1))
        .map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      val pats = (1 to (rnd.nextInt(6) + 1)).map(_ =>
        (1 to (rnd.nextInt(4) + 1))
          .map(_ => alpha(rnd.nextInt(alpha.length))).mkString)
        .distinct
      assert(run(text, pats) == refCount(text, pats), s"text='$text' pats=$pats")
    }
  }

  test("multi-byte patterns match byte-exactly, never mid-character") {
    assert(run("café café", Seq("é", "café", "fé c")) == ((5L, 3)))
    assert(run("🙂🙂", Seq("🙂")) == ((2L, 1)))
    // a pattern that is a byte-prefix of a longer char can't fire:
    // é is C3 A9 — searching for é in a doc with only 语 finds none
    assert(run("语语语", Seq("é")) == ((0L, 0)))
  }

  test("null text gives null; guards reject bad pattern lists") {
    val df = Seq(Option.empty[String]).toDF("text")
    assert(df.select(MultiPatternCount(col("text"), Seq("x")))
      .head().isNullAt(0))
    intercept[IllegalArgumentException](
      MultiPatternCount(col("text"), Seq.empty))
    intercept[IllegalArgumentException](
      MultiPatternCount(col("text"), Seq("a", "a")))
    intercept[IllegalArgumentException](
      MultiPatternCount(col("text"), Seq("")))
    intercept[IllegalArgumentException](
      MultiPatternCount(col("text"), (1 to 65).map("p" + _)))
  }
}
