package graft.expressions

import graft.SparkSpec
import graft.functions.TextFunctions
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Value-equality spec for the fast md5-family evaluators: every
  * output must equal the conv(substring(md5(·), 1, N), 16, 10) HOF
  * form token-for-token — that SQL form is what the DuckDB oracle
  * replays, so any drift here breaks hash-exact correctness, not
  * just performance. */
class Md5MinHashSpec extends SparkSpec {
  import sqlImplicits._

  private def md5intSql(c: Column, n: Int): Column =
    conv(substring(md5(c), 1, n), 16, 10).cast("long")

  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "pack my box with five dozen liquor jugs",
    "ünïcode tökens ∆ωß 中文 слова", // multi-byte UTF-8
    "x", "a b a b a b", // tiny + repeated tokens
    "numbers 123 456789 0 and_underscores mixed-punct!")

  test("Md5PrefixLong equals the conv/substring/md5 SQL form " +
    "(nibbles 7 and 15, unicode included)") {
    val df = texts.toDF("t")
      .select(explode(TextFunctions.tokens(col("t"))).as("tok"))
    for (n <- Seq(7, 15)) {
      val bad = df.select(
        md5intSql(col("tok"), n).as("sql_form"),
        Md5MinHashSig.prefix(col("tok"), n).as("fast"))
        .filter(col("sql_form") =!= col("fast"))
      assert(bad.count() === 0, s"nibbles=$n")
    }
  }

  test("Md5MinHashSig equals the transform/array_min HOF form on " +
    "every signature lane") {
    val sh = sort_array(array_distinct(transform(
      TextFunctions.tokens(col("t")), t => md5intSql(t, 15))))
    val hof = transform(sequence(lit(0), lit(31)),
      j => array_min(transform(col("sh"), v =>
        md5intSql(concat(v.cast("string"), lit("_"),
          j.cast("string")), 15))))
    val bad = texts.toDF("t")
      .select(sh.as("sh")).filter(size(col("sh")) > 0)
      .select(hof.as("sig_hof"),
        Md5MinHashSig.of(col("sh"), 32).as("sig_fast"))
      .filter(col("sig_hof") =!= col("sig_fast"))
    assert(bad.count() === 0)
  }

  test("Md5MinHashSig: empty shingle set yields null, null yields null") {
    val df = Seq((1, Seq.empty[Long]), (2, Seq(42L)))
      .toDF("id", "sh")
      .select(col("id"), when(col("id") === 2, col("sh")).as("sh"))
    val out = df.select(col("id"),
      Md5MinHashSig.of(col("sh"), 4).as("sig"))
      .orderBy("id").collect()
    assert(out(0).isNullAt(1)) // null input
    val df2 = Seq(Seq.empty[Long]).toDF("sh")
      .select(Md5MinHashSig.of(col("sh"), 4).as("sig")).collect()
    assert(df2(0).isNullAt(0)) // empty array
  }

  test("polyFingerprint (7-nibble fast path) matches a replay of the " +
    "documented SQL chain") {
    val sqlForm = aggregate(
      transform(TextFunctions.tokens(col("t")),
        t => md5intSql(t, 7)),
      lit(0L),
      (acc, h) => pmod(acc * lit(31L) + h, lit(2147483647L)))
    val bad = texts.toDF("t")
      .select(sqlForm.as("a"),
        TextFunctions.polyFingerprint(col("t")).as("b"))
      .filter(col("a") =!= col("b"))
    assert(bad.count() === 0)
  }
}
