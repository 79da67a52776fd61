package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FunctionsSpec extends SparkSpec {
  import sqlImplicits._

  test("tokens / tokenCount / bpeishCount") {
    val df = Seq("hello  world", "a b2c, d!").toDF("t")
    assert(df.select(TextFunctions.tokenCount(col("t")).as("n"))
      .as[Int].collect().toSeq == Seq(2, 3))
    // "a b2c, d!" → a, b, 2, c, ',', d, '!' = 7
    assert(df.select(TextFunctions.bpeishCount(col("t")).as("n"))
      .as[Int].collect().toSeq == Seq(2, 7))
  }

  test("shingles slides a window; short arrays give empty") {
    val df = Seq("a b c d", "a").toDF("t")
    val out = df.select(TextFunctions.shingles(
      TextFunctions.tokens(col("t")), 3).as("sh")).as[Seq[String]]
    assert(out.collect().toSeq == Seq(Seq("a b c", "b c d"), Seq()))
  }

  test("qualityScore in [0,1] and length-monotone prior") {
    val df = Seq("the cat sat on the mat", "zz9!@#").toDF("t")
    val q = df.select(TextFunctions.qualityScore(col("t")).as("q"))
      .as[Double].collect()
    assert(q.forall(v => v >= 0.0 && v <= 1.0))
    assert(q(0) > q(1))
  }

  test("langId picks marker language deterministically") {
    val df = Seq("the fast cat and the slow dog is here").toDF("t")
    assert(df.select(TextFunctions.langId(col("t")).as("l"))
      .as[String].head() == "en")
  }

  test("rollingFingerprint is order-sensitive and deterministic") {
    val df = Seq("a b c", "c b a", "a b c").toDF("t")
    val fp = df.select(TextFunctions.rollingFingerprint(col("t")).as("f"))
      .as[Long].collect().toSeq
    assert(fp(0) == fp(2) && fp(0) != fp(1))
  }

  test("polyFingerprint: order-sensitive, bounded, hand-computed fold") {
    val df = Seq("a b", "b a", "a b", "").toDF("t")
    val fp = df.select(TextFunctions.polyFingerprint(col("t")).as("f"))
      .as[Long].collect().toSeq
    assert(fp(0) == fp(2) && fp(0) != fp(1))
    assert(fp(3) == 0L)                      // empty fold = init
    assert(fp.forall(v => v >= 0 && v < 2147483647L))
    // pin one value against the definition computed locally
    def h(t: String) = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5").digest(t.getBytes)
        .map("%02x".format(_)).mkString.take(7), 16)
    val expected = Seq("a", "b").foldLeft(0L)((a, t) =>
      (a * 31 + h(t)) % 2147483647L)
    assert(fp(0) == expected)
  }

  test("minhashSignature: subset property on identical sets") {
    val df = Seq(Seq("aa", "bb", "cc"), Seq("aa", "bb", "cc")).toDF("sh")
    val sigs = df.select(HashFunctions.minhashSignature(col("sh"), 8).as("s"))
      .as[Seq[Long]].collect()
    assert(sigs(0) == sigs(1) && sigs(0).size == 8)
  }

  test("hammingBands: pigeonhole shares a band within distance bands-1") {
    val a = 0x0123456789abcdefL
    val b = a ^ 0x1L // hamming 1
    val df = Seq(a, b).toDF("code")
    val bands = df.select(HashFunctions.hammingBands(col("code"), 4).as("bk"))
      .as[Seq[(Int, Long)]].collect()
    assert(bands(0).zip(bands(1)).count { case (x, y) => x == y } >= 3)
  }

  test("dot / norm / cosine on known vectors") {
    val df = Seq((Array(3.0f, 4.0f), Array(4.0f, 3.0f))).toDF("a", "b")
    val row = df.select(
      VectorFunctions.dot(col("a"), col("b")).as("d"),
      VectorFunctions.norm(col("a")).as("n"),
      VectorFunctions.cosine(col("a"), col("b")).as("c")).head()
    assert(row.getAs[Double]("d") == 24.0)
    assert(row.getAs[Double]("n") == 5.0)
    assert(math.abs(row.getAs[Double]("c") - 0.96) < 1e-12)
  }

  test("cosine of zero vector is 0, not NaN") {
    val df = Seq((Array(0.0f, 0.0f), Array(1.0f, 0.0f))).toDF("a", "b")
    assert(df.select(VectorFunctions.cosine(col("a"), col("b")).as("c"))
      .as[Double].head() == 0.0)
  }

  test("l2normalize yields unit norm; zero vector unchanged") {
    val df = Seq(Array(3.0f, 4.0f), Array(0.0f, 0.0f)).toDF("v")
    val out = df.select(VectorFunctions.norm(
      VectorFunctions.l2normalize(col("v"))).as("n")).as[Double].collect()
    assert(math.abs(out(0) - 1.0) < 1e-12 && out(1) == 0.0)
  }

  test("quantizeInt8 rounds half-up and clamps") {
    val df = Seq(Array(1.0f, -1.0f, 0.5f, 2.0f, 0.0f)).toDF("v")
    val out = df.select(VectorFunctions.quantizeInt8(col("v"), lit(1.0))
      .as("q")).as[Seq[Int]].head()
    assert(out == Seq(127, -127, 64, 127, 0)) // 0.5*127+0.5=64.0 → 64; 2.0 clamps
  }

  test("dupTokenRatio flags repetition") {
    val df = Seq("a a a a", "a b c d").toDF("t")
    val out = df.select(TextFunctions.dupTokenRatio(col("t")).as("r"))
      .as[Double].collect()
    assert(out(0) == 0.75 && out(1) == 0.0)
  }

  test("countMismatches: positionwise, truncates to shorter side") {
    val df = Seq(("ABCD", "ABXD"), ("ABC", "ABCDEF"), ("", "XYZ"))
      .toDF("a", "b")
    val out = df.select(
      TextFunctions.countMismatches(col("a"), col("b")).as("n"),
      TextFunctions.sequencesMatch(col("a"), col("b"), 1).as("ok"))
      .as[(Int, Boolean)].collect().toSeq
    assert(out == Seq((1, true), (0, false), (0, false)))
  }

  test("annotationLabel: the four _annotation_writer cases") {
    // null and empty both count as absent (pandas truthiness)
    val df = Seq[(String, String, String)](
      ("Domain", null, null), ("Domain", "desc", null),
      ("Domain", null, "PF1"), ("Domain", "desc", "PF1"),
      ("Domain", "", "")).toDF("t", "n", "i")
    val out = df.select(TextFunctions.annotationLabel(
      col("t"), col("n"), col("i")).as("l")).as[String].collect().toSeq
    assert(out == Seq("Domain", "Domain: desc", "Domain (PF1)",
      "Domain: desc (PF1)", "Domain"))
  }

  test("hyperplaneCode deterministic and within nBits range") {
    val df = Seq(Array.fill(8)(0.5f), Array.fill(8)(-0.5f)).toDF("v")
    val codes = df.select(
      VectorFunctions.hyperplaneCode(col("v"), 8, 6).as("c"))
      .as[Long].collect().toSeq
    assert(codes.forall(c => c >= 0 && c < 64))
    assert(codes(0) == (~codes(1) & 63)) // antipodal vectors flip every bit
  }

  test("htmlExtract: scripts/styles/comments out, blocks to lines, entities") {
    def ext(html: String): String =
      Seq(html).toDF("h")
        .select(TextFunctions.htmlExtract(col("h"))).as[String].head()
    assert(ext("<p>hello</p><p>world</p>") == "hello\nworld")
    assert(ext("<SCRIPT>if (1 < 2) { x(\"<p>\"); }</script>ok") == "ok")
    assert(ext("<style>p {color:red}</style>a<br/>b<BR>c") == "a\nb\nc")
    assert(ext("pre<!-- hidden <b>bold</b> -->post") == "prepost")
    // &amp; decodes LAST: "&amp;lt;" is the ESCAPED "&lt;", not "<"
    assert(ext("x &amp; y &lt;z&gt; &quot;q&quot; &#39;s&#39; a&nbsp;b " +
      "&amp;lt;") == "x & y <z> \"q\" 's' a b &lt;")
    assert(ext("<div>a   b\t\tc</div>\n\n<div>d</div>") == "a b c\nd")
    assert(ext("  <ul><li>one</li><li>two</li></ul>  ") == "one\ntwo")
    // inline tags vanish without a line break
    assert(ext("a <b>bold</b> and <a href=\"u\">link</a>.") ==
      "a bold and link.")
  }

  test("urlHost null/edge totality") {
    val got = Seq[String](null, "", "https://example.com").toDF("u")
      .select(TextFunctions.urlHost(col("u"))).as[Option[String]]
      .collect().toSeq
    assert(got == Seq(None, None, Some("example.com")))
  }

  test("charDiversity: collapsed-char spam maxes collision; mixed text low") {
    import sqlImplicits._
    import org.apache.spark.sql.functions.col
    val df = Seq("aaaa", "abab", "the quick brown fox", "", "!!!")
      .toDF("text")
      .select(TextFunctions.charDiversity(col("text")).as("cd"))
      .select("cd.n_alpha", "cd.n_distinct_alpha", "cd.collision_ppm")
      .as[(Long, Long, Long)].collect().toSeq
    // "aaaa": 4 of one char -> 16/16 = 1e6 exactly
    assert(df(0) == ((4L, 1L, 1000000L)))
    // "abab": 2*(2^2)/16 = 0.5
    assert(df(1) == ((4L, 2L, 500000L)))
    // pangram-ish text: far below the repetitive bar
    assert(df(2)._3 < 100000L, df(2).toString)
    // empty / out-of-alphabet text guards to 0, not a 0/0
    assert(df(3) == ((0L, 0L, 0L)))
    assert(df(4) == ((0L, 0L, 0L)))
  }

  test("charDiversity refuses a duplicate-char alphabet") {
    import org.apache.spark.sql.functions.col
    val e = intercept[IllegalArgumentException](
      TextFunctions.charDiversity(col("text"), "aab"))
    assert(e.getMessage.contains("distinct"))
  }

  test("luhnValid: known card numbers pass, a one-digit flip fails") {
    import sqlImplicits._
    import org.apache.spark.sql.functions.col
    val out = Seq("4532015112830366", "4532015112830367",
      "79927398713", "79927398710")
      .toDF("s").select(TextFunctions.luhnValid(col("s")))
      .as[Boolean].collect().toSeq
    // 4532... is a valid test PAN; 799...13 is the classic Luhn
    // example; the trailing-digit flips invert both verdicts
    assert(out == Seq(true, false, true, false))
  }

  test("cardCandidates: only 13-19 digit runs qualify") {
    import sqlImplicits._
    import org.apache.spark.sql.functions.col
    val out = Seq("call 555-1234 ref 4532015112830366 id 123456789012")
      .toDF("t").select(TextFunctions.cardCandidates(col("t")))
      .as[Seq[String]].head()
    assert(out == Seq("4532015112830366"))
  }
}
