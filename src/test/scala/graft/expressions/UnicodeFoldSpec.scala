package graft.expressions

import graft.SparkSpec
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

class UnicodeFoldSpec extends SparkSpec {
  import sqlImplicits._

  private def foldOf(inputs: Seq[String]): Seq[String] =
    inputs.toDF("t")
      .select(UnicodeFold(col("t")).as("f"))
      .as[String].collect().toSeq

  test("pins the fold table: width, compatibility, case, marks") {
    // every pair here is a JVM-pinned fact the q_unicode_fold oracle's
    // replace chains copy verbatim — if this table moves, BOTH the
    // expression and the oracle literals must move together
    val table = Seq(
      "Ｃａｆé ﬁnal ②㏏" ->
        "cafe final 2kt", // fullwidth Caf, é, fi-ligature, ②, ㏏
      "ÄÑÉ Ｔｅｓｔ" ->
        "ane test",       // Ä Ñ É + fullwidth Test
      "№ ℡ Ⅸ ｈｅｌｌｏ" ->
        "no tel ix hello", // № ℡ Ⅸ + fullwidth hello
      "café café" ->
        "cafe cafe",      // decomposed ≡ composed ≡ stripped
      "straße İstanbul" ->
        "straße istanbul", // ß preserved (documented boundary);
                                // İ → i (dot-above mark stripped)
      "ABC already plain 123" ->
        "abc already plain 123") // ASCII fast path = plain lowercase
    val got = foldOf(table.map(_._1))
    table.map(_._2).zip(got).zip(table.map(_._1)).foreach {
      case ((want, have), in) => assert(have == want, s"input '$in'")
    }
  }

  test("confusables survive the fold alone, die in the composed " +
    "unicodeFold (homoglyph stage is a complement, not a duplicate)") {
    val evasion = "viаgrа сlub" // Cyrillic а а с
    val foldedOnly = Seq(evasion).toDF("t")
      .select(UnicodeFold(col("t")).as("f")).as[String].head()
    assert(foldedOnly == evasion, "NFKC must NOT fold confusables")
    val composed = Seq(evasion).toDF("t")
      .select(TextFunctions.unicodeFold(col("t")).as("f"))
      .as[String].head()
    assert(composed == "viagra club")
  }

  test("null in, null out; non-string input fails analysis") {
    val r = Seq((1L, Option.empty[String]), (2L, Some("Ａ")))
      .toDF("id", "t")
      .select(col("id"), UnicodeFold(col("t")).as("f"))
      .as[(Long, Option[String])].collect().toMap
    assert(r(1L).isEmpty && r(2L).contains("a"))
    val e = intercept[Exception] {
      Seq(1L).toDF("x").select(UnicodeFold(col("x"))).collect()
    }
    assert(e.getMessage.contains("string"))
  }

  test("normalizedExact(unicodeFold) merges re-encoded copies plain " +
    "normalization cannot") {
    val docs = Seq(
      (1L, "The quick Brown Fox!"),
      (2L, "Ｔhe quick Ｂrown Ｆox!"), // full-width T B F
      (3L, "The quick Brown Fox!"),      // plain spelling
      (4L, "viаgra spam"),                    // Cyrillic а
      (5L, "viagra spam"),
      (6L, "unrelated")).toDF("doc_id", "text")
    val plain = graft.operators.Dedup.normalizedExact(docs)
    assert(plain.count() == 5, "plain normalization keeps 1≠2, 4≠5")
    val folded = graft.operators.Dedup
      .normalizedExact(docs, unicodeFold = true)
    val groups = folded
      .select(col("keeper_doc_id").cast("long"), col("n_copies").cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(folded.count() == 3)
    assert(groups(1L) == 3L && groups(4L) == 2L && groups(6L) == 1L)
  }

  test("folded minhash sketches make a width-respelled copy a " +
    "decontamination hit") {
    val bench = Seq((100L,
      "the capital of france is paris and the capital of italy is rome"))
      .toDF("doc_id", "text")
    // the leaked copy's first six tokens are full-width — more than
    // half its raw shingles differ, so raw jaccard falls below the
    // bar while the folded shingles are identical
    val leaked = "ｔｈｅ ｃａｐｉｔａｌ ｏｆ ｆｒａｎｃｅ ｉｓ ｐａｒｉｓ " +
      "and the capital of italy is rome"
    val corpus = Seq((1L, leaked), (2L, "completely unrelated text " +
      "about spark physical plans and shuffle exchanges here"))
      .toDF("doc_id", "text")
    def verdict(fold: Boolean) = graft.operators.Dedup.fuzzyDecontaminate(
      graft.operators.Dedup.minhashSketch(corpus, unicodeFold = fold),
      graft.operators.Dedup.minhashSketch(bench, unicodeFold = fold),
      threshold = 0.8)
      .select(col("id").cast("long"), col("contaminated"))
      .as[(Long, Boolean)].collect().toMap
    val raw = verdict(fold = false)
    assert(!raw(1L), "raw shingles must miss the re-encoded leak")
    val folded = verdict(fold = true)
    assert(folded(1L), "folded shingles must catch it")
    assert(!folded(2L))
  }
}
