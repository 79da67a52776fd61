package graft.expressions

import graft.SparkSpec
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** All non-ASCII fixture text is written as \u escapes — composed and
  * decomposed spellings of the same glyph are indistinguishable in an
  * editor, and the DIFFERENCE is the thing under test. */
class NormalizeTextSpec extends SparkSpec {
  import sqlImplicits._

  private def nfc(s: String): String =
    Seq(s).toDF("t").select(TextFunctions.normalizeNfc(col("t")))
      .as[String].head()
  private def nfkc(s: String): String =
    Seq(s).toDF("t").select(TextFunctions.normalizeNfkc(col("t")))
      .as[String].head()

  test("NFC composes decomposed sequences and reorders marks") {
    assert(nfc("cafe\u0301") == "caf\u00e9") // e + acute -> \u00e9
    assert(nfc("A\u030a") == "\u00c5")       // A + ring
    // canonical reordering: dot-above (ccc 230) sorts after
    // dot-below (ccc 220)
    assert(nfc("q\u0307\u0323") == "q\u0323\u0307")
    // no precomposed form exists: sequence survives, in order
    assert(nfc("\u0117\u0301") == "\u0117\u0301")
    // already composed: unchanged
    assert(nfc("caf\u00e9") == "caf\u00e9")
  }

  test("pure ASCII takes the fast path unchanged") {
    val s = "plain ascii text 123!"
    assert(nfc(s) == s)
    assert(nfkc(s) == s)
  }

  test("NFKC additionally folds compatibility forms") {
    assert(nfkc("\ufb01le") == "file")       // fi ligature
    assert(nfc("\ufb01le") == "\ufb01le")    // ...which NFC keeps
    assert(nfkc("\u2460") == "1")            // circled one
    assert(nfkc("\uff28\uff29") == "HI")     // fullwidth H I
  }

  test("normalization is idempotent and null-safe") {
    val rnd = new scala.util.Random(17)
    val parts = Seq("a", "\u00e9", "e\u0301", "q\u0307", "\u0323",
      "\ufb01", "z", " ", "\u0117")
    (1 to 40).foreach { _ =>
      val s = (1 to rnd.nextInt(8)).map(_ => parts(rnd.nextInt(parts.size)))
        .mkString
      assert(nfc(nfc(s)) == nfc(s), s"ascii=${toAscii(s)}")
      assert(nfkc(nfkc(s)) == nfkc(s), s"ascii=${toAscii(s)}")
    }
    val out = Seq[Option[String]](None, Some("e\u0301")).toDF("t")
      .select(TextFunctions.normalizeNfc(col("t"))).as[Option[String]]
      .collect().toSet
    assert(out == Set(None, Some("\u00e9")))
  }

  test("dedup motivation: composed and decomposed spellings collide") {
    val docs = Seq((1L, "caf\u00e9 mocha"), (2L, "cafe\u0301 mocha"))
      .toDF("doc_id", "text")
    val norm = docs.select(col("doc_id"),
      TextFunctions.normalizeNfc(col("text")).as("text"))
    assert(norm.select("text").distinct().count() == 1)
    assert(docs.select("text").distinct().count() == 2)
  }

  private def toAscii(s: String): String =
    s.map(c => if (c < 128) c.toString else f"\\u${c.toInt}%04x").mkString
}
