package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WordPieceSpec extends SparkSpec {
  import sqlImplicits._

  // ---- sequential reference WordPiece encode (the HF algorithm:
  // longest prefix first, position-split lookup, whole-word UNK) ----
  private def refEncode(word: String, vocab: Set[String], unk: String,
                        maxChars: Int): Seq[String] = {
    if (word.codePointCount(0, word.length) > maxChars) return Seq(unk)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var p = 0
    while (p < word.length) {
      var q = word.length
      var hit: String = null
      while (hit == null && q > p) {
        val key = (if (p == 0) "" else "##") + word.substring(p, q)
        if (vocab.contains(key)) hit = key
        else q -= 1
      }
      if (hit == null) return Seq(unk)
      out += hit
      p = q
    }
    out.toSeq
  }

  private def cpCompare(x: String, y: String): Int = {
    val xi = x.codePoints().toArray
    val yi = y.codePoints().toArray
    val n = math.min(xi.length, yi.length)
    var i = 0
    while (i < n) {
      if (xi(i) != yi(i)) return Integer.compare(xi(i), yi(i))
      i += 1
    }
    Integer.compare(xi.length, yi.length)
  }

  private def refSymbols(w: String): List[String] =
    w.codePoints().toArray.toList.map(Character.toString)
      .zipWithIndex.map { case (c, i) => if (i == 0) c else "##" + c }

  private def refMergeProduct(a: String, b: String): String =
    a + (if (b.startsWith("##")) b.substring(2) else b)

  private def refMergeList(s: List[String], a: String,
                           b: String): List[String] =
    s match {
      case x :: y :: rest if x == a && y == b =>
        refMergeProduct(a, b) :: refMergeList(rest, a, b)
      case x :: rest => x :: refMergeList(rest, a, b)
      case Nil => Nil
    }

  // ---- sequential reference trainer: likelihood argmax ----
  private def refTrainWp(freqs: Map[String, Long], nMerges: Int,
                         minCount: Long): Seq[(String, String)] = {
    var vocab = freqs.toSeq.map { case (w, f) => (refSymbols(w), f) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    for (_ <- 1 to nMerges if !done) {
      val pairCnt = vocab.flatMap { case (s, f) =>
        s.zip(s.drop(1)).map(p => p -> f)
      }.groupMapReduce(_._1)(_._2)(_ + _)
      val symCnt = vocab.flatMap { case (s, f) => s.map(_ -> f) }
        .groupMapReduce(_._1)(_._2)(_ + _)
      val cands = pairCnt.filter(_._2 >= minCount)
      if (cands.isEmpty) done = true
      else {
        // score in DOUBLE exactly as the distributed argmax does
        val ((a, b), _) = cands.toSeq.sortWith {
          case (((a1, b1), c1), ((a2, b2), c2)) =>
            val s1 = c1.toDouble / (symCnt(a1).toDouble * symCnt(b1).toDouble)
            val s2 = c2.toDouble / (symCnt(a2).toDouble * symCnt(b2).toDouble)
            if (s1 != s2) s1 > s2
            else {
              val ca = cpCompare(a1, a2)
              if (ca != 0) ca < 0 else cpCompare(b1, b2) < 0
            }
        }.head
        merges += ((a, b))
        vocab = vocab.map { case (s, f) => (refMergeList(s, a, b), f) }
      }
    }
    merges.toSeq
  }

  private def enc(text: String, vocab: Seq[String],
                  maxChars: Int = 100): Seq[String] =
    Seq(Tuple1(text)).toDF("text")
      .select(Bpe.encodeWordPiece(col("text"), vocab,
        maxWordChars = maxChars).as("t"))
      .as[Seq[String]].head()

  private val vocabBasic = Seq(
    "t", "h", "s", "the", "un",
    "##h", "##e", "##a", "##b", "##l", "##able", "##ed")

  test("greedy longest match under the position-split vocabulary") {
    // "the" whole word beats "t"+"##h"+"##e"; "table" unsegmentable
    // at pos 1 ("##able" needs ##a..., t-a: ##a then ##b... wait) —
    // trace: t, then "able" -> ##able (longest over ##a). Lossless.
    assert(enc("the", vocabBasic) == Seq("the"))
    assert(enc("table", vocabBasic) == Seq("t", "##able"))
    // longest CONTINUATION wins over the single char chain
    assert(enc("thable", vocabBasic) == Seq("t", "##h", "##able"))
  }

  test("same surface string is position-sensitive: initial vs ##") {
    // "t" is in-vocab word-initially but has no "##t" continuation:
    // the second t of "tt" fails -> the WHOLE word is [UNK], the
    // already-matched first t is discarded (the defining WordPiece
    // contract vs BPE's keep-and-continue)
    val v = Seq("t", "##x")
    assert(enc("t", v) == Seq("t"))
    assert(enc("tt", v) == Seq("[UNK]"))
    // and the mirror: "##h" exists, "h" initial does too, but "x"
    // initial does not -> first-char failure
    assert(enc("xh", vocabBasic) == Seq("[UNK]"))
  }

  test("maxWordChars: over-long words are [UNK] without scanning") {
    val v = Seq("a", "##a")
    assert(enc("aaaa", v, maxChars = 4) == Seq("a", "##a", "##a", "##a"))
    assert(enc("aaaaa", v, maxChars = 4) == Seq("[UNK]"))
    // the limit counts CODE POINTS, not UTF-16 units: 🙂 is one
    val emoji = Seq("🙂", "##🙂")
    assert(enc("🙂🙂", emoji, maxChars = 2)
      == Seq("🙂", "##🙂"))
    assert(enc("🙂🙂🙂", emoji, maxChars = 2)
      == Seq("[UNK]"))
  }

  test("multi-byte characters never split; unseen char -> whole-word UNK") {
    val v = Seq("caf", "##é", "na", "##ve")
    assert(enc("café", v) == Seq("caf", "##é"))
    // ï is not in vocab at any position: UNK, never a partial byte
    assert(enc("naïve", v) == Seq("[UNK]"))
  }

  test("whitespace words encode independently into one flat array") {
    assert(enc("the table  sh", vocabBasic)
      == Seq("the", "t", "##able", "s", "##h"))
  }

  test("encodeWordPiece equals the sequential reference on random text") {
    val rnd = new scala.util.Random(43)
    val alpha = "abcdeft"
    // a vocabulary with gaps: no "g"… and only SOME continuations
    val vocab = Seq("a", "b", "c", "d", "e", "f", "t", "ab", "the",
      "##a", "##b", "##c", "##e", "##f", "##ab", "##cd", "##ed")
    val vset = vocab.toSet
    val texts = (1 to 300).map { _ =>
      (1 to (1 + rnd.nextInt(6))).map(_ =>
        (1 to (1 + rnd.nextInt(8))).map(_ =>
          alpha(rnd.nextInt(alpha.length))).mkString).mkString(" ")
    }
    val got = texts.toDF("text")
      .select(Bpe.encodeWordPiece(col("text"), vocab).as("t"))
      .as[Seq[String]].collect()
    val want = texts.map(_.split(" ").filter(_.nonEmpty).toSeq
      .flatMap(w => refEncode(w, vset, "[UNK]", 100)))
    got.zip(want).foreach { case (g, w) => assert(g == w) }
  }

  test("non-UNK output reassembles the word exactly (markers stripped)") {
    val rnd = new scala.util.Random(7)
    // total alphabet -> nothing can UNK; pieces must concat back
    val vocab = ('a' to 'f').map(_.toString) ++
      ('a' to 'f').map(c => s"##$c") ++ Seq("abc", "##def", "##cab")
    val words = (1 to 200).map(_ => (1 to (1 + rnd.nextInt(10))).map(_ =>
      ('a' + rnd.nextInt(6)).toChar).mkString)
    val got = words.map(w => enc(w, vocab))
    words.zip(got).foreach { case (w, toks) =>
      assert(toks.map(_.stripPrefix("##")).mkString == w)
      assert(toks.tail.forall(_.startsWith("##")))
      assert(!toks.head.startsWith("##"))
    }
  }

  test("wordPieceSymbols marks every non-initial char") {
    val got = Seq(Tuple1("hello")).toDF("word")
      .select(Bpe.wordPieceSymbols(col("word")).as("s"))
      .as[Seq[String]].head()
    assert(got == Seq("h", "##e", "##l", "##l", "##o"))
    // single char: no continuation symbols at all
    val one = Seq(Tuple1("x")).toDF("word")
      .select(Bpe.wordPieceSymbols(col("word")).as("s"))
      .as[Seq[String]].head()
    assert(one == Seq("x"))
  }

  test("wordPiecePairScores: exact pair and marginal counts") {
    // corpus: "ab ab a" -> words ab(2), a(1)
    // symbols: ab -> [a, ##b] (freq 2); a -> [a] (freq 1)
    // pair (a,##b) cnt 2; marginals a=3, ##b=2
    val docs = Seq(Tuple1("ab ab a")).toDF("text")
    val words = Bpe.wordFreqs(docs)
      .select(Bpe.wordPieceSymbols(col("word")).as("symbols"), col("freq"))
    val rows = Bpe.wordPiecePairScores(words)
      .as[(String, String, Long, Long, Long)].collect().toSeq
    assert(rows == Seq(("a", "##b", 2L, 3L, 2L)))
  }

  test("likelihood argmax diverges from the BPE count argmax") {
    // (a,##b) is the most FREQUENT pair (10 > 9) but its parts are
    // everywhere (a: 100, ##b: 10 -> score 0.01); (c,##d) occurs
    // only together (9/(9*9) = 0.111...). WordPiece must pick
    // (c,##d) first; count-argmax BPE would pick (a,##b).
    val docs = (Seq.fill(10)("ab") ++ Seq.fill(90)("a") ++
      Seq.fill(90)("b") ++ Seq.fill(9)("cd"))
      .map(Tuple1(_)).toDF("text")
    val merges = Bpe.trainWordPiece(docs, nMerges = 1)
    assert(merges == Seq(("c", "##d")))
  }

  test("trainWordPiece equals the sequential reference on random corpora") {
    val rnd = new scala.util.Random(91)
    for (trial <- 1 to 3) {
      val alpha = "abcd"
      val words = (1 to 40).map(_ => (1 to (1 + rnd.nextInt(5))).map(_ =>
        alpha(rnd.nextInt(alpha.length))).mkString)
      val freqs = words.groupBy(identity).map { case (w, ws) =>
        w -> ws.size.toLong
      }
      val docs = words.map(Tuple1(_)).toDF("text")
      val got = Bpe.trainWordPiece(docs, nMerges = 8, minCount = 2L)
      val want = refTrainWp(freqs, nMerges = 8, minCount = 2L)
      assert(got == want, s"trial $trial")
    }
  }

  test("merge products carry the ## marker on the left only") {
    assert(Bpe.wordPieceMerged("h", "##e") == "he")
    assert(Bpe.wordPieceMerged("##l", "##l") == "##ll")
    val vocab = Bpe.wordPieceVocabFromMerges(
      Seq(("h", "##e"), ("##l", "##l"), ("he", "##ll")),
      Seq("h", "##e", "##l", "##o"))
    assert(vocab == Seq("h", "##e", "##l", "##o", "he", "##ll", "hell"))
  }

  test("trained vocab drives the encoder losslessly on training words") {
    val docs = (Seq.fill(8)("hello") ++ Seq.fill(5)("hell") ++
      Seq.fill(3)("help")).map(Tuple1(_)).toDF("text")
    val merges = Bpe.trainWordPiece(docs, nMerges = 6, minCount = 2L)
    val alphabet = Seq("h", "##e", "##l", "##o", "##p")
    val vocab = Bpe.wordPieceVocabFromMerges(merges, alphabet)
    for (w <- Seq("hello", "hell", "help")) {
      val toks = enc(w, vocab)
      assert(toks.map(_.stripPrefix("##")).mkString == w)
      assert(toks != Seq("[UNK]"))
    }
  }
}
