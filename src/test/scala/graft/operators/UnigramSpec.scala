package graft.operators

import graft.SparkSpec
import graft.expressions.ViterbiSegment
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class UnigramSpec extends SparkSpec {
  import sqlImplicits._

  /** Independent sequential reference: char-based O(n²) DP with the
    * documented contract — max total weight, ties to the SMALLEST
    * start (longest final piece), single uncovered chars at oov. */
  private def refSegment(word: String, model: Map[String, Long],
                         oov: Long): Seq[String] = {
    val n = word.length
    if (n == 0) return Seq.empty
    // char positions; surrogate pairs handled by never splitting a
    // code point: candidate (s, e) must not split a pair
    def boundary(i: Int): Boolean =
      i == 0 || i == n || !Character.isLowSurrogate(word.charAt(i))
    val best = Array.fill(n + 1)(Long.MinValue)
    val back = Array.fill(n + 1)(-1)
    best(0) = 0L
    for (e <- 1 to n if boundary(e)) {
      for (s <- 0 until e if boundary(s) && best(s) != Long.MinValue) {
        val piece = word.substring(s, e)
        val nCp = piece.codePointCount(0, piece.length)
        val w: Option[Long] = model.get(piece)
          .orElse(if (nCp == 1) Some(oov) else None)
        w.foreach { ww =>
          val cand = best(s) + ww
          if (cand > best(e) || (cand == best(e) && s < back(e))) {
            best(e) = cand; back(e) = s
          }
        }
      }
    }
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var pos = n
    while (pos > 0) { val s = back(pos); word.substring(s, pos) +=: out; pos = s }
    out.toList
  }

  private def exprSegment(word: String, model: Seq[(String, Long)],
                          oov: Long): Seq[String] = {
    val e = ViterbiSegment(
      org.apache.spark.sql.catalyst.expressions.Literal(
        UTF8String.fromString(word)), model, oov)
    e.segment(UTF8String.fromString(word)).array
      .map(_.asInstanceOf[UTF8String].toString).toSeq
  }

  private val model = Seq(
    "the" -> -3000000L, "th" -> -1000000L, "he" -> -1500000L,
    "re" -> -2500000L, "ere" -> -1200000L, "er" -> -1800000L,
    "e" -> -2000000L, "t" -> -2200000L, "h" -> -2400000L,
    "r" -> -2600000L)

  test("viterbi beats greedy: global best split, not maximal munch") {
    // greedy maximal munch: the|re = -5.5M; viterbi: th|ere = -2.2M
    assert(exprSegment("there", model, -20000000L) == Seq("th", "ere"))
    // but when the long piece IS best, it wins
    assert(exprSegment("the", model, -20000000L) == Seq("the"))
  }

  test("uncovered chars fall back to single-char pieces at oov weight") {
    assert(exprSegment("xy", model, -20000000L) == Seq("x", "y"))
    // oov chars mix with in-model pieces
    assert(exprSegment("xthex", model, -20000000L) ==
      Seq("x", "the", "x"))
  }

  test("multi-byte characters advance whole code points") {
    val seg = exprSegment("éthe😀", model, -20000000L)
    assert(seg == Seq("é", "the", "😀"))
    assert(seg.mkString == "éthe😀")
  }

  test("tie contract: equal score takes the smallest start") {
    // "aa" under {a->-10, aa->-20}: single path score tie
    // a|a = -20 == aa = -20 → smallest backpointer start s=0 wins
    // at e=2, so the final piece is "aa" (one piece)
    val m = Seq("a" -> -10L, "aa" -> -20L)
    assert(exprSegment("aa", m, -99L) == Seq("aa"))
  }

  test("segmentation equals the sequential reference on random input") {
    val rnd = new scala.util.Random(71)
    val alpha = "abcd"
    (1 to 120).foreach { _ =>
      val m = (1 to 12).map { _ =>
        val l = rnd.nextInt(3) + 1
        val p = (1 to l).map(_ => alpha(rnd.nextInt(3))).mkString
        (p, -(rnd.nextInt(4000000) + 1000000).toLong)
      }.distinctBy(_._1)
      val word = (1 to rnd.nextInt(15))
        .map(_ => alpha(rnd.nextInt(4))).mkString
      val got = exprSegment(word, m, -20000000L)
      val want = refSegment(word, m.toMap, -20000000L)
      assert(got == want, s"word=$word model=$m")
      assert(got.mkString == word) // lossless
    }
  }

  test("segmentation matches the reference on multi-byte alphabets") {
    // pieces and words mixing 1-, 2- and 4-byte code points: the
    // expression runs a BYTE trie, the reference a UTF-16 char DP —
    // agreement pins that byte boundaries never split a code point
    val rnd = new scala.util.Random(72)
    val cps = Seq("a", "b", "\u00e9", "\ud83d\ude00")
    (1 to 80).foreach { _ =>
      val m = (1 to 10).map { _ =>
        val l = rnd.nextInt(2) + 1
        val p = (1 to l).map(_ => cps(rnd.nextInt(3))).mkString
        (p, -(rnd.nextInt(4000000) + 1000000).toLong)
      }.distinctBy(_._1)
      val word = (1 to rnd.nextInt(10))
        .map(_ => cps(rnd.nextInt(4))).mkString
      val got = exprSegment(word, m, -20000000L)
      val want = refSegment(word, m.toMap, -20000000L)
      assert(got == want, s"word=${word.map(_.toInt)} model=$m")
      assert(got.mkString == word)
    }
  }

  test("seedVocab: frequency-weighted substring counts, top-K order") {
    val docs = Seq((1L, "ab ab"), (2L, "ab cd")).toDF("doc_id", "text")
    // word counts: ab=3, cd=1
    // substrings (maxLen 2): ab -> a,b,ab each 3; cd -> c,d,cd each 1
    val out = Unigram.seedVocab(docs, maxPieceLen = 2, topK = 4L)
      .as[(String, Long)].collect().toSet
    // top-4 by (total desc, piece asc): a(3), ab(3), b(3), c(1)
    assert(out == Set(("a", 3L), ("ab", 3L), ("b", 3L), ("c", 1L)))
  }

  test("model persistence: train -> save -> load segments identically") {
    val docs = Seq((1L, "the there then he her"),
      (2L, "here the there then")).toDF("doc_id", "text")
    val trained = Unigram.trainViterbiEm(docs, vocabSize = 10,
      maxPieceLen = 3, seedSize = 30L, rounds = 2, pruneFrac = 0.25)
      .as[(String, Long, Long)].collect()
      .map(r => (r._1, r._3)).toSeq
    val dir = java.nio.file.Files
      .createTempDirectory("unigram_model").toString
    Unigram.saveModel(spark, trained, s"$dir/m")
    val loaded = Unigram.loadModel(spark, s"$dir/m")
    assert(loaded.toSet == trained.toSet)
    val before = docs.select(explode(
      Unigram.segment(col("text"), trained, -20000000L)).as("t"))
      .as[String].collect().toSeq
    val after = docs.select(explode(
      Unigram.segment(col("text"), loaded, -20000000L)).as("t"))
      .as[String].collect().toSeq
    assert(before == after)
    // corrupted table (duplicate piece) is rejected, not replayed
    Unigram.saveModel(spark, trained ++ trained.take(1), s"$dir/dup")
    val err = intercept[IllegalArgumentException] {
      Unigram.loadModel(spark, s"$dir/dup")
    }
    assert(err.getMessage.contains("duplicate piece"))
  }

  test("trainViterbiEm equals a sequential replay of the same rounds") {
    val docs = Seq(
      (1L, "the thee there then the"),
      (2L, "he she her here the"),
      (3L, "there then the her")).toDF("doc_id", "text")
    val dist = Unigram.trainViterbiEm(docs, vocabSize = 12,
      maxPieceLen = 3, seedSize = 40L, rounds = 3, pruneFrac = 0.3)
      .as[(String, Long, Long)].collect().toSet

    // sequential replay: same seed, same rounds, plain Scala
    val words = docs.as[(Long, String)].collect()
      .flatMap(_._2.split(" ").filter(_.nonEmpty))
    val wf = words.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val subCounts = scala.collection.mutable.Map.empty[String, Long]
    for ((w, c) <- wf; i <- 0 until w.length;
         l <- 1 to math.min(3, w.length - i))
      subCounts(w.substring(i, i + l)) =
        subCounts.getOrElse(w.substring(i, i + l), 0L) + c
    val seed = subCounts.toSeq.sortBy { case (p, c) => (-c, p) }.take(40)
    val seedTotal = seed.map(_._2).sum
    var model = seed.map { case (p, c) =>
      (p, Unigram.weightTicks(c, seedTotal)) }
    var result = Seq.empty[(String, Long, Long)]
    for (_ <- 1 to 3) {
      val cnts = scala.collection.mutable.Map.empty[String, Long]
      for ((w, c) <- wf; piece <- refSegment(w, model.toMap, -20000000L))
        cnts(piece) = cnts.getOrElse(piece, 0L) + c
      val total = cnts.values.sum
      val keepN = math.max(12,
        math.ceil(cnts.size * (1.0 - 0.3)).toLong).toInt
      val kept = cnts.toSeq.sortBy { case (p, c) => (-c, p) }.take(keepN)
      model = kept.map { case (p, c) => (p, Unigram.weightTicks(c, total)) }
      result = kept.map { case (p, c) =>
        (p, c, Unigram.weightTicks(c, total)) }
    }
    assert(dist == result.toSet)
  }
}
