package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import sqlImplicits._

  // ---- local reference BPE (the sequential textbook algorithm) ----
  private def refMerge(s: List[String], a: String, b: String): List[String] =
    s match {
      case x :: y :: rest if x == a && y == b => (a + b) :: refMerge(rest, a, b)
      case x :: rest => x :: refMerge(rest, a, b)
      case Nil => Nil
    }

  private def refTrain(freqs: Map[String, Long], nMerges: Int,
                       minCount: Long): Seq[(String, String)] = {
    var vocab = freqs.toSeq.map { case (w, f) =>
      (w.map(_.toString).toList, f)
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    for (_ <- 1 to nMerges if !done) {
      val counts = vocab.flatMap { case (s, f) =>
        s.zip(s.drop(1)).map(p => p -> f)
      }.groupMapReduce(_._1)(_._2)(_ + _).filter(_._2 >= minCount)
      if (counts.isEmpty) done = true
      else {
        val ((a, b), _) = counts.toSeq
          .sortBy { case ((a, b), c) => (-c, a, b) }.head
        merges += ((a, b))
        vocab = vocab.map { case (s, f) => (refMerge(s, a, b), f) }
      }
    }
    merges.toSeq
  }

  test("mergePair is left-to-right non-overlapping") {
    val df = Seq(
      (1L, Seq("a", "a", "a")),
      (2L, Seq("x", "a", "b", "a", "b")),
      (3L, Seq("a", "b")),
      (4L, Seq("b", "a")),
      (5L, Seq.empty[String])).toDF("id", "s")
    val aa = df.select(col("id"), Bpe.mergePair(col("s"), "a", "a").as("m"))
      .as[(Long, Seq[String])].collect().toMap
    assert(aa(1L) == Seq("aa", "a"))
    val ab = df.select(col("id"), Bpe.mergePair(col("s"), "a", "b").as("m"))
      .as[(Long, Seq[String])].collect().toMap
    assert(ab(2L) == Seq("x", "ab", "ab"))
    assert(ab(3L) == Seq("ab"))
    assert(ab(4L) == Seq("b", "a"))
    assert(ab(5L) == Seq.empty)
  }

  test("pairCounts weights occurrences by word frequency") {
    val words = Seq((Seq("l", "o", "o", "l"), 3L), (Seq("o", "o"), 2L))
      .toDF("symbols", "freq")
    val counts = Bpe.pairCounts(words)
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // "lool"×3: (l,o) (o,o) (o,l); "oo"×2: (o,o)
    assert(counts(("o", "o")) == 5L && counts(("l", "o")) == 3L &&
      counts(("o", "l")) == 3L)
  }

  test("pairCounts: empty and 1-symbol words contribute zero pairs") {
    val words = Seq((Seq.empty[String], 5L), (Seq("x"), 3L),
      (Seq("a", "b"), 2L)).toDF("symbols", "freq")
    val counts = Bpe.pairCounts(words)
      .as[(String, String, Long)].collect()
    assert(counts.toSeq == Seq(("a", "b", 2L)))
  }

  test("trainMerges equals the sequential reference") {
    val docs = Seq(
      "low low low lower lower newest newest newest newest widest",
      "widest widest low newest").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val freqs = docs.select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").count().as[(String, Long)].collect().toMap
    val got = Bpe.trainMerges(docs, nMerges = 8)
    assert(got == refTrain(freqs, 8, 2L))
    assert(got.nonEmpty)
  }

  test("trainMerges stops early when no pair reaches minCount") {
    val docs = Seq((1L, "ab cd ef")).toDF("doc_id", "text")
    // every pair occurs once; minCount=2 → zero merges
    assert(Bpe.trainMerges(docs, nMerges = 5).isEmpty)
  }

  test("applyMerges tokenizes with trained merges, lossless per word") {
    val docs = Seq(
      "banana bandana banana cabana",
      "banana bandana cabana cabana").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val merges = Bpe.trainMerges(docs, nMerges = 6)
    assert(merges.nonEmpty)
    val toks = docs.select(col("doc_id"),
        Bpe.applyMerges(col("text"), merges).as("t"))
      .as[(Long, Seq[Seq[String]])].collect().toMap
    // concatenating each word's subword tokens restores the word
    val words0 = "banana bandana banana cabana".split(" ").toSeq
    assert(toks(0L).map(_.mkString) == words0)
    // and the segmentation equals the reference apply
    val refSeg = words0.map(w => merges.foldLeft(
      w.map(_.toString).toList) { case (s, (a, b)) => refMerge(s, a, b) })
    assert(toks(0L).map(_.toList) == refSeg)
  }

  test("trainMerges equals reference on random corpora") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      val words = (1 to 30).map(_ =>
        (1 to (2 + rnd.nextInt(5))).map(_ => ('a' + rnd.nextInt(3)).toChar)
          .mkString)
      val text = rnd.shuffle(words ++ words.take(10)).mkString(" ")
      val docs = Seq((1L, text)).toDF("doc_id", "text")
      val freqs = text.split(" ").groupBy(identity)
        .map { case (w, g) => w -> g.length.toLong }
      val got = Bpe.trainMerges(docs, nMerges = 10)
      assert(got == refTrain(freqs, 10, 2L), s"trial $trial")
    }
  }
}
