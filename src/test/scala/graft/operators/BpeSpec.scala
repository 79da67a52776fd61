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

  // the trainer's documented tie-break is CODE-POINT order (Spark's
  // binary UTF-8 string order) — Java compareTo (UTF-16 code units)
  // disagrees for supplementary-plane symbols, so the reference must
  // compare code points explicitly
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

  private def refTrain(freqs: Map[String, Long], nMerges: Int,
                       minCount: Long): Seq[(String, String)] = {
    var vocab = freqs.toSeq.map { case (w, f) =>
      // code-point symbols, matching charSymbols' split("")
      (w.codePoints().toArray.toList.map(Character.toString), f)
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    for (_ <- 1 to nMerges if !done) {
      val counts = vocab.flatMap { case (s, f) =>
        s.zip(s.drop(1)).map(p => p -> f)
      }.groupMapReduce(_._1)(_._2)(_ + _).filter(_._2 >= minCount)
      if (counts.isEmpty) done = true
      else {
        val ((a, b), _) = counts.toSeq.sortWith {
          case (((a1, b1), c1), ((a2, b2), c2)) =>
            if (c1 != c2) c1 > c2
            else {
              val ca = cpCompare(a1, a2)
              if (ca != 0) ca < 0 else cpCompare(b1, b2) < 0
            }
        }.head
        merges += ((a, b))
        vocab = vocab.map { case (s, f) => (refMerge(s, a, b), f) }
      }
    }
    merges.toSeq
  }

  test("trainMerges tie-break is code-point order, not UTF-16 order") {
    // (x, U+E000) and (x, U+1F600 😀) tie at cnt=2: code points say
    // U+E000 < U+1F600, UTF-16 code units say the opposite (0xD83D
    // surrogate < 0xE000) — the trainer and the fixed reference must
    // both pick U+E000 first
    val e000 = "\ue000"
    val emoji = new String(Character.toChars(0x1f600))
    val text = s"x$e000 x$e000 x$emoji x$emoji"
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val got = Bpe.trainMerges(docs, nMerges = 2)
    assert(got.head == ("x", e000), s"got $got")
    val freqs = text.split(" ").groupBy(identity)
      .map { case (w, g) => w -> g.length.toLong }
    assert(got == refTrain(freqs, 2, 2L))
    // and the UTF-16 comparator would have picked the emoji first
    assert(List(e000, emoji).min == emoji,
      "fixture no longer exercises the UTF-16/code-point divergence")
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

  // ---- local reference longest-match encoder (code-point greedy) ----
  private def refLongestMatch(word: String, vocab: Set[String]): List[String] = {
    val maxLen = (vocab.map(_.length) + 1).max
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var i = 0
    while (i < word.length) {
      var found = -1
      var j = math.min(word.length, i + maxLen)
      while (j > i && found < 0) {
        if (vocab.contains(word.substring(i, j))) found = j
        else j -= 1
      }
      if (found < 0) found = i + Character.charCount(word.codePointAt(i))
      out += word.substring(i, found)
      i = found
    }
    out.toList
  }

  test("encodeLongestMatch picks maximal munch with single-char fallback") {
    val vocab = Seq("ab", "abc", "c")
    val got = Seq("abc abd xcab").toDF("text")
      .select(Bpe.encodeLongestMatch(col("text"), vocab).as("t"))
      .as[Seq[String]].head()
    assert(got == Seq("abc", "ab", "d", "x", "c", "ab"))
  }

  test("encodeLongestMatch equals the sequential reference on random text") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val vocab = (1 to 12).map(_ =>
        (1 to (2 + rnd.nextInt(3))).map(_ => ('a' + rnd.nextInt(3)).toChar)
          .mkString).distinct
      // words range over a WIDER alphabet than the vocab, so the
      // fallback path fires
      val words = (1 to 40).map(_ =>
        (1 to (1 + rnd.nextInt(10))).map(_ => ('a' + rnd.nextInt(5)).toChar)
          .mkString)
      val got = Seq(words.mkString(" ")).toDF("text")
        .select(Bpe.encodeLongestMatch(col("text"), vocab).as("t"))
        .as[Seq[String]].head()
      val want = words.flatMap(w => refLongestMatch(w, vocab.toSet))
      assert(got == want, s"trial $trial")
    }
  }

  test("encodeLongestMatch: multi-byte characters stay whole") {
    val vocab = Seq("éé", "日本")
    val text = "ééx 日本語 a😀b"
    val got = Seq(text).toDF("text")
      .select(Bpe.encodeLongestMatch(col("text"), vocab).as("t"))
      .as[Seq[String]].head()
    assert(got == Seq("éé", "x", "日本", "語",
      "a", "😀", "b"))
    val want = text.split(" ").toSeq
      .flatMap(w => refLongestMatch(w, vocab.toSet))
    assert(got == want)
  }

  test("encodeLongestMatch with a trained vocab: lossless, in-vocab tokens") {
    val docs = Seq(
      (1L, "banana bandana banana cabana"),
      (2L, "banana bandana cabana cabana")).toDF("doc_id", "text")
    val merges = Bpe.trainMerges(docs, nMerges = 6)
    val vocab = Bpe.vocabFromMerges(merges)
    assert(vocab.nonEmpty)
    val toks = docs.select(col("doc_id"),
        Bpe.encodeLongestMatch(col("text"), vocab).as("t"))
      .as[(Long, Seq[String])].collect().toMap
    assert(toks(1L).mkString ==
      "banana bandana banana cabana".split(" ").mkString)
    assert(toks.values.flatten.forall(t =>
      vocab.contains(t) || t.length == 1))
  }

  test("merge model table roundtrips and drives the encoder") {
    val docs = Seq((1L, "low lower lowest low low"),
      (2L, "newer newest new lower")).toDF("doc_id", "text")
    val merges = Bpe.trainMerges(docs, nMerges = 6)
    assert(merges.nonEmpty)
    val path = java.nio.file.Files
      .createTempDirectory("graft_bpe_model").toString + "/merges"
    Bpe.saveMerges(spark, merges, path)
    val loaded = Bpe.loadMerges(spark, path)
    assert(loaded == merges) // training order restored bit-exactly
    val enc = docs.select(Bpe.encodeLongestMatch(col("text"),
      Bpe.vocabFromMerges(loaded)).as("toks"))
      .as[Seq[String]].collect().toSeq
    val ref = docs.select(Bpe.encodeLongestMatch(col("text"),
      Bpe.vocabFromMerges(merges)).as("toks"))
      .as[Seq[String]].collect().toSeq
    assert(enc == ref)
    // non-dense rank table (a lost row) is rejected, not mis-replayed
    spark.read.parquet(path).filter(col("rank") =!= 1)
      .write.mode("overwrite").parquet(path + "2")
    intercept[IllegalArgumentException](Bpe.loadMerges(spark, path + "2"))
  }

  test("loadMerges rejects duplicate rank rows instead of picking one") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_bpe_dup").toString
    Seq((0, "a", "b"), (0, "b", "c"), (1, "c", "d"))
      .toDF("rank", "a", "b").write.mode("overwrite").parquet(dir)
    val e = intercept[IllegalArgumentException](Bpe.loadMerges(spark, dir))
    assert(e.getMessage.contains("duplicate rank"))
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

  // ---- byte-level (GPT-2) mode ----
  import graft.expressions.ByteRemap

  test("ByteRemap table is the GPT-2 bijection") {
    val printable = ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    assert(ByteRemap.byteToChar.length == 256)
    assert(ByteRemap.byteToChar.distinct.length == 256)
    for (b <- 0 to 255) {
      if (printable(b)) assert(ByteRemap.byteToChar(b) == b.toChar)
      else assert(ByteRemap.byteToChar(b) >= 256.toChar)
      assert(ByteRemap.charToByte(ByteRemap.byteToChar(b)) == b)
    }
    // non-printables get 256+k in increasing byte order (the GPT-2
    // running-counter construction)
    val others = (0 to 255).filterNot(printable)
    assert(others.map(ByteRemap.byteToChar(_).toInt) ==
      (256 until 256 + others.length))
    assert(others.length == 68)
  }

  test("byte remap round-trips arbitrary unicode strings byte-exactly") {
    val fixtures = Seq("", "abc", "caf\u00e9", "\u65e5\u672c\u8a9e",
      "\ud83d\ude42", "e\u0301", "\ue000",
      "mixed caf\u00e9 \ud83d\ude42 x")
    for (s <- fixtures) {
      val r = ByteRemap.remapString(s)
      assert(ByteRemap.unremapString(r) == s, s"fixture ${s.length}")
      // one remapped char per UTF-8 byte
      assert(r.length == s.getBytes("UTF-8").length)
    }
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 50) {
      val cps = (0 to rnd.nextInt(20)).map { _ =>
        rnd.nextInt(4) match {
          case 0 => 1 + rnd.nextInt(127)
          case 1 => 0x80 + rnd.nextInt(0x800 - 0x80)
          case 2 => 0x800 + rnd.nextInt(0xd800 - 0x800)
          case _ => 0x10000 + rnd.nextInt(0x1000)
        }
      }
      val s = cps.map(cp => new String(Character.toChars(cp))).mkString
      assert(ByteRemap.unremapString(ByteRemap.remapString(s)) == s,
        s"trial $trial")
    }
  }

  test("encodeBytesLongestMatch: multi-byte vocab, single-BYTE fallback, lossless") {
    val vocab = Seq("ab", "caf", "\u00e9", "\u65e5\u672c")
      .map(ByteRemap.remapString)
    val text = "caf\u00e9 ab\u8a9ex \u65e5\u672c\u8a9e"
    val got = Seq(text).toDF("text")
      .select(Bpe.encodeBytesLongestMatch(col("text"), vocab).as("t"))
      .as[Seq[String]].head()
    val rGo = ByteRemap.remapString("\u8a9e") // 語: NOT in vocab
    assert(rGo.length == 3)
    // 語 falls back to its three BYTES (the byte-level semantics the
    // char-level encoder cannot produce), everything else matches
    // vocab entries crossing UTF-8 boundaries
    val expect = Seq(ByteRemap.remapString("caf"),
      ByteRemap.remapString("\u00e9"), ByteRemap.remapString("ab")) ++
      rGo.map(_.toString) ++ Seq("x", ByteRemap.remapString("\u65e5\u672c")) ++
      rGo.map(_.toString)
    assert(got == expect)
    // losslessness across the whole text: concat + unremap restores
    // the concatenated words byte-exactly
    assert(ByteRemap.unremapString(got.mkString) ==
      text.split(" ").mkString)
  }

  test("trainMerges byteLevel merges across UTF-8 character boundaries") {
    // hottest pair = the two bytes OF é — a char-level trainer
    // can never produce this merge
    val docs = Seq((1L, "\u00e9a \u00e9b \u00e9c \u00e9d"))
      .toDF("doc_id", "text")
    val got = Bpe.trainMerges(docs, nMerges = 1, byteLevel = true)
    val c3 = ByteRemap.byteToChar(0xc3).toString
    val a9 = ByteRemap.byteToChar(0xa9).toString
    assert(got == Seq((c3, a9)))
    assert(ByteRemap.unremapString(c3 + a9) == "\u00e9")
  }

  test("byte-level full-text encode -> total ids -> decode is the identity") {
    val vocab = Seq("ab", "th", "the", ByteRemap.remapString("\u00e9"))
      .map(ByteRemap.remapString) // idempotent for the ASCII entries
    val idVocab = Bpe.byteIdVocab(vocab)
    // base alphabet first: ids 0..255 are the single bytes
    assert(idVocab.length >= 256 && idVocab.take(256).forall(_.length == 1))
    val texts = Seq(
      "the cab",                       // vocab hits + fallback
      "  leading and   multiple  ",    // whitespace runs survive
      "tabs\tand\nnewlines\r\n",       // control bytes survive
      "caf\u00e9 \u65e5\u672c\u8a9e \ud83d\ude42", // multi-byte + astral
      "",                              // empty text
      "é")                 // combining mark + private use
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val ids = df.select(col("doc_id"), Bpe.tokenIdsTotal(
      Bpe.encodeBytesFullText(col("text"), vocab), idVocab).as("ids"))
    // totality: no id is null (no OOV sentinel exists in this space)
    assert(ids.select(explode(col("ids")).as("i"))
      .filter(col("i").isNull).count() == 0)
    val back = ids.select(col("doc_id"),
      Bpe.decodeBytes(col("ids"), idVocab).as("t"))
      .as[(Long, String)].collect().toMap
    for ((t, i) <- texts.zipWithIndex)
      assert(back(i.toLong) == t, s"roundtrip broke doc $i")
    // random unicode fuzz incl. spaces
    val rnd = new scala.util.Random(23)
    val fuzz = (0 until 30).map { i =>
      val cps = (0 to rnd.nextInt(30)).map { _ =>
        rnd.nextInt(5) match {
          case 0 => 32 // space
          case 1 => 1 + rnd.nextInt(127)
          case 2 => 0x80 + rnd.nextInt(0x800 - 0x80)
          case 3 => 0x800 + rnd.nextInt(0xd800 - 0x800)
          case _ => 0x10000 + rnd.nextInt(0x1000)
        }
      }
      (1000L + i, cps.map(cp => new String(Character.toChars(cp))).mkString)
    }
    val fback = fuzz.toDF("doc_id", "text")
      .select(col("doc_id"), Bpe.decodeBytes(Bpe.tokenIdsTotal(
        Bpe.encodeBytesFullText(col("text"), vocab), idVocab), idVocab)
        .as("t"))
      .as[(Long, String)].collect().toMap
    for ((id, t) <- fuzz) assert(fback(id) == t, s"fuzz $id")
    // decodeBytes surfaces corruption LOUDLY: an out-of-range id
    // fails the job (ANSI element_at), never silently drops bytes
    intercept[org.apache.spark.SparkThrowable] {
      Seq(Seq(9999L)).toDF("ids")
        .select(Bpe.decodeBytes(col("ids"), idVocab).as("t")).head()
    }
  }

  test("trainMerges byteLevel equals the reference over remapped words") {
    val rnd = new scala.util.Random(99)
    val alphabet = Vector("a", "b", "\u00e9", "\u8a9e", "\ud83d\ude42")
    for (trial <- 1 to 3) {
      val words = (1 to 25).map(_ =>
        (1 to (1 + rnd.nextInt(4)))
          .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
      val text = rnd.shuffle(words ++ words.take(8)).mkString(" ")
      val docs = Seq((1L, text)).toDF("doc_id", "text")
      // reference: the SAME sequential trainer over byte-remapped
      // words (remapped chars are all BMP, so the code-point
      // reference symbolization = one symbol per byte)
      val freqs = text.split(" ").groupBy(identity)
        .map { case (w, g) => ByteRemap.remapString(w) -> g.length.toLong }
      val got = Bpe.trainMerges(docs, nMerges = 8, byteLevel = true)
      assert(got == refTrain(freqs, 8, 2L), s"trial $trial")
    }
  }
}
