package graft.operators

import graft.SparkSpec

/** Randomized cross-checks for the r4 corpus operators against
  * straightforward local references. */
class CorpusPropertySpec extends SparkSpec {
  import sqlImplicits._

  test("chunkTokens covers every token exactly once at stride == size " +
    "and matches a local slicer on random inputs") {
    val rnd = new scala.util.Random(41)
    (1 to 12).foreach { trial =>
      val size = rnd.nextInt(6) + 1
      val stride = rnd.nextInt(size) + 1 // 1 <= stride <= size
      val docs = (1 to 8).map { id =>
        val n = rnd.nextInt(20)
        (id.toLong, (0 until n).map(i => s"t$i").mkString(" "))
      }
      val got = Corpus.chunkTokens(docs.toDF("doc_id", "text"), size, stride)
        .as[(Long, Long, Long, String)].collect()
        .groupBy(_._1).view.mapValues(_.sortBy(_._2).toSeq).toMap
      docs.foreach { case (id, text) =>
        val toks = text.split(" ").filter(_.nonEmpty).toSeq
        if (toks.isEmpty) assert(!got.contains(id), s"trial $trial doc $id")
        else {
          val expected = (0 until toks.size by stride).zipWithIndex.map {
            case (start, idx) =>
              val chunk = toks.slice(start, start + size)
              (id, idx.toLong, chunk.size.toLong, chunk.mkString(" "))
          }
          assert(got(id) == expected,
            s"trial $trial doc $id size=$size stride=$stride")
          // stride == size → chunks partition the token sequence
          if (stride == size)
            assert(got(id).map(_._4).mkString(" ") == toks.mkString(" "))
        }
      }
    }
  }

  test("containmentPairs equals the brute-force reference on random corpora") {
    val rnd = new scala.util.Random(59)
    val vocab = (0 until 12).map(i => s"w$i")
    (1 to 8).foreach { trial =>
      val docs = (1 to 14).map { id =>
        val n = rnd.nextInt(8) + 1
        (id.toLong,
          Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "), "blk")
      }
      val tau = 0.8
      val sets = docs.map { case (id, text, _) =>
        id -> text.split(" ").filter(_.nonEmpty).toSet }.toMap
      val expected = (for {
        (a, sa) <- sets.toSeq; (b, sb) <- sets.toSeq
        if a != b
        c = sa.intersect(sb).size.toDouble / sa.size
        if c >= tau
      } yield (a, b)).toSet
      val got = Dedup.containmentPairs(
          docs.toDF("doc_id", "text", "source"), Seq("source"), tau)
        .select("a_id", "b_id").as[(Long, Long)].collect().toSet
      assert(got == expected, s"trial $trial: docs=$docs")
    }
  }

  test("qualityClassifier equals an exact local reference on random corpora") {
    val rnd = new scala.util.Random(71)
    val vocab = (0 until 10).map(i => s"w$i")
    (1 to 6).foreach { trial =>
      val docs = (1 to 12).map { id =>
        val n = rnd.nextInt(10) + 1
        (id.toLong, rnd.nextBoolean(),
          Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      // local fit: per-token class instance counts
      val toks = docs.map { case (id, pos, t) =>
        (id, pos, t.split(" ").filter(_.nonEmpty).toSeq) }
      val cntPos = toks.filter(_._2).flatMap(_._3)
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val cntNeg = toks.filterNot(_._2).flatMap(_._3)
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val totPos = cntPos.values.sum
      val totNeg = cntNeg.values.sum
      val v = (cntPos.keySet ++ cntNeg.keySet).size.toLong
      def tick(tok: String): Long = math.floor(1000000.0 *
        (((cntPos.getOrElse(tok, 0L) + 1).toDouble * (totNeg + v).toDouble) /
          ((cntNeg.getOrElse(tok, 0L) + 1).toDouble * (totPos + v).toDouble)))
        .toLong
      val expected = toks.filter(_._3.nonEmpty).map { case (id, _, ts) =>
        val score = ts.map(tick).sum
        (id, ts.size.toLong, score, score >= ts.size.toLong * 1000000L)
      }.toSet
      val got = Corpus.qualityClassifier(
          docs.toDF("doc_id", "is_pos", "text"), org.apache.spark.sql
            .functions.col("is_pos"))
        .as[(Long, Long, Long, Boolean)].collect().toSet
      assert(got == expected, s"trial $trial")
    }
  }

  test("dsirWeights equals an exact local reference on random corpora") {
    val rnd = new scala.util.Random(83)
    val vocab = (0 until 8).map(i => s"w$i")
    val nBuckets = 64
    def md5b(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(4), 16) % nBuckets
    }
    (1 to 6).foreach { trial =>
      val docs = (1 to 12).map { id =>
        val n = rnd.nextInt(10) + 1
        (id.toLong, rnd.nextBoolean(),
          Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val grams = docs.map { case (id, t, text) =>
        val ts = text.split(" ").filter(_.nonEmpty).toSeq
        (id, t, ts.sliding(2).filter(_.size == 2)
          .map(_.mkString(" ")).map(md5b).toSeq)
      }
      val cntT = grams.filter(_._2).flatMap(_._3)
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val cntR = grams.flatMap(_._3)
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val totT = cntT.values.sum
      val totR = cntR.values.sum
      def tick(b: Long): Long = math.floor(1000000.0 *
        (((cntT.getOrElse(b, 0L) + 1).toDouble * (totR + nBuckets).toDouble) /
          ((cntR.getOrElse(b, 0L) + 1).toDouble * (totT + nBuckets).toDouble)))
        .toLong
      val weights = grams.filter(_._3.nonEmpty).map { case (id, _, bs) =>
        (id, bs.size.toLong, bs.map(tick).sum) }
      val selectN = 5L
      val topIds = weights.sortBy(w => (-w._3, w._1)).take(selectN.toInt)
        .map(_._1).toSet
      val expected = weights.map { case (id, n, w) =>
        (id, n, w, topIds.contains(id)) }.toSet
      val got = Corpus.dsirWeights(docs.toDF("doc_id", "is_t", "text"),
          org.apache.spark.sql.functions.col("is_t"), selectN, nBuckets)
        .as[(Long, Long, Long, Boolean)].collect().toSet
      assert(got == expected, s"trial $trial")
    }
  }

  test("semDeDup equals the brute-force reference on random vectors") {
    val rnd = new scala.util.Random(97)
    val dim = 4
    val centroids = Seq(
      Seq(1.0, 0.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0, 0.0),
      Seq(0.0, 0.0, 1.0, 0.0))
    (1 to 6).foreach { trial =>
      val vecs = (0 until 15).map { id =>
        (id.toLong, Array.fill(dim)(rnd.nextFloat() * 2 - 1)) }
      // reference: same left-to-right double folds as the operator
      def d2(v: Array[Float], c: Seq[Double]): Double =
        v.map(_.toDouble).zip(c).foldLeft(0.0) {
          case (acc, (x, y)) => acc + (x - y) * (x - y) }
      def cell(v: Array[Float]): Int =
        centroids.zipWithIndex.minBy { case (c, i) => (d2(v, c), i) }._2
      def nrm(v: Array[Float]): Double = math.sqrt(v.map(_.toDouble)
        .foldLeft(0.0)((acc, x) => acc + x * x))
      def cos(a: Array[Float], b: Array[Float]): Double = {
        val d = nrm(a) * nrm(b)
        if (d == 0.0) 0.0
        else a.map(_.toDouble).zip(b.map(_.toDouble))
          .foldLeft(0.0) { case (acc, (x, y)) => acc + x * y } / d
      }
      val tau = 0.8
      val cells = vecs.map { case (id, v) => id -> cell(v) }.toMap
      val expected = vecs.map { case (id, v) =>
        val dropped = vecs.exists { case (oid, ov) =>
          oid < id && cells(oid) == cells(id) && cos(ov, v) >= tau }
        (id, cells(id), !dropped)
      }.toSet
      val got = Dedup.semDeDup(vecs.toDF("vec_id", "embedding"),
          centroids, tau)
        .as[(Long, Int, Boolean)].collect().toSet
      assert(got == expected, s"trial $trial")
    }
  }
}
