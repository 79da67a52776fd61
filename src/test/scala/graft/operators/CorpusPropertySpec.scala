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
}
