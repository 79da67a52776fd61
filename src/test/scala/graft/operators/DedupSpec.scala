package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import sqlImplicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog", "s1"),
    (2L, "the quick brown fox jumps over the lazy dog", "s1"), // exact dup
    (3L, "the quick brown fox jumps over a lazy dog", "s1"),   // near dup
    (4L, "completely different text about spark engines", "s1"),
    (5L, "another unrelated document entirely here now", "s2")
  ).toDF("doc_id", "text", "source")

  test("exact dedup groups identical normalized text") {
    val out = Dedup.exact(docs)
    assert(out.count() == 4)
    assert(out.filter(col("n_copies") === 2)
      .select("keeper_doc_id").as[Long].head() == 1L)
  }

  test("ngramJaccardPairs finds near-dups, prefix filter preserves recall") {
    val out = Dedup.ngramJaccardPairs(docs, Seq("source"), threshold = 0.5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    // brute-force token-set jaccard >= 0.5 within source:
    // (1,2)=1.0, (1,3)&(2,3): sets {the,quick,brown,fox,jumps,over,lazy,dog}
    // vs +{a}: inter 8, union 9 → 0.889
    assert(out == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("ngramJaccardPairsFromTokens == ngramJaccardPairs on same docs") {
    // the share-one-tokenize entry must reproduce the docs-form
    // exactly (same base expression, same prefix tail) — exact
    // Double == on jaccard included
    val viaDocs = Dedup.ngramJaccardPairs(docs, Seq("source"), 0.5)
      .select("a_id", "b_id", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    val base = docs.select(col("doc_id").as("id"), col("source"),
        graft.functions.TextFunctions.tokenSet(col("text")).as("toks"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    base.count()
    val viaTokens = Dedup.ngramJaccardPairsFromTokens(base,
        Seq("source"), 0.5)
      .select("a_id", "b_id", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    assert(viaTokens == viaDocs)
    // and the minhash sketch derived from the same base equals the
    // docs-form sketch at shingleN = 1 (dedupe before vs after
    // hashing — same sorted-distinct hash set, same signature)
    val fromBase = base.select(col("id"),
        sort_array(array_distinct(
          transform(col("toks"), t => xxhash64(t)))).as("sh"))
      .withColumn("sig", graft.expressions.MinHashSig.of(col("sh"), 8))
      .as[(Long, Seq[Long], Seq[Long])].collect().toSet
    val fromDocs = Dedup.minhashSketch(docs, numHashes = 8, shingleN = 1)
      .as[(Long, Seq[Long], Seq[Long])].collect().toSet
    assert(fromBase == fromDocs)
  }

  test("minhashPairs finds identical docs (jaccard 1.0)") {
    val out = Dedup.minhashPairs(docs, threshold = 0.99, shingleN = 3)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(out.contains((1L, 2L)))
  }

  test("simhashPairs: identical docs at hamming 0") {
    val out = Dedup.simhashPairs(docs, maxHamming = 0)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 2L)))
  }

  test("hammingPairs equals brute force at every band count (pigeonhole)") {
    // random 64-bit codes plus planted hamming-1 neighbors; for
    // maxHamming <= bands-1 the band join must recover EXACTLY the
    // brute-force pair set — no pair lost (pigeonhole) or invented
    val rnd = new scala.util.Random(7)
    val codes = (1 to 60).map(i => (i.toLong, rnd.nextLong()))
    val planted = codes.take(10).map { case (i, c) =>
      (i + 100L, c ^ (1L << rnd.nextInt(64))) }
    val all = codes ++ planted
    for (bands <- Seq(4, 8); maxH <- Seq(0, 1, bands - 1)) {
      val expected = (for {
        (ia, ca) <- all; (ib, cb) <- all
        if ia < ib && java.lang.Long.bitCount(ca ^ cb) <= maxH
      } yield (ia, ib)).toSet
      val got = Dedup.hammingPairs(all.toDF("id", "code"),
          maxHamming = maxH, bands = bands)
        .select("a_id", "b_id").as[(Long, Long)].collect().toSet
      assert(got == expected, s"bands=$bands maxH=$maxH")
      assert(expected.nonEmpty || maxH > 0 || got.isEmpty)
    }
  }

  test("simhashProfile deterministic across runs") {
    val a = Dedup.simhashProfile(docs).orderBy("doc_id")
      .select("simhash").as[Long].collect().toSeq
    val b = Dedup.simhashProfile(docs).orderBy("doc_id")
      .select("simhash").as[Long].collect().toSeq
    assert(a == b)
  }

  test("embeddingCosinePairs finds blocked near-dups") {
    val embs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f), 0),
      (2L, Array(0.99f, 0.1f, 0.0f), 0),
      (3L, Array(0.0f, 1.0f, 0.0f), 0),
      (4L, Array(1.0f, 0.0f, 0.0f), 1) // same dir, other block
    ).toDF("vec_id", "embedding", "label")
    val out = Dedup.embeddingCosinePairs(embs, threshold = 0.9)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 2L)))
  }

  test("embeddingCosinePairs tiling is pair-exact at every tile count") {
    // the tiled plan must produce EXACTLY the blocked all-pairs set:
    // cross-tile pairs meet in one tile pair, diagonal tiles dedupe
    // on id order, no pair is lost or doubled at any T
    val rnd = new scala.util.Random(11)
    val embs = (1 to 40).map(i => (i.toLong,
      Array.fill(6)(rnd.nextFloat() - 0.5f), i % 2)).toDF(
      "vec_id", "embedding", "label")
    val expected = Dedup.embeddingCosinePairs(embs, 0.2, tiles = 1)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(expected.nonEmpty)
    for (t <- Seq(3, 8, 0)) { // 0 = auto-size from block stats
      val got = Dedup.embeddingCosinePairs(embs, 0.2, tiles = t)
        .select("a_id", "b_id").as[(Long, Long)].collect().toSet
      assert(got == expected, s"tiles=$t diverged from all-pairs")
    }
  }

  test("tiled join equals local all-pairs on 15 random corpora") {
    // randomized cross-check against a LOCAL quadratic scorer:
    // random sizes, block cardinalities, dims, thresholds and tile
    // counts — the tiling must never lose, duplicate or reorder a pair
    val rnd = new scala.util.Random(41)
    (1 to 15).foreach { trial =>
      val n = rnd.nextInt(50) + 10
      val nBlocks = rnd.nextInt(4) + 1
      val dim = rnd.nextInt(6) + 2
      val thr = rnd.nextDouble() * 0.6
      val tiles = rnd.nextInt(9) - 1 // -1..7: invalid→auto, 1..7 fixed
      val data = (1 to n).map(i => (i.toLong,
        Array.fill(dim)(rnd.nextFloat() - 0.5f), i % nBlocks))
      def cos(a: Array[Float], b: Array[Float]): Double = {
        def dot(x: Array[Float], y: Array[Float]) =
          x.zip(y).foldLeft(0.0)((s, p) => s + p._1.toDouble * p._2.toDouble)
        val d = math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))
        if (d == 0.0) 0.0 else dot(a, b) / d
      }
      val expected = (for {
        (ia, va, ba) <- data; (ib, vb, bb) <- data
        if ba == bb && ia < ib && cos(va, vb) >= thr
      } yield (ia, ib)).toSet
      val got = Dedup.embeddingCosinePairs(
          data.toDF("vec_id", "embedding", "label"), thr,
          tiles = math.max(0, tiles))
        .select("a_id", "b_id").as[(Long, Long)].collect().toSet
      assert(got == expected,
        s"trial $trial (n=$n blocks=$nBlocks dim=$dim thr=$thr tiles=$tiles)")
    }
  }

  test("embeddingCosinePairsLsh: verified subset of exact, finds identicals") {
    val embs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0),
      (2L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0), // identical -> every table collides
      (3L, Array(0.0f, 1.0f, 0.0f, 0.0f), 0)
    ).toDF("vec_id", "embedding", "label")
    val out = Dedup.embeddingCosinePairsLsh(embs, threshold = 0.9, dim = 4)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 2L)))
  }

  test("containmentPairs: directed subsumption, not symmetric jaccard") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "s"),
      // doc 2 ⊂ doc 1 (5 of 5 tokens) but jaccard is only 0.5
      (2L, "alpha beta gamma delta epsilon", "s"),
      (3L, "totally different words here now", "s"))
      .toDF("doc_id", "text", "source")
    val out = Dedup.containmentPairs(df, Seq("source"), 0.9)
      .select("a_id", "b_id", "containment")
      .as[(Long, Long, Double)].collect().toSet
    assert(out == Set((2L, 1L, 1.0))) // directed: 2-in-1 only
  }

  test("deduplicate facade: exact method keeps one copy per text") {
    val docs = Seq(
      (1L, "same text here", "s"), (2L, "SAME TEXT HERE  ", "s"),
      (3L, "unique document", "s"), (4L, "same text here", "s"))
      .toDF("doc_id", "text", "source")
    val kept = Dedup.deduplicate(docs, method = "exact")
      .select("doc_id").as[Long].collect().toSeq.sorted
    assert(kept == Seq(1L, 3L)) // min id survives each hash group
    // hash groups are transitively closed, so the exact method must
    // short-circuit to the keeper set: no connected-components loop,
    // whose localCheckpoint would leave an ExistingRDD scan in the plan
    val p = Dedup.deduplicate(docs, method = "exact")
      .queryExecution.executedPlan.toString
    assert(!p.contains("ExistingRDD"),
      s"exact dedup ran the CC loop it provably doesn't need:\n$p")
    intercept[IllegalArgumentException](
      Dedup.deduplicate(docs, method = "nope").count())
  }

  test("deduplicate facade: every method collapses identical docs") {
    // identical texts must collapse under EVERY pair-generation
    // method (jaccard/containment see identical token sets, minhash
    // identical signatures, simhash hamming 0)
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta", "s"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta", "s"),
      (3L, "totally different content with other words here", "s"))
      .toDF("doc_id", "text", "source")
    for (m <- Seq("jaccard", "containment", "minhash", "simhash")) {
      val kept = Dedup.deduplicate(docs, method = m, threshold = 0.9,
          blockingKeys = Seq("source"))
        .select("doc_id").as[Long].collect().toSeq.sorted
      assert(kept == Seq(1L, 3L), s"method=$m kept $kept")
    }
  }

  test("incrementalMinhash equals full minhashPairs restricted to batch x corpus") {
    // 10 triples: a base text, a near-dup twin (one extra token), and
    // an unrelated doc. ids with % 3 == 0 play the arriving batch, so
    // each (base, twin) near-dup pair crosses the batch/corpus split.
    // Same hash family on both paths => the asymmetric probe must
    // produce EXACTLY the self-join's cross pairs, reoriented to
    // (new_id, corpus_id) — LSH band keys, the signature prefilter
    // and the jaccard verify are all identical per pair.
    val texts = (0 until 10).flatMap { i =>
      val base = (0 until 10).map(k => s"w${i}_$k").mkString(" ")
      Seq((i * 3 + 0L, base), (i * 3 + 1L, base + s" extra$i"),
        (i * 3 + 2L, (0 until 8).map(k => s"other${i}_$k").mkString(" ")))
    }
    val all = texts.toDF("doc_id", "text")
    val batch = all.filter(col("doc_id") % 3 === 0)
    val corpus = all.filter(col("doc_id") % 3 =!= 0)
    val full = Dedup.minhashPairs(all, threshold = 0.7,
        numHashes = 16, bands = 4)
      .select("a_id", "b_id", "jaccard")
      .as[(Long, Long, Double)].collect()
    val expected = full.collect {
      case (a, b, j) if a % 3 == 0 && b % 3 != 0 => (a, b, j)
      case (a, b, j) if a % 3 != 0 && b % 3 == 0 => (b, a, j)
    }.toSet
    val got = Dedup.incrementalMinhash(batch, corpus, threshold = 0.7,
        numHashes = 16, bands = 4)
      .as[(Long, Long, Double)].collect().toSet
    assert(expected.nonEmpty, "degenerate fixture: no cross pairs planted")
    assert(got == expected)
  }

  test("incremental probe equals restricted self-join on random corpora") {
    // dense random corpora (12-token vocab, heavy overlap): the
    // equality with the self-join's cross pairs must hold wherever
    // the LSH bands land, not just on planted twins
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 5) {
      val vocab = (0 until 12).map(i => s"t$trial-$i")
      val docs = (0 until 30).map { i =>
        val n = 4 + rnd.nextInt(6)
        (i.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val df = docs.toDF("doc_id", "text")
      val full = Dedup.minhashPairs(df, threshold = 0.5,
          numHashes = 16, bands = 4)
        .select("a_id", "b_id", "jaccard")
        .as[(Long, Long, Double)].collect()
      val expected = full.collect {
        case (a, b, j) if a % 3 == 0 && b % 3 != 0 => (a, b, j)
        case (a, b, j) if a % 3 != 0 && b % 3 == 0 => (b, a, j)
      }.toSet
      val got = Dedup.incrementalMinhash(
          df.filter(col("doc_id") % 3 === 0),
          df.filter(col("doc_id") % 3 =!= 0),
          threshold = 0.5, numHashes = 16, bands = 4)
        .as[(Long, Long, Double)].collect().toSet
      assert(got == expected, s"trial $trial")
    }
  }

  test("incremental probe against a bucketed corpus band index shuffles only the batch side") {
    // the 100 TB shape the operator's scaladoc points at: the corpus
    // band projection is STORED bucketed by the band key, so the
    // daily probe equi-join shuffles only the (small) batch side —
    // exactly one hash exchange in the executed plan.
    spark.sql("DROP TABLE IF EXISTS graft_band_index_b")
    val corpus = (0 until 40).map(i =>
      (i.toLong, (0 until 6).map(k => s"c${i}_$k").mkString(" ")))
      .toDF("doc_id", "text")
    val batch = Seq((100L, (0 until 6).map(k => s"c1_$k").mkString(" ")))
      .toDF("doc_id", "text")
    def bandCols(df: org.apache.spark.sql.DataFrame) =
      Dedup.minhashSketch(df, numHashes = 16)
        .select(col("id"), explode(graft.functions.HashFunctions
          .bandKeys(col("sig"), 4, 4)).as("bk"))
        .select(col("id"),
          xxhash64(col("bk.band"), col("bk.key")).as("bandkey"))
    Bucketing.writeBucketed(bandCols(corpus), "graft_band_index_b",
      Seq("bandkey"), 4)
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val probe = bandCols(batch)
      val cands = spark.table("graft_band_index_b").alias("c")
        .join(probe.alias("n"), col("c.bandkey") === col("n.bandkey"))
        .select(col("n.id").as("new_id"), col("c.id").as("corpus_id"))
      // the batch doc copies corpus doc 1's text → all 4 bands agree
      assert(cands.count() >= 1)
      val exchanges = "Exchange hashpartitioning".r
        .findAllIn(cands.queryExecution.executedPlan.toString).length
      assert(exchanges == 1,
        s"expected only the batch-side exchange, got $exchanges:\n" +
          cands.queryExecution.executedPlan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("indexed incremental probe matches the derive-in-flight probe") {
    // the stored-index candidate path (bandkey = xxhash64(band, key))
    // must produce exactly the pairs of the struct-key path on dense
    // random corpora — same LSH family, same prefilter, same verify
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 3) {
      val vocab = (0 until 12).map(i => s"x$trial-$i")
      val docsR = (0 until 30).map { i =>
        val n = 4 + rnd.nextInt(6)
        (i.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val df = docsR.toDF("doc_id", "text")
      val batchSk = Dedup.minhashSketch(df.filter(col("doc_id") % 3 === 0),
        numHashes = 16)
      val corpusSk = Dedup.minhashSketch(df.filter(col("doc_id") % 3 =!= 0),
        numHashes = 16)
      val plain = Dedup.incrementalMinhashPairs(batchSk, corpusSk,
          threshold = 0.5, numHashes = 16, bands = 4)
        .as[(Long, Long, Double)].collect().toSet
      val indexed = Dedup.incrementalMinhashPairsIndexed(batchSk, corpusSk,
          Dedup.sketchBandIndex(corpusSk, numHashes = 16, bands = 4),
          threshold = 0.5, numHashes = 16, bands = 4)
        .as[(Long, Long, Double)].collect().toSet
      assert(indexed == plain, s"trial $trial")
    }
  }

  test("duplicatedSpanProfile: cross-doc, within-doc, and overlap union") {
    val docs = Seq(
      (1L, "a b c d e f"),   // shares run "a b c d" with doc 2
      (2L, "x a b c d y"),
      (3L, "p q r s t u"),   // unique — zero coverage
      (4L, "m n o m n o m n"), // period-3 self repeat — full coverage
      (5L, "a b")            // shorter than k — zero windows
    ).toDF("doc_id", "text")
    val out = Dedup.duplicatedSpanProfile(docs, k = 3)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // doc 1: dup windows at starts 0,1 ("a b c","b c d") → union [0,4)
    assert(out(1L) == ((6L, 4L, 4.0 / 6)))
    assert(out(2L) == ((6L, 4L, 4.0 / 6)))
    assert(out(3L) == ((6L, 0L, 0.0)))
    // doc 4: every window repeats within the doc → all 8 tokens covered
    assert(out(4L) == ((8L, 8L, 1.0)))
    assert(out(5L) == ((2L, 0L, 0.0)))
  }

  test("duplicatedSpanProfile equals a position-set reference on random corpora") {
    // reference: mark every token position covered by ANY window whose
    // text occurs >= 2 times in the corpus; coverage = |position set|.
    // The operator's sorted-sweep interval union must agree exactly.
    val rnd = new scala.util.Random(37)
    for (trial <- 1 to 5) {
      val vocab = Vector("aa", "bb", "cc", "dd") // tiny → forced repeats
      val docs = (0 until 25).map { i =>
        val n = rnd.nextInt(16)
        (i.toLong, (0 until n).map(_ => vocab(rnd.nextInt(4))).mkString(" "))
      }
      val k = 3
      val toks = docs.map { case (id, t) =>
        id -> t.split(" ").filter(_.nonEmpty).toVector }
      val wins = toks.flatMap { case (id, ts) =>
        (0 to ts.length - k).map(s => (id, s, ts.slice(s, s + k).mkString(" ")))
      }
      val occ = wins.groupBy(_._3).view.mapValues(_.size).toMap
      val dupPos = wins.filter(w => occ(w._3) >= 2).groupBy(_._1)
        .view.mapValues(_.flatMap(w => w._2 until w._2 + k).toSet).toMap
      val expect = toks.map { case (id, ts) =>
        id -> ((ts.length.toLong, dupPos.getOrElse(id, Set.empty[Int]).size.toLong))
      }.toMap
      val got = Dedup.duplicatedSpanProfile(docs.toDF("doc_id", "text"), k)
        .as[(Long, Long, Long, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got == expect, s"trial $trial")
    }
  }

  test("duplicatedSpanProfile shuffles on hash and doc id, never on pairs") {
    // scale pin: one exchange for the window-hash occurrence count,
    // one for the per-doc sweep (reused by the groupBy), one for the
    // base side of the coverage join — and NO join on the window hash
    // (count-over-partition replaces the candidate self-join).
    val docs = (0 until 40).map(i =>
      (i.toLong, (0 until 10).map(j => s"t${(i + j) % 7}").mkString(" ")))
      .toDF("doc_id", "text")
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val out = Dedup.duplicatedSpanProfile(docs, k = 3)
      out.count()
      val plan = out.queryExecution.executedPlan.toString
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(exchanges == 3, s"expected 3 hash exchanges, got $exchanges:\n$plan")
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoop"), plan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("duplicatedSpanProfile counts a window shared at the same start") {
    // identical docs: every window duplicated, coverage = n_tokens
    val docs = Seq((1L, "q w e r t"), (2L, "q w e r t"))
      .toDF("doc_id", "text")
    val out = Dedup.duplicatedSpanProfile(docs, k = 4)
      .as[(Long, Long, Long, Double)].collect()
    assert(out.forall(r => r._2 == 5L && r._3 == 5L && r._4 == 1.0))
  }

  test("pairRecall: orientation-normalized hit counting") {
    val exact = Seq((1L, 2L), (3L, 4L), (5L, 6L), (8L, 7L))
      .toDF("a_id", "b_id")
    // (2,1) reversed → still a hit; (9,10) is approx-only noise
    val approx = Seq((2L, 1L), (3L, 4L), (9L, 10L)).toDF("a_id", "b_id")
    val out = Dedup.pairRecall(approx, exact)
      .as[(Long, Long, Long, Double, Double)].head()
    assert(out == ((4L, 3L, 2L, 0.5, 2.0 / 3)))
  }

  test("normalizedExact merges case/punctuation/whitespace variants") {
    val docs = Seq(
      (1L, "Hello, World!"),
      (2L, "hello   world"),
      (3L, "HELLO WORLD."),
      (4L, "goodbye world")).toDF("doc_id", "text")
    val out = Dedup.normalizedExact(docs)
      .select("keeper_doc_id", "n_copies", "n_variants")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(out.sameElements(Array((1L, 3L, 3L), (4L, 1L, 1L))))
  }

  test("normalizeText: explicit class, collapse, trim") {
    val df = Seq(("  Foo!!  BAR\t42--baz  ",
      "foo bar 42 baz")).toDF("raw", "want")
    val got = df.select(graft.functions.TextFunctions
      .normalizeText(col("raw")).as("n"), col("want"))
      .as[(String, String)].head()
    assert(got._1 == got._2)
  }

  test("semDeDup: cell assignment, within-cell drop, cross-cell blind") {
    val embs = Seq(
      (0L, Array(1.0f, 0.0f)),   // cell 0
      (1L, Array(0.9f, 0.1f)),   // cell 0, cos(v0,v1)≈0.994 → dropped
      (2L, Array(0.0f, 1.0f)),   // cell 1
      (3L, Array(0.1f, 0.9f)),   // cell 1, cos(v2,v3)≈0.994 → dropped
      (4L, Array(-1.0f, 0.1f)))  // cell 1 (closer to (0,1)), dissimilar
      .toDF("vec_id", "embedding")
    val out = Dedup.semDeDup(embs,
        Seq(Seq(1.0, 0.0), Seq(0.0, 1.0)), threshold = 0.9)
      .as[(Long, Int, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out == Map(
      0L -> ((0, true)), 1L -> ((0, false)),
      2L -> ((1, true)), 3L -> ((1, false)), 4L -> ((1, true))))
  }

  test("semDeDup: near-identical vectors in DIFFERENT cells both survive") {
    // the cluster-scoped tradeoff the paper accepts: candidates are
    // generated within a cell only, so a boundary-straddling pair is
    // invisible — pin that this is the operator's contract
    val embs = Seq(
      (0L, Array(0.71f, 0.70f)),  // just inside cell 0
      (1L, Array(0.70f, 0.71f))) // just inside cell 1, cos≈1 with v0
      .toDF("vec_id", "embedding")
    val out = Dedup.semDeDup(embs,
        Seq(Seq(1.0, 0.0), Seq(0.0, 1.0)), threshold = 0.9)
      .as[(Long, Int, Boolean)].collect().map(r => r._1 -> r._3).toMap
    assert(out == Map(0L -> true, 1L -> true))
  }

  test("dedupLines removes cross-doc boilerplate, keeps in-doc repeats") {
    val lined = Seq(
      (1L, "COOKIE BANNER\nunique alpha\nunique alpha\nbody one"),
      (2L, "COOKIE BANNER\nbody two"),
      (3L, "body three\nCOOKIE BANNER"))
      .toDF("doc_id", "text")
    val out = Dedup.dedupLines(lined, minDf = 2)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // the banner (df=3) goes everywhere; "unique alpha" repeats only
    // WITHIN doc 1 (df=1) so both copies stay, in original order
    assert(out(1L) == ((4L, 1L, "unique alpha\nunique alpha\nbody one")))
    assert(out(2L) == ((2L, 1L, "body two")))
    assert(out(3L) == ((2L, 1L, "body three")))
  }

  test("dedupLines: all-boilerplate doc survives with empty text") {
    val lined = Seq((1L, "dup line"), (2L, "dup line"), (3L, "solo"))
      .toDF("doc_id", "text")
    val out = Dedup.dedupLines(lined, minDf = 2)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._3, r._4))).toMap
    assert(out(1L) == ((1L, "")) && out(2L) == ((1L, "")))
    assert(out(3L) == ((0L, "solo")))
  }

  test("dedupLines plans no pair join (degree-independent shape)") {
    val lined = (0 until 30).map(i =>
      (i.toLong, s"SHARED HEADER\nbody $i")).toDF("doc_id", "text")
    val out = Dedup.dedupLines(lined, minDf = 2)
    out.count()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"), plan)
  }

  test("canonicalizeUrl folds cosmetic variants, preserves real ones") {
    import graft.functions.TextFunctions
    val urls = Seq(
      "https://Example.COM/a/b",
      "https://www.example.com/a/b/",
      "https://example.com:443/a/b?utm_source=x&utm_medium=y",
      "https://example.com/a/b?z=1&a=2#frag",
      "http://example.com/a/b",      // scheme differs: distinct
      "https://example.com/a/B",     // path case differs: distinct
      "http://example.com:443/a/b",  // 443 is NOT http's default: kept
      "http://example.com:80/a/b",   // 80 IS http's default: stripped
      "mailto:user@example.com#x",   // non-hierarchical: opaque
      "/relative/path")              // no scheme: opaque
      .toDF("url")
    val canon = urls.select(
        TextFunctions.canonicalizeUrl(col("url")).as("c"))
      .as[String].collect()
    assert(canon(0) == "https://example.com/a/b")
    assert(canon(1) == "https://example.com/a/b")
    assert(canon(2) == "https://example.com/a/b")
    assert(canon(3) == "https://example.com/a/b?a=2&z=1")
    assert(canon(4) == "http://example.com/a/b")
    assert(canon(5) == "https://example.com/a/B")
    assert(canon(6) == "http://example.com:443/a/b")
    assert(canon(7) == "http://example.com/a/b")
    assert(canon(8) == "mailto:user@example.com") // fragment stripped only
    assert(canon(9) == "/relative/path")
  }

  test("urlDedup keeps min id per canonical with variant counts") {
    val docs = Seq(
      (5L, "https://A.com/x"),
      (9L, "https://a.com/x/"),
      (7L, "https://a.com/x?utm_source=s"),
      (3L, "https://a.com/y"))
      .toDF("doc_id", "url")
    val out = Dedup.urlDedup(docs)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out("https://a.com/x") == ((5L, 3L, 3L)))
    assert(out("https://a.com/y") == ((3L, 1L, 1L)))
  }

  test("urlDedup: null/empty URLs are singleton groups, never merged") {
    val docs = Seq(
      (5L, Some("https://A.com/x")),
      (9L, Some("https://a.com/x/")),
      (2L, None: Option[String]),
      (4L, None: Option[String]),
      (6L, Some("")))
      .toDF("doc_id", "url")
    val out = Dedup.urlDedup(docs)
      .as[(Option[String], Long, Long, Long)].collect()
    // the two real variants collapse; docs 2, 4, 6 each survive as
    // their own null-canonical group (silent data loss otherwise)
    assert(out.length == 4)
    assert(out.toSet.contains((Some("https://a.com/x"), 5L, 2L, 2L)))
    val noUrl = out.filter(_._1.isEmpty)
    assert(noUrl.map(_._2).sorted.toSeq == Seq(2L, 4L, 6L))
    assert(noUrl.forall(r => r._3 == 1L))
  }

  test("dedupLines: blank lines are paragraph breaks, never boilerplate") {
    // the blank between paragraphs appears in BOTH docs (df=2) but
    // must survive; the banner (also df=2) must not
    val docs = Seq(
      (1L, "BANNER\npara one\n\npara two"),
      (2L, "BANNER\npara three\n\npara four"))
      .toDF("doc_id", "text")
    val out = Dedup.dedupLines(docs, minDf = 2)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((4L, 1L, "para one\n\npara two")))
    assert(out(2L) == ((4L, 1L, "para three\n\npara four")))
  }

  test("dedupLinesWithin: repeated blank lines inside one doc survive") {
    val docs = Seq((1L, "alpha\n\nbeta\n\nalpha"))
      .toDF("doc_id", "text")
    val out = Dedup.dedupLinesWithin(docs)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((5L, 1L, "alpha\n\nbeta\n")))
  }

  test("cutDuplicatedSpans keeps the first occurrence, cuts the rest") {
    // identical docs: doc 1 keeps everything, doc 2 is fully cut
    val docs = Seq(
      (1L, "a b c d e"),
      (2L, "a b c d e"),
      (3L, "x y z w v"))
      .toDF("doc_id", "text")
    val out = Dedup.cutDuplicatedSpans(docs, k = 4)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((5L, 0L, "a b c d e")))
    assert(out(2L) == ((5L, 5L, "")))
    assert(out(3L) == ((5L, 0L, "x y z w v")))
  }

  test("cutDuplicatedSpans: partial overlap cuts only covered tokens") {
    // doc 2 embeds doc 1's 4-token run with unique flanks: exactly
    // the duplicated window's k tokens go; in-doc self-repeat keeps
    // its first window's tokens only
    val docs = Seq(
      (1L, "p q r s"),
      (2L, "u1 p q r s u2"),
      (3L, "m m m m m m"))
      .toDF("doc_id", "text")
    val out = Dedup.cutDuplicatedSpans(docs, k = 4)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._3, r._4))).toMap
    assert(out(1L) == ((0L, "p q r s")))
    assert(out(2L) == ((4L, "u1 u2")))
    // "m m m m m m": windows at 0,1,2 share a hash; keeper start=0
    // is PROTECTED (idx 0-3), the cuts at 1,2 cover idx 1-5 → only
    // the unprotected 4,5 go: one intact copy of the span survives
    assert(out(3L) == ((2L, "m m m m")))
  }

  test("cutDuplicatedSpans: overlapping spans keep one INTACT copy each") {
    // the keep-one contract under overlap: "a b c d" keeps its
    // doc-1 copy; "b c d e" keeps its doc-2 copy even though
    // "a b c d"'s cut covers doc 2's prefix — protection wins
    val docs = Seq(
      (1L, "x a b c d"),
      (2L, "a b c d e"),
      (3L, "b c d e f"))
      .toDF("doc_id", "text")
    val out = Dedup.cutDuplicatedSpans(docs, k = 4)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(out(1L) == "x a b c d")  // both its windows are keepers
    assert(out(2L) == "b c d e")    // "a" cut, keeper span intact
    assert(out(3L) == "f")          // its "b c d e" copy is non-first
  }

  test("cutDuplicatedSpans: short docs pass through untouched") {
    val docs = Seq((1L, "a b"), (2L, "a b")).toDF("doc_id", "text")
    val out = Dedup.cutDuplicatedSpans(docs, k = 4)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // no window of length 4 exists → nothing is duplicated
    assert(out(1L) == ((2L, 0L, "a b")) && out(2L) == ((2L, 0L, "a b")))
  }

  test("dedupLinesWithin: first occurrence kept, cross-doc repeats untouched") {
    val docs = Seq(
      (1L, "alpha\nbeta\nalpha\ngamma\nbeta"),
      (2L, "alpha\nalpha"),     // same line as doc 1: within-doc only
      (3L, "solo"))
      .toDF("doc_id", "text")
    val out = Dedup.dedupLinesWithin(docs)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((5L, 2L, "alpha\nbeta\ngamma")))
    assert(out(2L) == ((2L, 1L, "alpha"))) // doc 1's alpha irrelevant
    assert(out(3L) == ((1L, 0L, "solo")))
  }

  test("dedupLinesWithin: every exchange key contains the doc id") {
    // the operator's scaling promise: no data ever moves across
    // documents — pin that each hash exchange partitions on doc_id
    val docs = (0 until 20).map(i =>
      (i.toLong, s"x\nx\nbody $i")).toDF("doc_id", "text")
    val out = Dedup.dedupLinesWithin(docs)
    out.count()
    val plan = out.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning\\(([^)]*)\\)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(exchanges.nonEmpty, plan)
    assert(exchanges.forall(_.contains("doc_id")), plan)
  }

  test("winnowFingerprints and cutDuplicatedSpans plan no pair join") {
    val docs = (0 until 40).map(i =>
      (i.toLong, s"HEAD ER LINE tok$i " * 3)).toDF("doc_id", "text")
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      for (out <- Seq(Dedup.winnowFingerprints(docs, k = 3, w = 4),
        Dedup.cutDuplicatedSpans(docs, k = 3))) {
        out.count()
        val plan = out.queryExecution.executedPlan.toString
        assert(!plan.contains("CartesianProduct") &&
          !plan.contains("BroadcastNestedLoop"), plan)
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  // local winnowing reference (the sequential textbook algorithm,
  // rightmost-min tie rule)
  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def refWinnow(tokens: Seq[String], k: Int, w: Int)
  : Set[(Int, String)] = {
    // match shingles(): fewer than k tokens means NO windows —
    // sliding(k) would emit one undersized group and hash it
    if (tokens.size < k) return Set.empty
    val hs = tokens.sliding(k).map(g => md5hex(g.mkString(" ")))
      .toIndexedSeq
    if (hs.size < w) Set.empty
    else (0 to hs.size - w).map { j =>
      val win = j until j + w
      val minH = win.map(hs).min
      val pos = win.filter(i => hs(i) == minH).max // rightmost tie
      (pos, hs(pos))
    }.toSet
  }

  test("winnowFingerprints equals the sequential reference") {
    val rnd = new scala.util.Random(17)
    val corpora = Seq(
      // handcrafted: repeats force ties, short docs hit boundaries
      Seq("a a a a a a a a", "x y z x y z x y", "p q"),
      // random low-vocab docs
      (1 to 10).map(_ => (1 to 12 + rnd.nextInt(8))
        .map(_ => s"t${rnd.nextInt(4)}").mkString(" ")))
    for (texts <- corpora) {
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = Dedup.winnowFingerprints(docs, k = 3, w = 4)
        .as[(Long, Int, String)].collect()
        .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).toSet).toMap
      val want = texts.zipWithIndex.map { case (t, i) =>
        i.toLong -> refWinnow(t.split(" ").toSeq, 3, 4)
      }.filter(_._2.nonEmpty).toMap
      assert(got == want)
    }
  }

  // sequential reference for ROBUST winnowing (Schleimer Fig. 5):
  // ties prefer the previously selected fingerprint while it stays
  // in-window and minimal; else rightmost minimal
  private def refWinnowRobust(tokens: Seq[String], k: Int, w: Int)
  : Seq[(Int, String)] = {
    if (tokens.size < k) return Seq.empty
    val hs = tokens.sliding(k).map(g => md5hex(g.mkString(" ")))
      .toIndexedSeq
    if (hs.size < w) return Seq.empty
    var prev = -1
    val out = scala.collection.mutable.ArrayBuffer[(Int, String)]()
    for (i <- 0 to hs.size - w) {
      val win = i until i + w
      val m = win.map(hs).min
      if (!(prev >= i && hs(prev) == m)) {
        val p = win.filter(j => hs(j) == m).max
        out += ((p, m)); prev = p
      }
    }
    out.toSeq
  }

  test("winnowFingerprintsRobust equals the sequential Fig. 5 reference") {
    val rnd = new scala.util.Random(19)
    val corpora = Seq(
      // low-entropy runs are the whole point of the robust rule
      Seq("a a a a a a a a a a", "x y z x y z x y z", "p q", "a a a b"),
      (1 to 12).map(_ => (1 to 12 + rnd.nextInt(10))
        .map(_ => s"t${rnd.nextInt(3)}").mkString(" ")))
    for (texts <- corpora) {
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = Dedup.winnowFingerprintsRobust(docs, k = 3, w = 4)
        .as[(Long, Int, String)].collect()
        .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).toSet).toMap
      val want = texts.zipWithIndex.map { case (t, i) =>
        i.toLong -> refWinnowRobust(t.split(" ").toSeq, 3, 4).toSet
      }.filter(_._2.nonEmpty).toMap
      assert(got == want)
    }
  }

  test("robust winnowing: fewer fingerprints on runs, equal to basic " +
      "when no window ties") {
    // "a a a …" (12 tokens → 10 identical hashes, 7 windows): basic
    // re-selects the rightmost tie every window (7 fingerprints);
    // robust keeps a selection until it slides out of the window —
    // one per w windows (positions 3 and 7)
    val run = Seq((1L, Seq.fill(12)("a").mkString(" "))).toDF("doc_id", "text")
    val basic = Dedup.winnowFingerprints(run, k = 3, w = 4).count()
    val robust = Dedup.winnowFingerprintsRobust(run, k = 3, w = 4).count()
    assert(robust == 2L && basic == 7L)
    // all-distinct tokens → no ties → the two rules coincide
    val uniq = Seq((1L, (1 to 15).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val b = Dedup.winnowFingerprints(uniq, k = 3, w = 4)
      .as[(Long, Int, String)].collect().toSet
    val r = Dedup.winnowFingerprintsRobust(uniq, k = 3, w = 4)
      .as[(Long, Int, String)].collect().toSet
    assert(b == r && b.nonEmpty)
  }

  test("winnowPairs: match counts, stop-fingerprint cap") {
    // docs 1 and 2 are identical → every fingerprint shared; doc 3
    // is unrelated. With maxDf=10 nothing is capped here; with
    // maxDf=1 EVERYTHING shared is capped → zero pairs.
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "a b c d e f g h"),
      (3L, "q r s t u v w x"))
      .toDF("doc_id", "text")
    val pairs = Dedup.winnowPairs(docs, k = 3, w = 4, maxDf = 10)
      .as[(Long, Long, Long)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L)))
    assert(pairs.head._3 >= 1L)
    assert(Dedup.winnowPairs(docs, k = 3, w = 4, maxDf = 1).isEmpty)
  }

  test("winnowing guarantee: shared run >= w+k-1 shares a fingerprint") {
    val rnd = new scala.util.Random(23)
    val k = 3; val w = 4
    val shared = (1 to (w + k - 1)).map(_ => s"s${rnd.nextInt(3)}")
    def noise(n: Int) = (1 to n).map(_ => s"n${rnd.nextInt(5)}")
    val docs = (0 until 6).map { i =>
      val t = (noise(3 + rnd.nextInt(5)) ++ shared ++ noise(3 + rnd.nextInt(5)))
        .mkString(" ")
      (i.toLong, t)
    }.toDF("doc_id", "text")
    val fps = Dedup.winnowFingerprints(docs, k, w)
      .as[(Long, Int, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    // every pair of docs embeds the same (w+k-1)-token run → every
    // pair must share at least one fingerprint hash
    for (a <- 0L until 6L; b <- (a + 1) until 6L)
      assert(fps(a).intersect(fps(b)).nonEmpty, s"pair ($a,$b)")
  }

  test("decontaminateSpans: merged token intervals per (doc, bench)") {
    import sqlImplicits._
    // bench doc 100: "b0 b1 ... b9"; corpus doc 1 embeds tokens
    // b2..b7 (one 6-token leak) at offset 3, doc 2 embeds b0..b3 and
    // b6..b9 as two separated 4-token leaks, doc 3 is clean
    val b = (0 to 9).map(i => s"b$i")
    val docs = Seq(
      (1L, ("x1 x2 x3 " + b.slice(2, 8).mkString(" ") + " y1 y2")),
      (2L, (b.slice(0, 4).mkString(" ") + " z1 z2 z3 z4 z5 " +
        b.slice(6, 10).mkString(" "))),
      (3L, "totally clean unrelated text here okay")
    ).toDF("doc_id", "text")
    val bench = Seq((100L, b.mkString(" "))).toDF("id", "text")
    val out = Dedup.decontaminateSpans(docs, bench, k = 4)
      .select(col("doc_id").cast("long"), col("bench_id").cast("long"),
        col("span_start").cast("long"), col("span_end").cast("long"),
        col("span_tokens").cast("long"), col("n_windows").cast("long"))
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    // doc 1: b2..b7 at token offsets 3..8 → windows at starts 3,4,5
    // merge to span [3, 9) = 6 tokens; doc 2: [0, 4) and [9, 13)
    assert(out == Set(
      (1L, 100L, 3L, 9L, 6L, 3L),
      (2L, 100L, 0L, 4L, 4L, 1L),
      (2L, 100L, 9L, 13L, 4L, 1L)))
  }

  test("decontaminateSpans plan: bench windows broadcast, corpus " +
    "side never shuffle-joins for the match") {
    import sqlImplicits._
    val docs = Seq((1L, "a b c d e f g h")).toDF("doc_id", "text")
    val bench = Seq((9L, "c d e f")).toDF("id", "text")
    val out = Dedup.decontaminateSpans(docs, bench, k = 4)
    out.count()
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("ShuffledHashJoin"), plan)
  }

  test("thresholdSweep: monotone curve with exact counts per bar") {
    import sqlImplicits._
    // A/B identical (jac 1.0); A/C share 3 of 4 tokens (jac 0.6) --
    // wait: |A|=3,|C|=4,inter=3 -> 3/4 = 0.75; D unrelated
    val docs = Seq(
      (1L, "x", "a b c"), (2L, "x", "a b c"),
      (3L, "x", "a b c d"), (4L, "x", "zz yy")).toDF("doc_id", "source", "text")
    val out = Dedup.thresholdSweep(docs, Seq("source"),
        Seq(0.7, 0.8, 1.0))
      .orderBy("threshold")
      .select("threshold", "n_pairs", "n_dup_docs", "n_survivors")
      .as[(Double, Long, Long, Long)].collect().toSeq
    // pairs: (1,2)=1.0, (1,3)=(2,3)=0.75
    assert(out == Seq(
      (0.7, 3L, 2L, 2L),   // dup docs {2, 3}
      (0.8, 1L, 1L, 3L),   // only (1,2)
      (1.0, 1L, 1L, 3L)))
  }

  test("thresholdSweep plan guard: per-threshold legs scan the cached " +
    "pair table, never re-run the candidate join") {
    import sqlImplicits._
    val docs = Seq(
      (1L, "x", "a b c"), (2L, "x", "a b c"),
      (3L, "x", "a b c d"), (4L, "x", "zz yy")).toDF("doc_id", "source", "text")
    val sweep = Dedup.thresholdSweep(docs, Seq("source"), Seq(0.7, 0.8, 1.0))
    sweep.count()
    // walk the final plan but STOP at cache scans: anything inside
    // the InMemoryRelation ran once when ngramJaccardPairs counted it
    def outsideCache(p: org.apache.spark.sql.execution.SparkPlan)
    : Seq[org.apache.spark.sql.execution.SparkPlan] = {
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
      p match {
        case _: InMemoryTableScanExec => Seq(p)
        case a: AdaptiveSparkPlanExec => p +: outsideCache(a.executedPlan)
        case q: QueryStageExec => p +: outsideCache(q.plan)
        case other => p +: other.children.flatMap(outsideCache)
      }
    }
    val nodes = outsideCache(sweep.queryExecution.executedPlan).map(_.nodeName)
    // every threshold leg reads the ngramJaccardPairs cache ...
    assert(nodes.count(_ == "InMemoryTableScan") >= 3,
      s"expected one cached pair-table scan per threshold:\n${nodes.mkString(",")}")
    // ... and no join (the candidate join, the set-fetch joins) ever
    // re-runs outside it
    assert(!nodes.exists(_.contains("Join")),
      s"candidate join leaked outside the cache:\n${nodes.mkString(",")}")
  }
}
