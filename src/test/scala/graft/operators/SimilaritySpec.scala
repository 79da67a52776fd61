package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import sqlImplicits._

  private def corpus = Seq(
    (1L, Array(1.0f, 0.0f)),
    (2L, Array(0.9f, 0.1f)),
    (3L, Array(0.0f, 1.0f)),
    (4L, Array(-1.0f, 0.0f)),
    (5L, Array(0.8f, 0.2f))
  ).toDF("vec_id", "embedding")

  test("bruteForceTopK ranks by cosine desc, ties by id") {
    val probes = corpus.filter(col("vec_id") === 1L)
    val out = Similarity.bruteForceTopK(corpus, probes, k = 3)
      .orderBy("rank")
      .select("rank", "neighbor_id").as[(Int, Long)].collect().toSeq
    assert(out.map(_._2) == Seq(2L, 5L, 3L))
    assert(out.map(_._1) == Seq(1, 2, 3))
  }

  test("bruteForceTopK caps at k and excludes self") {
    val probes = corpus.filter(col("vec_id") <= 2L)
    val out = Similarity.bruteForceTopK(corpus, probes, k = 2)
    assert(out.count() == 4)
    assert(out.filter(col("probe_id") === col("neighbor_id")).count() == 0)
  }

  test("recallAtK scores approximate vs exact neighbor sets") {
    val exact = Seq(
      (1L, 1, 10L), (1L, 2, 11L), (1L, 3, 12L),
      (2L, 1, 20L), (2L, 2, 21L), (2L, 3, 22L))
      .toDF("probe_id", "rank", "neighbor_id")
    val approx = Seq(
      (1L, 1, 10L), (1L, 2, 99L), (1L, 3, 12L), // 2/3
      (2L, 1, 77L)) // 0/3
      .toDF("probe_id", "rank", "neighbor_id")
    val out = Similarity.recallAtK(approx, exact, 3)
      .select("probe_id", "n_exact", "n_hit", "recall")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(out == Set((1L, 3L, 2L, 2.0 / 3), (2L, 3L, 0L, 0.0)))
  }

  test("lshTopK returns only same-bucket candidates ranked by cosine") {
    val out = Similarity.lshTopK(corpus, corpus.filter(col("vec_id") === 1L),
      k = 3, dim = 2, nBits = 2)
    // sanity: no self pairs, ranks contiguous from 1
    assert(out.filter(col("probe_id") === col("neighbor_id")).count() == 0)
    val ranks = out.orderBy("rank").select("rank").as[Int].collect().toSeq
    assert(ranks == (1 to ranks.size))
  }

  test("hardNegatives: most-similar DIFFERENT-label vectors only") {
    val labeled = Seq(
      (1L, 0, Array(1.0f, 0.0f)),
      (2L, 0, Array(0.9f, 0.1f)),   // same label as probe: excluded
      (3L, 1, Array(0.8f, 0.2f)),   // different label, very similar
      (4L, 1, Array(0.0f, 1.0f)),   // different label, orthogonal
      (5L, 2, Array(-1.0f, 0.0f)))  // different label, opposite
      .toDF("vec_id", "label", "embedding")
    val out = Similarity.hardNegatives(labeled,
        labeled.filter(col("vec_id") === 1L), k = 3)
      .orderBy("rank").select("rank", "neighbor_id")
      .as[(Int, Long)].collect().toSeq
    // 2 (the nearest overall) is a positive — filtered; hardest
    // negative is 3, then 4, then 5
    assert(out == Seq((1, 3L), (2, 4L), (3, 5L)))
  }

  // ---- bitextMine (Artetxe & Schwenk margin criterion) ----

  /** Sequential reference of the whole mining chain in the same IEEE
    * order: per-side top-k, 1e-9 tick floors, exact long sums, the
    * single integer division, argmax per x, threshold. */
  private def mineRef(xs: Seq[(Long, Array[Float])],
                      ys: Seq[(Long, Array[Float])],
                      k: Int, minFp: Long): Set[(Long, Long, Long)] = {
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val d = math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))
      if (d == 0.0) 0.0 else dot(a, b) / d
    }
    def fp(c: Double): Long = math.floor(c * 1e9).toLong
    def topk(q: Array[Float], side: Seq[(Long, Array[Float])]) =
      side.map { case (id, v) => (id, cos(q, v)) }
        .sortBy { case (id, c) => (-c, id) }.take(k)
    val fwd = xs.map { case (x, v) => x -> topk(v, ys) }.toMap
    val bwd = ys.map { case (y, v) => y -> topk(v, xs) }.toMap
    val sumX = fwd.view.mapValues(_.map(t => fp(t._2)).sum).toMap
    val sumY = bwd.view.mapValues(_.map(t => fp(t._2)).sum).toMap
    val cands = fwd.toSeq.flatMap { case (x, nn) => nn.map(t => (x, t._1, t._2)) } ++
      bwd.toSeq.flatMap { case (y, nn) => nn.map(t => (t._1, y, t._2)) }
    val margins = cands.distinct.flatMap { case (x, y, c) =>
      val den = sumX(x) + sumY(y)
      if (fp(c) > 0 && den > 0)
        Some((x, y, fp(c) * (2L * k) * 1000000L / den))
      else None
    }
    margins.groupBy(_._1).values.flatMap { ms =>
      val best = ms.minBy { case (_, y, m) => (-m, y) }
      if (best._3 >= minFp) Some(best) else None
    }.toSet
  }

  test("bitextMine matches the sequential margin reference bit-for-bit") {
    val rnd = new scala.util.Random(29)
    (1 to 3).foreach { trial =>
      def side(n: Int, off: Long) = (0 until n).map(i =>
        (off + i, Array.fill(8)(rnd.nextFloat() - 0.3f)))
      val xs = side(40, 0L)
      val ys = side(40, 1000L)
      val got = Similarity.bitextMine(
        xs.toDF("vec_id", "embedding"), ys.toDF("vec_id", "embedding"),
        k = 3, marginFpMin = 900000L)
        .select("x_id", "y_id", "margin_fp")
        .as[(Long, Long, Long)].collect().toSet
      assert(got == mineRef(xs, ys, 3, 900000L), s"trial $trial")
    }
  }

  test("bitextMine: the margin demotes hub pairs below exclusive pairs") {
    // y1 is (nearly) x1's translation; hub is moderately close to
    // EVERY x — raw cosine would hand several x's the hub, the
    // margin normalizes it away by its own dense neighborhood
    val xs = Seq(
      (1L, Array(1.0f, 0.05f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.05f, 0.0f)),
      (3L, Array(0.0f, 0.05f, 1.0f, 0.0f)))
    val ys = Seq(
      (11L, Array(1.0f, 0.0f, 0.05f, 0.0f)), // x1's pair
      (12L, Array(0.5f, 0.5f, 0.5f, 0.5f))) // the hub
    val mined = Similarity.bitextMine(
      xs.toDF("vec_id", "embedding"), ys.toDF("vec_id", "embedding"),
      k = 2, marginFpMin = 0L)
      .select("x_id", "y_id", "margin_fp")
      .as[(Long, Long, Long)].collect()
    val byPair = mined.map(r => (r._1, r._2) -> r._3).toMap
    assert(byPair.contains((1L, 11L)), s"true pair not mined: $mined")
    // the exclusive pair's margin beats every hub pairing
    val hubMargins = mined.filter(_._2 == 12L).map(_._3)
    assert(hubMargins.forall(_ < byPair((1L, 11L))),
      s"hub outscored the exclusive pair: $mined")
    assert(mined.toSet == mineRef(xs, ys, 2, 0L))
  }

  test("bitextMine: non-positive cosine or neighborhood never mined") {
    val xs = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(-1.0f, 0.0f)))
    val ys = Seq((11L, Array(-1.0f, 0.0f)), (12L, Array(-0.9f, -0.1f)))
    // every forward cosine from x1 is negative → x1 mines nothing;
    // x2 pairs positively and mines its best
    val mined = Similarity.bitextMine(
      xs.toDF("vec_id", "embedding"), ys.toDF("vec_id", "embedding"),
      k = 2, marginFpMin = 0L)
      .select("x_id", "y_id", "margin_fp")
      .as[(Long, Long, Long)].collect().toSet
    assert(mined.map(_._1) == Set(2L))
    assert(mined == mineRef(xs, ys, 2, 0L))
  }
}
