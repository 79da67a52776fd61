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
}
