package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IvfSpec extends SparkSpec {
  import sqlImplicits._

  private def corpus = {
    val rnd = new scala.util.Random(3)
    // two well-separated clusters around (±5, 0...)
    (1 to 60).map { i =>
      val c = if (i % 2 == 0) 5.0f else -5.0f
      (i.toLong, Array(c + rnd.nextFloat() * 0.1f, rnd.nextFloat(),
        rnd.nextFloat(), rnd.nextFloat()))
    }.toDF("vec_id", "embedding")
  }

  test("trainCentroids returns nCells x dim and separates clusters") {
    val cents = Ivf.trainCentroids(corpus, nCells = 2, lloydIters = 2)
    assert(cents.size == 2 && cents.forall(_.size == 4))
    val xs = cents.map(_.head).sorted
    assert(xs.head < -3 && xs.last > 3) // one centroid per cluster
  }

  test("ivfTopK with full probing matches brute force") {
    val probes = corpus.filter(col("vec_id") <= 4)
    val ivf = Ivf.ivfTopK(corpus, probes, k = 3, nCells = 2, nProbe = 2)
      .orderBy("probe_id", "rank")
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect().toSeq
    val brute = Similarity.bruteForceTopK(corpus, probes, k = 3)
      .orderBy("probe_id", "rank")
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect().toSeq
    assert(ivf == brute) // nProbe == nCells → exhaustive → identical
  }

  test("ivfTopK plans and runs at nCells=1024 (centroid matrix is data, not code)") {
    // the per-cell array(...) shape this replaced grew one
    // aggregate/zip_with subtree per centroid: at 1024 cells the
    // analyzer stalls and codegen's 64KB method limit trips long
    // before the 100 TB-scale cell counts. The fold-over-literal
    // shape keeps the expression tree O(1) in nCells — this test is
    // the regression guard (it fails by hanging/erroring, not by
    // assertion, if the per-cell shape comes back).
    val rnd = new scala.util.Random(7)
    val big = (1 to 1200).map(i =>
        (i.toLong, Array.fill(8)(rnd.nextFloat() - 0.5f)))
      .toDF("vec_id", "embedding")
    val probes = big.filter(col("vec_id") <= 2)
    val out = Ivf.ivfTopK(big, probes, k = 3, nCells = 1024, nProbe = 16,
      lloydIters = 1).collect()
    assert(out.map(_.getLong(0)).toSet == Set(1L, 2L)) // both probes answered
    assert(out.length >= 2 && out.length <= 6)         // <= 2 probes x k
  }

  test("pre-trained overload searches identically against fixed centroids") {
    val probes = corpus.filter(col("vec_id") <= 4)
    val cents = Ivf.trainCentroids(corpus, nCells = 2, lloydIters = 2)
    val pre = Ivf.ivfTopK(corpus, probes, 3, cents, nProbe = 2,
      "vec_id", "embedding").orderBy("probe_id", "rank")
      .as[(Long, Int, Long, Double)].collect().toSeq
    val self = Ivf.ivfTopK(corpus, probes, 3, nCells = 2, nProbe = 2)
      .orderBy("probe_id", "rank")
      .as[(Long, Int, Long, Double)].collect().toSeq
    assert(pre == self) // same (deterministic) training -> same search
  }

  test("centroid model table roundtrips and drives the pre-trained search") {
    val cents = Ivf.trainCentroids(corpus, nCells = 2, lloydIters = 2)
    val path = java.nio.file.Files
      .createTempDirectory("graft_ivf_model").toString + "/centroids"
    Ivf.saveCentroids(spark, cents, path)
    val loaded = Ivf.loadCentroids(spark, path)
    assert(loaded == cents) // bit-exact roundtrip, cell order restored
    val probes = corpus.filter(col("vec_id") <= 4)
    val fromDisk = Ivf.ivfTopK(corpus, probes, 3, loaded, nProbe = 2,
        "vec_id", "embedding").orderBy("probe_id", "rank")
      .as[(Long, Int, Long, Double)].collect().toSeq
    val inMem = Ivf.ivfTopK(corpus, probes, 3, cents, nProbe = 2,
        "vec_id", "embedding").orderBy("probe_id", "rank")
      .as[(Long, Int, Long, Double)].collect().toSeq
    assert(fromDisk == inMem)
    // a corrupted (non-dense) model table is rejected, not mis-indexed
    val bad = path + "_bad"
    Ivf.saveCentroids(spark, cents, bad)
    spark.read.parquet(bad).filter(col("cell") === 1)
      .write.mode("overwrite").parquet(bad + "2")
    intercept[IllegalArgumentException](Ivf.loadCentroids(spark, bad + "2"))
  }

  test("loadCentroids rejects duplicate cell rows instead of picking one") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_dup").toString
    Seq((0, Seq(0.0, 1.0)), (0, Seq(0.1, 0.9)), (1, Seq(1.0, 0.0)))
      .toDF("cell", "centroid").write.mode("overwrite").parquet(dir)
    val e = intercept[IllegalArgumentException] {
      Ivf.loadCentroids(spark, dir)
    }
    assert(e.getMessage.contains("duplicate cell"))
  }

  test("ivfTopK with nProbe=1 stays within the probe's own cluster") {
    val probes = corpus.filter(col("vec_id") === 2) // +5 cluster
    val out = Ivf.ivfTopK(corpus, probes, k = 5, nCells = 2, nProbe = 1)
    val neigh = out.select("neighbor_id").as[Long].collect().toSet
    assert(neigh.nonEmpty && neigh.forall(_ % 2 == 0)) // even ids = +5 cluster
  }

  test("clusterProfile: sizes, majority labels, exact purity") {
    import sqlImplicits._
    import org.apache.spark.sql.functions._
    // two well-separated 2-d blobs; labels mostly follow the blobs
    // with one dissenter in cluster A
    val rows = Seq(
      (1L, Seq(0.0f, 0.1f), 0), (2L, Seq(0.1f, 0.0f), 0),
      (3L, Seq(0.0f, 0.0f), 1), // dissenter
      (4L, Seq(9.0f, 9.1f), 1), (5L, Seq(9.1f, 9.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = Ivf.clusterProfile(rows, nCells = 2, lloydIters = 2)
      .orderBy("n_vecs")
      .select("n_vecs", "top_label", "top_label_n", "purity_ppm")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // blob B: 2 members both label 1 -> purity 1e6; blob A: 3 members
    // majority label 0 (2 of 3) -> floor(2e6/3)
    assert(out == Seq((2L, 1L, 2L, 1000000L),
      (3L, 0L, 2L, 666666L)))
  }

  test("clusterProfile: majority ties break to the smallest label") {
    import sqlImplicits._
    val rows = Seq(
      (1L, Seq(0.0f, 0.0f), 7), (2L, Seq(0.1f, 0.1f), 3))
      .toDF("vec_id", "embedding", "label")
    val out = Ivf.clusterProfile(rows, nCells = 1, lloydIters = 1)
      .select("top_label").as[Long].collect().toSeq
    assert(out == Seq(3L))
  }
}
