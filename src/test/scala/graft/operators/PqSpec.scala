package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {
  import sqlImplicits._

  // two well-separated clusters in each 2-dim subspace (dim=4, m=2):
  // subspace codebooks must learn the per-subspace cluster structure
  private def corpus = {
    val rnd = new scala.util.Random(11)
    (1 to 80).map { i =>
      val a = if (i % 2 == 0) 4.0f else -4.0f
      val b = if (i % 3 == 0) 4.0f else -4.0f
      (i.toLong, i % 4,
        Array(a + rnd.nextFloat() * 0.1f, rnd.nextFloat(),
          b + rnd.nextFloat() * 0.1f, rnd.nextFloat()))
    }.toDF("vec_id", "label", "embedding")
  }

  test("trainCodebooks: m codebooks of k sub-centroids, dim/m wide") {
    val cb = Pq.trainCodebooks(corpus, m = 2, k = 2, lloydIters = 2)
    assert(cb.size == 2 && cb.forall(_.size == 2) &&
      cb.forall(_.forall(_.size == 2)))
    // each subspace's codebook separates its own ±4 cluster axis
    assert(cb(0).map(_.head).sorted.head < -2 &&
      cb(0).map(_.head).sorted.last > 2)
    assert(cb(1).map(_.head).sorted.head < -2 &&
      cb(1).map(_.head).sorted.last > 2)
    // non-divisible dim is a loud error
    val err = intercept[IllegalArgumentException] {
      Pq.trainCodebooks(corpus, m = 3, k = 2)
    }
    assert(err.getMessage.contains("divisible"))
  }

  test("encode: codes in [0, k), deterministic") {
    val cb = Pq.trainCodebooks(corpus, m = 2, k = 2)
    val dvec = transform(col("embedding"), x => x.cast("double"))
    val codes = corpus.select(Pq.encode(dvec, cb).as("c"))
      .as[Seq[Int]].collect()
    assert(codes.forall(c => c.size == 2 && c.forall(x => x >= 0 && x < 2)))
    val again = corpus.select(Pq.encode(dvec, cb).as("c"))
      .as[Seq[Int]].collect()
    assert(codes.toSeq == again.toSeq)
  }

  test("pqTopK matches a local ADC reference") {
    val cb = Pq.trainCodebooks(corpus, m = 2, k = 2)
    val out = Pq.pqTopK(corpus, corpus.filter(col("vec_id") <= 3), k = 4,
        cb, cellCol = "label")
      .select("probe_id", "rank", "neighbor_id", "adc")
      .as[(Long, Int, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    // local reference: encode + ADC + sort computed driver-side
    val rows = corpus.select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .as[(Long, Int, Seq[Double])].collect()
    def codeOf(v: Seq[Double]): Seq[Int] = (0 until 2).map { s =>
      val sub = v.slice(s * 2, s * 2 + 2)
      cb(s).zipWithIndex.minBy { case (c, i) =>
        (c.zip(sub).map { case (x, y) => (y - x) * (y - x) }.sum, i)
      }._2
    }
    def adcOf(q: Seq[Double], code: Seq[Int]): Double =
      (0 until 2).map { s =>
        val c = cb(s)(code(s))
        q.slice(s * 2, s * 2 + 2).zip(c)
          .foldLeft(0.0) { case (acc, (x, y)) => acc + (x - y) * (x - y) }
      }.reduce(_ + _)
    for (p <- rows.filter(_._1 <= 3)) {
      val expect = rows
        .filter(r => r._2 == p._2 && r._1 != p._1)
        .map(r => (adcOf(p._3, codeOf(r._3)), r._1))
        .sorted.take(4).zipWithIndex
        .map { case ((d, id), i) => (p._1, i + 1) -> ((id, d)) }.toMap
      for ((k_, v) <- expect) assert(out(k_) == v, s"probe/rank $k_")
    }
  }

  test("ivfPqTopK: exhaustive probing recovers brute-force order on coarse structure") {
    // with well-separated clusters, IVF-PQ's top neighbors should
    // agree with exact brute force on WHICH cluster they come from;
    // assert recall of the exact top-3 at ADC top-5 is high
    val coarse = Ivf.trainCentroids(corpus, nCells = 2, lloydIters = 2)
    val cb = Pq.trainCodebooks(corpus, m = 2, k = 4)
    val probes = corpus.filter(col("vec_id") <= 4)
    val pq = Pq.ivfPqTopK(corpus, probes, k = 5, coarse, cb, nProbe = 2)
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = Similarity.bruteForceTopK(corpus, probes, k = 3)
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.map { case (p, ex) =>
      ex.intersect(pq.getOrElse(p, Set.empty)).size.toDouble / ex.size
    }
    assert(recalls.sum / recalls.size >= 0.6,
      s"mean recall ${recalls.sum / recalls.size}")
  }

  test("refineTopK over a full-width shortlist equals bruteForceTopK") {
    // the refine contract: rescored exactly like brute force, over
    // the shortlist only — so a shortlist of ALL pairs must
    // reproduce brute force bit-for-bit (same cosine tree, same
    // tie rule)
    val probes = corpus.filter(col("vec_id") <= 3)
    val all = corpus.select(col("vec_id").as("neighbor_id"))
      .crossJoin(probes.select(col("vec_id").as("probe_id")))
      .filter(col("probe_id") =!= col("neighbor_id"))
    val got = Pq.refineTopK(all, corpus, probes, 4)
      .select("probe_id", "rank", "neighbor_id", "cos")
      .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2))
    val want = Similarity.bruteForceTopK(corpus, probes, 4)
      .select("probe_id", "rank", "neighbor_id", "cos")
      .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2))
    assert(got.sameElements(want))
  }

  test("refineTopK lifts (never hurts) ADC-only recall on the same " +
      "ivf-pq shortlist") {
    // exact top-5 members inside the shortlist always carry the
    // highest exact cosines, so the refine keeps ALL of them while
    // ADC ordering may rank quantized impostors above them —
    // per-probe refine recall >= adc recall is a theorem; pin it
    // plus a decent absolute floor on this separable fixture
    val coarse = Ivf.trainCentroids(corpus, nCells = 2, lloydIters = 2)
    val cb = Pq.trainCodebooks(corpus, m = 2, k = 4)
    val probes = corpus.filter(col("vec_id") <= 4)
    val short10 = Pq.ivfPqTopK(corpus, probes, k = 10, coarse, cb,
      nProbe = 2)
    val exact = Similarity.bruteForceTopK(corpus, probes, k = 5)
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def recallOf(df: org.apache.spark.sql.DataFrame): Map[Long, Double] = {
      val got = df.filter(col("rank") <= 5)
        .select("probe_id", "neighbor_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      exact.map { case (p, ex) =>
        p -> ex.intersect(got.getOrElse(p, Set.empty)).size.toDouble / ex.size
      }
    }
    val adc = recallOf(short10)
    val ref = recallOf(Pq.refineTopK(short10, corpus, probes, 5))
    for ((p, r) <- ref) assert(r >= adc(p), s"probe $p: $r < ${adc(p)}")
    assert(ref.values.sum / ref.size >= 0.6)
  }

  test("residualVec subtracts each vector's nearest coarse centroid") {
    val coarse = Seq(Seq(-4.0, 0.0, -4.0, 0.0), Seq(4.0, 0.0, 4.0, 0.0))
    val dvec = transform(col("embedding"), x => x.cast("double"))
    val got = corpus.select(dvec.as("v"),
        Pq.residualVec(dvec, coarse).as("r"))
      .as[(Seq[Double], Seq[Double])].collect()
    got.foreach { case (v, r) =>
      val near = coarse.minBy(c =>
        c.zip(v).map { case (a, b) => (a - b) * (a - b) }.sum)
      val want = v.zip(near).map { case (x, c) => x - c }
      assert(r == want, s"$v")
    }
  }

  test("residual codebooks lift ADC recall on coarse-dominated " +
      "structure at the same codebook budget") {
    // three well-separated coarse clusters (±100) with ±1 fine
    // structure inside: raw PQ spends its codewords re-describing
    // the cluster positions (within a cell every vector collapses to
    // the same code and ADC cannot rank), residual PQ spends them on
    // the fine structure — the reason FAISS IVF-PQ encodes residuals
    // 8 clusters × k=8 codewords: the raw codebook is fully consumed
    // by the cluster POSITIONS (every within-cell candidate collapses
    // to one code), the residual codebook is fully free for the fine
    // structure
    val rnd = new scala.util.Random(7)
    // 8 discrete fine PATTERNS (±1 scale, tiny jitter): within-cell
    // structure a k=8 residual codebook can actually resolve
    val patterns = Array.fill(8)(Array.fill(4)(rnd.nextDouble() * 2 - 1))
    val docs = (0 until 120).map { i =>
      val c = i % 8
      val base = Array(100.0 * c, 100.0 * ((c * 3) % 8),
        100.0 * ((c * 5) % 8), 100.0 * ((c * 7) % 8))
      val fine = patterns((i / 8) % 8)
      (i.toLong, base.indices.map(j =>
        (base(j) + fine(j) + rnd.nextDouble() * 0.1).toFloat).toArray)
    }.toDF("vec_id", "embedding")
    // the true cluster centers as the coarse model: the claim under
    // test is the residual ENCODING, not coarse-training quality (a
    // hash-seeded 2-iter Lloyd on 8 tight clusters can seed 3 cells
    // into one cluster and merge others — observed; the coarse model
    // is an input contract here, as in FAISS)
    val coarse = (0 until 8).map { c =>
      Seq(100.0 * c, 100.0 * ((c * 3) % 8),
        100.0 * ((c * 5) % 8), 100.0 * ((c * 7) % 8))
    }
    val probes = docs.filter(col("vec_id") < 6)
    val exact = Similarity.bruteForceTopK(docs, probes, 5)
    val cbRaw = Pq.trainCodebooks(docs, m = 2, k = 8, lloydIters = 3)
    val cbRes = Pq.trainCodebooks(docs, m = 2, k = 8, lloydIters = 3,
      coarse = Some(coarse))
    def meanRecall(top: org.apache.spark.sql.DataFrame): Double = {
      val r = Similarity.recallAtK(top, exact, 5)
        .select(col("recall").cast("double")).as[Double].collect()
      r.sum / r.size
    }
    val raw = meanRecall(
      Pq.ivfPqTopK(docs, probes, 5, coarse, cbRaw, nProbe = 1))
    val res = meanRecall(
      Pq.ivfPqTopK(docs, probes, 5, coarse, cbRes, nProbe = 1,
        residual = true))
    assert(res > raw, s"residual $res should beat raw $raw")
    assert(res >= 0.5, s"residual recall too low: $res")
    // and residual training is deterministic: same inputs, same model
    assert(cbRes == Pq.trainCodebooks(docs, m = 2, k = 8,
      lloydIters = 3, coarse = Some(coarse)))
  }

  test("trainCodebooksJoint: bit-equal to solo calls, incl. residual") {
    // three configs over ONE corpus — mixed m/k and a residual spec;
    // the joint trainer's one-seed-job + one-Lloyd-job-per-iteration
    // sharing must reproduce each solo model bit for bit (exact
    // Double ==, no tolerance): same hash-prefix seeds, same argmin
    // trees, same tick-mean multisets.
    val coarse = Seq(Seq(4.0, 0.5, 4.0, 0.5), Seq(-4.0, 0.5, -4.0, 0.5))
    val specs = Seq(Pq.CodebookSpec(m = 2, k = 2),
      Pq.CodebookSpec(m = 4, k = 3),
      Pq.CodebookSpec(m = 2, k = 2, coarse = Some(coarse)))
    val joint = Pq.trainCodebooksJoint(corpus, specs, lloydIters = 2)
    assert(joint(0) ==
      Pq.trainCodebooks(corpus, m = 2, k = 2, lloydIters = 2))
    assert(joint(1) ==
      Pq.trainCodebooks(corpus, m = 4, k = 3, lloydIters = 2))
    assert(joint(2) == Pq.trainCodebooks(corpus, m = 2, k = 2,
      lloydIters = 2, coarse = Some(coarse)))
  }

  test("refineTopK plan: shortlist and probes broadcast, no cartesian") {
    val cb = Pq.trainCodebooks(corpus, m = 2, k = 2)
    val probes = corpus.filter(col("vec_id") <= 3)
    val out = Pq.refineTopK(
      Pq.pqTopK(corpus, probes, 6, cb, cellCol = "label"),
      corpus, probes, 3)
    out.count()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("pqTopK candidate generation is an equi-join on the cell") {
    val cb = Pq.trainCodebooks(corpus, m = 2, k = 2)
    val out = Pq.pqTopK(corpus, corpus.filter(col("vec_id") <= 3), k = 3,
      cb, cellCol = "label")
    out.count()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"), plan)
  }

  test("codebook model table roundtrips and drives the same search") {
    val cb = Pq.trainCodebooks(corpus, m = 2, k = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft_pq").toString
    Pq.saveCodebooks(spark, cb, dir)
    val back = Pq.loadCodebooks(spark, dir)
    assert(back == cb)
    val probes = corpus.filter(col("vec_id") <= 2)
    val a = Pq.pqTopK(corpus, probes, 3, cb, "label")
      .collect().map(_.toSeq).toSet
    val b = Pq.pqTopK(corpus, probes, 3, back, "label")
      .collect().map(_.toSeq).toSet
    assert(a == b)
    // append-mode double write → duplicate rows → loud error
    Pq.saveCodebooks(spark, cb, dir + "2")
    import sqlImplicits._
    Seq((0, 0, Seq(9.0, 9.0))).toDF("subspace", "cell", "centroid")
      .write.mode("append").parquet(dir + "2")
    val err = intercept[IllegalArgumentException] {
      Pq.loadCodebooks(spark, dir + "2")
    }
    assert(err.getMessage.contains("duplicate"))
  }

  test("tick mean: floor-scaled longs, one final division") {
    // 3 identical vectors → mean = floor(v*1e6)/1e6 exactly
    val one = Seq.fill(3)((1L, Array(0.1234567891f, -0.5f)))
      .zipWithIndex.map { case ((_, v), i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
    val c = Ivf.trainCentroids(one, nCells = 1, lloydIters = 1,
      tickScale = Some(1000000L))
    val v0 = 0.1234567891f.toDouble
    assert(c.head.head == math.floor(v0 * 1e6) / 1e6)
    assert(c.head(1) == -0.5)
  }
}
