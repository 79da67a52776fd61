package graft.operators

import graft.expressions.BoundedTopK
import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbour — the classic
  * coarse-quantize-then-probe ANN, Spark-first.
  *
  * Train: seed `nCells` centroids from a deterministic hash-sample of
  * the corpus, refine with `lloydIters` distributed Lloyd steps
  * (assign = argmin over the broadcast centroid array, update =
  * per-cell decimal-exact mean). Only the C × dim centroid matrix
  * ever reaches the driver — assignment and refinement are full
  * DataFrame aggregations.
  *
  * Search: assign corpus rows to their nearest cell (equi-joinable
  * inverted file); each probe scans its `nProbe` nearest cells only.
  * Candidate generation is an equi-join on cell id; scoring is exact
  * cosine; ranking is the k-capped [[BoundedTopK]] aggregate. At
  * 100 TB the corpus-side work is one scan + one shuffle on cell id,
  * and recall/cost is tuned by (nCells, nProbe) — never a cross join.
  */
object Ivf {

  /** Squared L2 distance between a double-array column and one
    * centroid column (an element of the centroid matrix literal). */
  private def d2(vec: Column, c: Column): Column =
    aggregate(zip_with(vec, c, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v)

  /** All cells scored against `vec`, as an array<struct<d2, cell>>.
    *
    * The centroid matrix is ONE array<array<double>> literal and the
    * scoring is ONE indexed-transform lambda — expression-tree size
    * is O(1) in nCells (the matrix is data, not code). The previous
    * shape (one aggregate/zip_with subtree per centroid inside an
    * `array(...)`) grew the tree linearly: at the thousands of cells
    * a 100 TB corpus needs it blows past codegen's 64KB method limit
    * and stalls the analyzer long before that. Struct comparison
    * orders by (d2, cell), so min/sort tie-break on the lower cell
    * id, exactly as before. */
  private[operators] def cellScores(vec: Column, centroids: Seq[Seq[Double]]): Column = {
    val cents = typedlit(centroids.map(_.toIndexedSeq).toIndexedSeq)
    transform(cents, (c, i) =>
      struct(d2(vec, c).as("d2"), i.as("cell")))
  }

  /** argmin over the broadcast centroid literal: returns the 0-based
    * index of the nearest centroid (squared-L2). Package-visible:
    * [[Dedup.semDeDup]] reuses the same assignment. */
  private[operators] def nearestCell(vec: Column, centroids: Seq[Seq[Double]]): Column =
    array_min(cellScores(vec, centroids)).getField("cell")

  /** Train centroids: deterministic hash-seeded sample + Lloyd
    * refinement. Returns nCells × dim (some cells may repeat if the
    * corpus is tiny). `seedHash` picks the seed-ordering hash —
    * xxhash64 default; an md5-derived hash for engine-portable
    * replay (every other training step — ordered-fold distances,
    * decimal-exact means — is already standard-SQL-expressible). */
  def trainCentroids(corpus: DataFrame, nCells: Int, lloydIters: Int = 2,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding",
                     seedHash: Column => Column = c => xxhash64(c),
                     tickScale: Option[Long] = None,
                     init: Option[Seq[Seq[Double]]] = None)
  : Seq[Seq[Double]] = {
    // mean per (cell, dim): decimal-exact by default; with tickScale
    // a fixed-point tick mean — floor(v·scale) longs sum exactly in
    // any order and the ONE final IEEE division is bit-identical in
    // every engine, whereas a double→decimal cast's rounding point
    // is engine-specific (DuckDB rounds v·10⁹ computed in doubles,
    // Spark rounds the exact binary value — they disagree ~1e-9
    // often enough to break hash-exact replay at scale)
    val meanOf: Column => Column = tickScale match {
      case None => c => Aggregations.decAvg(c, scale = 9)
      case Some(t) => c =>
        sum(floor(c * t.toDouble).cast("long")).cast("double") /
          (count(c).cast("double") * t.toDouble)
    }
    val dvec = transform(col(vecCol), x => x.cast("double"))
    // seed: the nCells rows with smallest seedHash(id) — deterministic,
    // uniformly spread, one small collect. `init` skips the seed job
    // entirely for callers that already hold the seed vectors
    // (Pq.trainCodebooks collects the shared seed rows ONCE and
    // slices them per subspace instead of re-sorting the corpus m
    // times).
    for (seeds <- init) require(seeds.size == nCells,
      s"init has ${seeds.size} seed centroids but nCells=$nCells")
    var centroids: Seq[Seq[Double]] = init.getOrElse(corpus
      .select(col(idCol), dvec.as("v"), seedHash(col(idCol)).as("h"))
      .orderBy(col("h")).limit(nCells)
      .select(col("v")).collect()
      .map(_.getSeq[Double](0).toIndexedSeq).toIndexedSeq)
    for (_ <- 1 to lloydIters) {
      // per-(cell, dim) mean via posexplode — partial-aggregation
      // state stays O(cells × dim) regardless of corpus size (a
      // collect_list-of-vectors-per-cell buffer would not).
      // dvec materializes once per row before the argmin (r17):
      // nearestCell's interpreted HOF references its input per
      // centroid, so the cast tree re-evaluated nCells+1 times
      val assigned = corpus.select(dvec.as("__dv"))
        .select(col("__dv").as("v"),
          nearestCell(col("__dv"), centroids).as("cell"))
      val updated = assigned
        .select(col("cell"), posexplode(col("v")))
        .groupBy(col("cell"), col("pos"))
        .agg(meanOf(col("col")).as("m"))
        .groupBy(col("cell"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("c"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toIndexedSeq)
        .toMap
      centroids = centroids.indices.map(i => updated.getOrElse(i, centroids(i)))
    }
    centroids
  }

  /** Persist trained centroids as a parquet model table
    * `(cell: int, centroid: array<double>)` — "train once, search
    * many batches" (the advice on [[ivfTopK]]) made durable across
    * session boundaries: a training job writes the model, every later
    * search session [[loadCentroids]] and drives the pre-trained
    * overload. The table is O(nCells × dim) — driver-bounded by
    * construction, one file. */
  def saveCentroids(spark: org.apache.spark.sql.SparkSession,
                    centroids: Seq[Seq[Double]], path: String): Unit = {
    import spark.implicits._
    centroids.zipWithIndex
      .map { case (c, i) => (i, c) }.toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a [[saveCentroids]] model table back into the in-memory
    * centroid matrix, cell order restored. */
  def loadCentroids(spark: org.apache.spark.sql.SparkSession,
                    path: String): Seq[Seq[Double]] = {
    val rows = spark.read.parquet(path).select("cell", "centroid")
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toIndexedSeq)
    val byCell = rows.toMap
    // toMap silently collapses duplicate cells (a double-written or
    // append-mode table) to an arbitrary winner — reject instead
    require(rows.length == byCell.size,
      s"centroid table at $path has duplicate cell rows: " +
        s"${rows.length} rows for ${byCell.size} distinct cells")
    require(byCell.keySet == (0 until byCell.size).toSet,
      s"centroid table at $path is not dense in [0, n): " +
        s"cells ${byCell.keySet.toSeq.sorted.take(5)}...")
    (0 until byCell.size).map(byCell).toIndexedSeq
  }

  /** IVF top-k: probe each query's nProbe nearest cells, exact cosine
    * within them, k-capped top-k aggregation. Trains on the corpus
    * first; at 100 TB call [[trainCentroids]] once (on a sample) and
    * reuse via the pre-trained overload — refitting per query batch
    * wastes the Lloyd passes and changes cell assignments under the
    * searcher. */
  def ivfTopK(corpus: DataFrame, probes: DataFrame, k: Int,
              nCells: Int = 16, nProbe: Int = 4, lloydIters: Int = 2,
              idCol: String = "vec_id", vecCol: String = "embedding",
              seedHash: Column => Column = c => xxhash64(c),
              tickScale: Option[Long] = None): DataFrame =
    ivfTopK(corpus, probes, k,
      trainCentroids(corpus, nCells, lloydIters, idCol, vecCol, seedHash,
        tickScale),
      nProbe, idCol, vecCol)

  /** IVF top-k with PRE-TRAINED centroids — the production shape:
    * fit once, search many query batches against stable cells. */
  def ivfTopK(corpus: DataFrame, probes: DataFrame, k: Int,
              centroids: Seq[Seq[Double]], nProbe: Int,
              idCol: String, vecCol: String): DataFrame = {
    val dvec = transform(col(vecCol), x => x.cast("double"))
    // inverted file: corpus rows keyed by their single nearest cell;
    // scoring carries the RAW float vectors (codegen'd ArrayDot path)
    // dvec once per row, argmin over the materialized column (r17 —
    // the trainCentroids discipline)
    val c = corpus.select(col(idCol).as("neighbor_id"),
        col(vecCol).as("c_vec"),
        VectorFunctions.norm(col(vecCol)).as("c_nrm"),
        dvec.as("__dv"))
      .select(col("neighbor_id"), col("c_vec"), col("c_nrm"),
        nearestCell(col("__dv"), centroids).as("cell"))
    // probes replicate to their nProbe nearest cells
    val cellsRanked =
      slice(array_sort(cellScores(dvec, centroids)), 1, nProbe)
    val p = probes.select(col(idCol).as("probe_id"), col(vecCol).as("p_vec"),
        VectorFunctions.norm(col(vecCol)).as("p_nrm"),
        explode(cellsRanked.getField("cell")).as("cell"))
    val denom = col("p_nrm") * col("c_nrm")
    val scored = c.join(p, Seq("cell"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .select(col("probe_id"), col("neighbor_id"),
        when(denom === 0.0, lit(0.0))
          .otherwise(VectorFunctions.dot(col("p_vec"), col("c_vec")) / denom)
          .as("cos"))
    scored.groupBy(col("probe_id"))
      .agg(BoundedTopK.boundedTopK(col("cos"), col("neighbor_id"), k).as("top"))
      .select(col("probe_id"), posexplode(col("top")))
      .select(col("probe_id"), (col("pos") + 1).as("rank"),
        col("col.id").as("neighbor_id"),
        col("col.score").as("cos"))
  }

  /** K-MEANS CLUSTER PROFILE — the curation view of the IVF
    * partitioning ([[trainCentroids]]'s cells read as TOPIC clusters,
    * the SemDeDup/cluster-balanced-sampling lens): per cell, member
    * count, the majority label (ties to the smallest — deterministic)
    * and its exact-ppm purity. A skewed size column says the
    * embedding space is lumpy (re-seed or raise nCells); low purity
    * says clusters cut across labels — both are the decisions a
    * curation pipeline makes BEFORE sampling per cluster.
    *
    * Scale shape: training is the bounded Lloyd loop (state
    * O(cells × dim)); assignment is a scan-stage argmin over the
    * broadcast centroid literals; the profile is one (cell, label)
    * map-side-combined count + one per-cell argmax aggregate —
    * max(struct(count, −label)), never a window over members.
    */
  def clusterProfile(corpus: DataFrame, nCells: Int,
                     lloydIters: Int = 2,
                     labelCol: String = "label",
                     idCol: String = "vec_id",
                     vecCol: String = "embedding",
                     seedHash: Column => Column = c => xxhash64(c),
                     tickScale: Option[Long] = None): DataFrame = {
    val cents = trainCentroids(corpus, nCells, lloydIters, idCol,
      vecCol, seedHash, tickScale)
    val dvec = transform(col(vecCol), x => x.cast("double"))
    val counts = corpus
      .select(dvec.as("__dv"), col(labelCol).cast("long").as("lab"))
      .select(nearestCell(col("__dv"), cents).as("cell"), col("lab"))
      .groupBy("cell", "lab").agg(count(lit(1)).as("c"))
    counts.groupBy("cell")
      .agg(sum(col("c")).as("n_vecs"),
        max(struct(col("c"), (-col("lab")).as("nl"))).as("m"))
      .select(col("cell"), col("n_vecs"),
        (-col("m.nl")).as("top_label"),
        col("m.c").as("top_label_n"),
        call_function("div", lit(1000000L) * col("m.c"), col("n_vecs"))
          .as("purity_ppm"))
  }
}
