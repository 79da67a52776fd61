package graft.operators

import graft.expressions.BoundedTopK
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) approximate nearest neighbour — the
  * memory-compression scale path for embedding search (Jégou et al.
  * 2011, the FAISS IVF-PQ workhorse).
  *
  * Train: split the `dim`-d space into `m` subspaces of dim/m and run
  * an independent k-means in each ([[Ivf.trainCentroids]] on the
  * sliced corpus — same deterministic hash seeding, fixed-point tick
  * Lloyd means by default). The model is m codebooks of k
  * sub-centroids: O(m × k × dim/m) = O(k × dim) driver state however
  * large the corpus.
  *
  * Encode: each vector becomes `m` small integers (its nearest
  * sub-centroid per subspace) — at m=16, k=256 that is 16 bytes per
  * vector instead of dim×4 float bytes. At 100 TB THIS is why PQ
  * exists: the inverted file carries codes, not vectors, so the
  * search working set shrinks ~50-100× and survives in memory.
  *
  * Search (asymmetric distance computation, ADC): the query stays
  * exact; each candidate's distance is the sum over subspaces of the
  * exact squared-L2 between the query's subvector and the candidate's
  * assigned sub-centroid. Candidates come from an explicit routing
  * column (`cellCol` — at scale the IVF coarse cell via
  * [[Ivf.nearestCell]]; composition = IVF-PQ), so candidate
  * generation stays an equi-join — never a cross join.
  */
object Pq {

  /** Residual of `dvec` against the coarse centroid named by `cell`
    * (0-based): v − coarse[cell], element-wise. The subtraction is
    * one zip_with over the broadcast centroid-matrix literal —
    * scan-fused, engine-portable (a fixed IEEE tree). */
  def residualTo(dvec: Column, cell: Column,
                 coarse: Seq[Seq[Double]]): Column = {
    val cents = typedlit(coarse.map(_.toIndexedSeq).toIndexedSeq)
    zip_with(dvec, element_at(cents, cell.cast("int") + 1),
      (x, c) => x - c)
  }

  /** Residual against the vector's OWN nearest coarse centroid —
    * what IVF-PQ quantizes (Jégou et al. 2011 §III-A: within a cell
    * the residuals are centered near zero, so the same m×k codebook
    * budget spends its resolution on the fine structure instead of
    * re-describing the coarse cell's position; the measured ADC
    * recall lift is in the G6 harness). */
  def residualVec(dvec: Column, coarse: Seq[Seq[Double]]): Column =
    residualTo(dvec, Ivf.nearestCell(dvec, coarse), coarse)

  /** Train the m per-subspace codebooks. Returns
    * codebooks(s)(j) = sub-centroid j of subspace s (each dim/m
    * wide). Every subspace seeds from the SAME hash-ordered corpus
    * rows (the seed is picked by row id, then sliced), so the whole
    * training is replayable from the row hashes alone. The default
    * tickScale trains with fixed-point tick means (floor(v·10⁶)
    * longs + ONE final IEEE division) — order-independent AND
    * engine-portable, unlike a double→decimal cast whose rounding
    * point differs between engines (the §5 determinism rule).
    *
    * `coarse` switches on RESIDUAL training (IVF-PQ proper): every
    * vector is replaced by its residual against its nearest coarse
    * centroid before slicing — seeds included, so the codebooks
    * model the within-cell distribution. Callers must then encode
    * and score residuals too ([[ivfPqTopK]] with `residual = true`
    * does all three consistently). */
  def trainCodebooks(corpus: DataFrame, m: Int, k: Int,
                     lloydIters: Int = 1,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding",
                     seedHash: Column => Column = c => xxhash64(c),
                     tickScale: Option[Long] = Some(1000000L),
                     coarse: Option[Seq[Seq[Double]]] = None)
  : Seq[Seq[Seq[Double]]] = {
    val raw = transform(col(vecCol), x => x.cast("double"))
    val dvec = coarse.map(cs => residualVec(raw, cs)).getOrElse(raw)
    // ONE seed job for all subspaces: every subspace seeds from the
    // SAME k hash-ordered rows, so collect the full vectors once and
    // slice driver-side — not m corpus sorts (plus it supplies dim,
    // saving the separate probe job).
    // dvec is projected AFTER the limit (r18): TakeOrderedAndProject
    // applies its projection to the k surviving rows only, so the
    // 64-cast transform — or the full nearest-cell residual
    // subtraction for residual training — is evaluated k times, not
    // once per corpus row, in a job that only needs the hash order.
    val seedRows = corpus
      .select(col(idCol), col(vecCol).as("__raw"),
        seedHash(col(idCol)).as("h"))
      .orderBy(col("h")).limit(k)
      .select((coarse.map(cs => residualVec(
          transform(col("__raw"), x => x.cast("double")), cs))
        .getOrElse(transform(col("__raw"), x => x.cast("double"))))
        .as("v"))
      .collect()
      .map(_.getSeq[Double](0).toIndexedSeq).toIndexedSeq
    require(seedRows.nonEmpty, "trainCodebooks: empty corpus")
    val dim = seedRows.head.size
    require(m >= 1 && dim % m == 0,
      s"dim=$dim must be divisible by m=$m")
    val sub = dim / m
    // ONE Lloyd job per iteration for ALL m subspaces (r17): the
    // former shape ran Ivf.trainCentroids once per subspace — m full
    // corpus aggregations per iteration (48 jobs for the three m=16
    // codebooks q_ann_recall trains). Each row now explodes to its m
    // (subspace, cell, subvector) assignments and ONE grouped
    // aggregation updates every sub-centroid. Bit-identical to the
    // per-subspace form: the assignment argmin is the same
    // struct(d2, cell) array_min over the same sliced values, and the
    // per-(s, cell, dim) means sum the same multisets — tick means in
    // exact longs, decimal means in exact decimals — so summation
    // order cannot change the result (the §5 determinism rule).
    val meanOf: Column => Column = tickScale match {
      case None => c => Aggregations.decAvg(c, scale = 9)
      case Some(t) => c =>
        sum(floor(c * t.toDouble).cast("long")).cast("double") /
          (count(c).cast("double") * t.toDouble)
    }
    var books: IndexedSeq[IndexedSeq[IndexedSeq[Double]]] =
      (0 until m).map(s =>
        seedRows.map(_.slice(s * sub, s * sub + sub))).toIndexedSeq
    for (_ <- 1 to lloydIters) {
      val centsLit = typedlit(books)
      // slice FIRST (one Generate row per subspace), assign SECOND:
      // the argmin then scores a bound 4-to-8-wide attribute against
      // its subspace's k sub-centroids, instead of re-evaluating the
      // full dvec tree (64 casts — or the whole residual subtraction)
      // inside every one of the m×k interpreted HOF distance calls.
      // dvec materializes as its own projection first: the per-
      // subspace slicing transform references it m times, and for
      // residual training dvec is the full nearest-cell subtraction —
      // one evaluation per row, not m (CollapseProject keeps the
      // split for a non-cheap, multiply-referenced alias)
      val sliced = corpus.select(dvec.as("__dv"))
        .select(explode(
          transform(centsLit, (cb, s) => struct(s.as("s"),
            slice(col("__dv"), s * lit(sub) + 1, lit(sub)).as("v"))))
          .as("e"))
        .select(col("e.s").as("s"), col("e.v").as("v"))
      val assigned = sliced.select(col("s"),
        array_min(transform(element_at(centsLit, col("s") + 1),
          (c, j) => struct(
            aggregate(zip_with(col("v"), c, (x, y) => (x - y) * (x - y)),
              lit(0.0), (acc, v) => acc + v).as("d2"),
            j.as("cell")))).getField("cell").as("cell"),
        col("v"))
      val updated = assigned
        .select(col("s"), col("cell"), posexplode(col("v")))
        .groupBy(col("s"), col("cell"), col("pos"))
        .agg(meanOf(col("col")).as("m"))
        .groupBy(col("s"), col("cell"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          x => x.getField("m")).as("c"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2).toIndexedSeq)
        .toMap
      books = books.indices.map(s => books(s).indices.map(j =>
        updated.getOrElse((s, j), books(s)(j))).toIndexedSeq).toIndexedSeq
    }
    books
  }

  /** One codebook-training request for [[trainCodebooksJoint]]:
    * `m` subspaces × `k` codewords, optionally trained on residuals
    * against `coarse` — exactly [[trainCodebooks]]' knobs. */
  case class CodebookSpec(m: Int, k: Int,
                          coarse: Option[Seq[Seq[Double]]] = None)

  /** Train SEVERAL codebooks over ONE corpus in one pass per stage —
    * the multi-operating-point shape the recall harness runs (a
    * mechanism-sized m=4×8 and the published m=16×16 over the same
    * corpus; a raw and a residual twin over the same shifted
    * universe). [[trainCodebooks]] costs one seed job + one Lloyd job
    * per iteration PER CALL; at 100 TB each of those is a full corpus
    * pass, so n configs paid n× the scans for data read identically.
    * Here all configs share ONE hash-ordered seed job (k_max rows
    * collected once, each config takes its k-prefix — the same rows
    * its solo call would take) and ONE Lloyd job per iteration: each
    * row explodes to Σ m_i tagged (config, subspace, subvector)
    * entries behind one Generate and a single grouped aggregation
    * updates every sub-centroid of every config.
    *
    * Bit-identical to n separate [[trainCodebooks]] calls by
    * construction (spec-pinned in PqSpec): per config the argmin is
    * the same struct(d2, cell) array_min over the same sliced values
    * against the same codebook literal, and the per-(config, s, cell,
    * dim) means sum the same multisets — tick means in exact longs,
    * so partition/merge order cannot change a bit. */
  def trainCodebooksJoint(corpus: DataFrame, specs: Seq[CodebookSpec],
                          lloydIters: Int = 1,
                          idCol: String = "vec_id",
                          vecCol: String = "embedding",
                          seedHash: Column => Column = c => xxhash64(c),
                          tickScale: Option[Long] = Some(1000000L))
  : Seq[Seq[Seq[Seq[Double]]]] = {
    require(specs.nonEmpty, "trainCodebooksJoint: no specs")
    val raw = transform(col(vecCol), x => x.cast("double"))
    def dvecOf(spec: CodebookSpec): Column =
      spec.coarse.map(cs => residualVec(raw, cs)).getOrElse(raw)
    val kMax = specs.map(_.k).max
    // one seed job: the k_max hash-first rows, every config's
    // training vector projected AFTER the limit (evaluated on k_max
    // rows, not the corpus)
    val seedRows = corpus
      .select(col(idCol), col(vecCol).as("__raw"),
        seedHash(col(idCol)).as("h"))
      .orderBy(col("h")).limit(kMax)
      .select(specs.zipWithIndex.map { case (spec, b) =>
        val r = transform(col("__raw"), x => x.cast("double"))
        spec.coarse.map(cs => residualVec(r, cs)).getOrElse(r).as(s"v$b")
      }: _*)
      .collect()
      .map(r => specs.indices.map(b =>
        r.getSeq[Double](b).toIndexedSeq).toIndexedSeq).toIndexedSeq
    require(seedRows.nonEmpty, "trainCodebooksJoint: empty corpus")
    val dim = seedRows.head.head.size
    val subs = specs.map { spec =>
      require(spec.m >= 1 && dim % spec.m == 0,
        s"dim=$dim must be divisible by m=${spec.m}")
      dim / spec.m
    }
    val meanOf: Column => Column = tickScale match {
      case None => c => Aggregations.decAvg(c, scale = 9)
      case Some(t) => c =>
        sum(floor(c * t.toDouble).cast("long")).cast("double") /
          (count(c).cast("double") * t.toDouble)
    }
    var books: IndexedSeq[IndexedSeq[IndexedSeq[IndexedSeq[Double]]]] =
      specs.zipWithIndex.map { case (spec, b) =>
        (0 until spec.m).map(s =>
          (0 until spec.k).map(j =>
            seedRows(j)(b).slice(s * subs(b), s * subs(b) + subs(b)))
            .toIndexedSeq).toIndexedSeq
      }.toIndexedSeq
    for (_ <- 1 to lloydIters) {
      val centsAll = typedlit(books)
      // one Generate for every (config, subspace): each config slices
      // its projected training vector (evaluated once per row — the
      // r17 discipline), tagged with the config index, and the
      // per-config struct arrays concatenate into one explode.
      // Configs sharing a training vector (two raw specs, or two
      // specs on the same coarse model) share ONE projected column —
      // the projection stage is interpreted (HOFs are
      // CodegenFallback), so duplicate aliases would each re-run the
      // 64-cast transform per row.
      val dvKey = specs.map(_.coarse).distinct
      val dvCol = specs.map(s => s"__dv${dvKey.indexOf(s.coarse)}")
      val sliced = corpus
        .select(dvKey.zipWithIndex.map { case (c, i) =>
          dvecOf(CodebookSpec(1, 1, c)).as(s"__dv$i")
        }: _*)
        .select(explode(concat(specs.indices.map { b =>
          transform(element_at(centsAll, b + 1), (cb, s) =>
            struct(lit(b).as("b"), s.as("s"),
              slice(col(dvCol(b)), s * lit(subs(b)) + 1,
                lit(subs(b))).as("v")))
        }: _*)).as("e"))
        .select(col("e.b").as("b"), col("e.s").as("s"), col("e.v").as("v"))
      val assigned = sliced.select(col("b"), col("s"),
        array_min(transform(
          element_at(element_at(centsAll, col("b") + 1), col("s") + 1),
          (c, j) => struct(
            aggregate(zip_with(col("v"), c, (x, y) => (x - y) * (x - y)),
              lit(0.0), (acc, v) => acc + v).as("d2"),
            j.as("cell")))).getField("cell").as("cell"),
        col("v"))
      val updated = assigned
        .select(col("b"), col("s"), col("cell"), posexplode(col("v")))
        .groupBy(col("b"), col("s"), col("cell"), col("pos"))
        .agg(meanOf(col("col")).as("m"))
        .groupBy(col("b"), col("s"), col("cell"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          x => x.getField("m")).as("c"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) ->
          r.getSeq[Double](3).toIndexedSeq)
        .toMap
      books = books.indices.map(b =>
        books(b).indices.map(s => books(b)(s).indices.map(j =>
          updated.getOrElse((b, s, j), books(b)(s)(j))).toIndexedSeq)
          .toIndexedSeq).toIndexedSeq
    }
    books
  }

  /** Persist trained codebooks as a parquet model table
    * `(subspace: int, cell: int, centroid: array<double>)` — the
    * [[Ivf.saveCentroids]] discipline for PQ: a training job writes
    * the model once, every later encode/search session loads it.
    * O(m × k × dim/m) — bounded, one file. */
  def saveCodebooks(spark: org.apache.spark.sql.SparkSession,
                    codebooks: Seq[Seq[Seq[Double]]], path: String): Unit = {
    import spark.implicits._
    codebooks.zipWithIndex.flatMap { case (cb, s) =>
      cb.zipWithIndex.map { case (c, j) => (s, j, c) }
    }.toDF("subspace", "cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a [[saveCodebooks]] model table, validating density in
    * both dimensions (every subspace 0..m-1 present with the same k
    * cells 0..k-1, no duplicates — an append-mode double write must
    * fail loud, not silently pick winners). */
  def loadCodebooks(spark: org.apache.spark.sql.SparkSession,
                    path: String): Seq[Seq[Seq[Double]]] = {
    val rows = spark.read.parquet(path)
      .select("subspace", "cell", "centroid").collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2).toIndexedSeq)
    val byKey = rows.toMap
    require(rows.nonEmpty, s"codebook table at $path is empty")
    require(rows.length == byKey.size,
      s"codebook table at $path has duplicate (subspace, cell) rows")
    require(byKey.keySet.forall { case (s, j) => s >= 0 && j >= 0 },
      s"codebook table at $path has negative subspace/cell indices")
    val m = byKey.keySet.map(_._1).max + 1
    val k = byKey.keySet.map(_._2).max + 1
    require(byKey.size == m * k,
      s"codebook table at $path is not dense: ${byKey.size} rows " +
        s"for m=$m × k=$k")
    (0 until m).map(s => (0 until k).map(j => byKey((s, j))))
  }

  /** PQ code array for a double-vector column: element s is the
    * 0-based nearest sub-centroid of subspace s (ties to the lower
    * code, like [[Ivf.nearestCell]]). */
  def encode(dvec: Column, codebooks: Seq[Seq[Seq[Double]]]): Column = {
    val sub = codebooks.head.head.size
    array(codebooks.indices.map(s =>
      Ivf.nearestCell(slice(dvec, s * sub + 1, sub), codebooks(s))): _*)
  }

  /** ADC distance between an exact query vector and a PQ code array:
    * Σ_s d2(query subvector s, codebook_s[code_s]), summed in fixed
    * subspace order (a deterministic IEEE expression tree — the same
    * bits in any engine that replays it). */
  def adc(queryVec: Column, codes: Column,
          codebooks: Seq[Seq[Seq[Double]]]): Column = {
    val sub = codebooks.head.head.size
    codebooks.indices.map { s =>
      val cb = typedlit(codebooks(s).map(_.toIndexedSeq).toIndexedSeq)
      val centroid = element_at(cb, element_at(codes, s + 1) + 1)
      aggregate(
        zip_with(slice(queryVec, s * sub + 1, sub), centroid,
          (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, v) => acc + v)
    }.reduce(_ + _)
  }

  /** PQ top-k search: encode the corpus once, route probes to
    * candidates via equality on `cellCol` (IVF coarse cell, label,
    * shard — any bounded-fanout routing key), score candidates by
    * ADC against their codes only, rank with the k-capped
    * [[BoundedTopK]] aggregate (ascending distance, ties to the
    * lower neighbor id). The corpus side of the join carries
    * (id, cell, m codes) — the raw vectors never move. */
  def pqTopK(corpus: DataFrame, probes: DataFrame, k: Int,
             codebooks: Seq[Seq[Seq[Double]]], cellCol: String,
             idCol: String = "vec_id",
             vecCol: String = "embedding"): DataFrame = {
    val dvec = transform(col(vecCol), x => x.cast("double"))
    // materialize the cast vector as its OWN projection before
    // encode (r17): encode's m×k interpreted distance calls each
    // re-evaluated the full 64-cast transform otherwise (CollapseProject
    // keeps the stage split — the alias is non-cheap and referenced
    // m×k times)
    val coded = corpus.select(col(idCol).as("neighbor_id"),
        col(cellCol).as("cell"), dvec.as("__dv"))
      .select(col("neighbor_id"), col("cell"),
        encode(col("__dv"), codebooks).as("codes"))
    val p = probes.select(col(idCol).as("probe_id"),
      col(cellCol).as("cell"), dvec.as("p_vec"))
    val scored = coded.join(p, Seq("cell"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .select(col("probe_id"), col("neighbor_id"),
        adc(col("p_vec"), col("codes"), codebooks).as("adc"))
    scored.groupBy(col("probe_id"))
      .agg(BoundedTopK.boundedTopK(-col("adc"), col("neighbor_id"), k)
        .as("top"))
      .select(col("probe_id"), posexplode(col("top")))
      .select(col("probe_id"), (col("pos") + 1).as("rank"),
        col("col.id").as("neighbor_id"),
        (-col("col.score")).as("adc"))
  }

  /** IVF-PQ: the FAISS production composition — coarse-route with
    * [[Ivf.nearestCell]] (probes replicated to their nProbe nearest
    * cells), then PQ-ADC scoring within the routed cells. Train both
    * models once ([[Ivf.trainCentroids]], [[trainCodebooks]]) and
    * reuse across query batches.
    *
    * `residual = true` is IVF-PQ proper (requires codebooks trained
    * with the same `coarse` passed to [[trainCodebooks]]): each
    * corpus vector's codes quantize its residual against its own
    * cell's centroid, and the probe's ADC query vector is ITS
    * residual against the ROUTED cell — both sides subtract the same
    * centroid, so ADC approximates the true within-cell distance
    * with the codebook resolution spent on fine structure, not on
    * re-describing the cell. */
  def ivfPqTopK(corpus: DataFrame, probes: DataFrame, k: Int,
                coarse: Seq[Seq[Double]],
                codebooks: Seq[Seq[Seq[Double]]], nProbe: Int,
                idCol: String = "vec_id",
                vecCol: String = "embedding",
                residual: Boolean = false): DataFrame = {
    val dvec = transform(col(vecCol), x => x.cast("double"))
    // every expensive vector expression is materialized as its own
    // projection before the m×k interpreted HOF consumers (encode /
    // adc) — same r17 discipline as pqTopK: without the stage split
    // the residual zip_with (64 wide) re-evaluated per (subspace,
    // codeword) distance call
    val coded = corpus
      .select(col(idCol).as("neighbor_id"), dvec.as("__v"))
      .withColumn("cell", Ivf.nearestCell(col("__v"), coarse))
      .select(col("neighbor_id"), col("cell"),
        (if (residual) residualTo(col("__v"), col("cell"), coarse)
          else col("__v")).as("__ev"))
      .select(col("neighbor_id"), col("cell"),
        encode(col("__ev"), codebooks).as("codes"))
    val cellsRanked =
      slice(array_sort(Ivf.cellScores(dvec, coarse)), 1, nProbe)
    val p = probes.select(col(idCol).as("probe_id"), dvec.as("p_vec"),
      explode(cellsRanked.getField("cell")).as("cell"))
    val scored = coded.join(p, Seq("cell"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .select(col("probe_id"), col("neighbor_id"), col("codes"),
        (if (residual) residualTo(col("p_vec"), col("cell"), coarse)
          else col("p_vec")).as("__qv"))
      .select(col("probe_id"), col("neighbor_id"),
        adc(col("__qv"), col("codes"), codebooks).as("adc"))
    scored.groupBy(col("probe_id"))
      .agg(BoundedTopK.boundedTopK(-col("adc"), col("neighbor_id"), k)
        .as("top"))
      .select(col("probe_id"), posexplode(col("top")))
      .select(col("probe_id"), (col("pos") + 1).as("rank"),
        col("col.id").as("neighbor_id"),
        (-col("col.score")).as("adc"))
  }

  /** Exact re-rank of an ADC shortlist — the FAISS "refine" stage
    * (IndexRefineFlat): PQ distances are quantized, so the ADC
    * top-kAdc is fetched a little wide, the TRUE vectors are read
    * back for just those candidates, and exact cosine re-ranks them
    * down to k. Standard operating point kAdc = 2-4×k: the refine
    * recovers the neighbors quantization mis-ranked INSIDE the
    * shortlist at the cost of |probes| × kAdc exact scorings —
    * independent of corpus size.
    *
    * `shortlist` is any [[pqTopK]]/[[ivfPqTopK]]-shaped result
    * (probe_id, neighbor_id[, ...]); scoring is
    * [[Similarity.cosineScore]] — the same expression tree as
    * brute-force, so refine output is directly comparable to (and at
    * kAdc = corpus, equal to) the exact result.
    *
    * Scale shape: the shortlist is |probes| × kAdc rows — it
    * BROADCASTS onto the corpus scan, so the true vectors of
    * shortlisted candidates are fetched by a hash probe inside the
    * scan stage (raw vectors move for the shortlist only, never the
    * corpus); probes broadcast the same way; the only shuffle is the
    * |probes| × k top-k aggregation. */
  def refineTopK(shortlist: DataFrame, corpus: DataFrame,
                 probes: DataFrame, k: Int,
                 idCol: String = "vec_id",
                 vecCol: String = "embedding"): DataFrame = {
    val sl = shortlist.select("probe_id", "neighbor_id")
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("c_vec"),
      graft.functions.VectorFunctions.norm(col(vecCol)).as("c_nrm"))
    val p = probes.select(col(idCol).as("probe_id"),
      col(vecCol).as("p_vec"),
      graft.functions.VectorFunctions.norm(col(vecCol)).as("p_nrm"))
    val rescored = c.join(broadcast(sl), Seq("neighbor_id"))
      .join(broadcast(p), Seq("probe_id"))
      .select(col("probe_id"), col("neighbor_id"),
        Similarity.cosineScore.as("cos"))
    Similarity.topKPerGroup(rescored, "probe_id", k)
  }
}
