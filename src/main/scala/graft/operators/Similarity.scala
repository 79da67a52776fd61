package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbour search over an embedding column.
  *
  * Baseline: brute-force cosine top-k with the (small) probe set
  * broadcast against the corpus — one scan, no shuffle of the corpus.
  * Scale path: random-hyperplane LSH bucketing so candidate
  * generation is an equi-join on the code; at 100 TB the corpus is
  * scanned once, bucketed, and only intra-bucket pairs are scored.
  */
object Similarity {

  /** Precomputed-norm cosine over (probe_id, neighbor_id) pairs
    * carrying both vectors — the one scoring implementation the
    * brute, LSH and PQ-refine paths share (recallAtK compares them
    * against each other; a scoring fix must reach all three). */
  private[graft] def cosineScore: org.apache.spark.sql.Column = {
    val denom = col("p_nrm") * col("c_nrm")
    when(denom === 0.0, lit(0.0))
      .otherwise(VectorFunctions.dot(col("p_vec"), col("c_vec")) / denom)
  }

  /** Brute-force cosine top-k: broadcast `probes` (must be small)
    * against `corpus`, then a per-probe top-k AGGREGATION — partial
    * top-k lists merge map-side, so the shuffle carries only
    * |probes| × k rows and there is no global sort of the scored
    * probe×corpus set (a window row_number here would shuffle and
    * sort the whole cross product — the 100 TB killer).
    * Deterministic ties: score desc, then neighbor id asc.
    *
    * Id-space contract (here and in [[lshTopK]]): probe and corpus
    * ids are assumed to SHARE one id space — a pair with
    * probe_id == neighbor_id is the vector matched against itself
    * and is excluded. Probing a corpus with an unrelated id space
    * must re-key one side first (e.g. offset the probe ids), or a
    * corpus vector that happens to share a probe's id is silently
    * dropped from that probe's candidates. */
  def bruteForceTopK(corpus: DataFrame, probes: DataFrame, k: Int,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    // norms precomputed once per side — not once per scored pair
    val p = probes.select(col(idCol).as("probe_id"), col(vecCol).as("p_vec"),
      VectorFunctions.norm(col(vecCol)).as("p_nrm"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("c_vec"), VectorFunctions.norm(col(vecCol)).as("c_nrm"))
    val scored = c.join(broadcast(p), col("probe_id") =!= col("neighbor_id"))
      .select(col("probe_id"), col("neighbor_id"), cosineScore.as("cos"))
    topKPerGroup(scored, "probe_id", k)
  }

  /** Hard-negative mining for contrastive / embedding training — the
    * negative-sampling stage of a retrieval-training pipeline: per
    * probe, the top-k MOST similar corpus vectors whose `labelCol`
    * DIFFERS from the probe's. Random negatives are too easy to
    * carry gradient signal and same-label vectors are (proxy)
    * positives; the similar-but-wrong band in between is what the
    * loss needs. Same broadcast-probes + k-capped-aggregation shape
    * as [[bruteForceTopK]] (the label predicate rides the same join;
    * the shuffle still carries only |probes| × k rows); at 100 TB
    * swap the candidate source for the LSH/IVF index — the mismatch
    * predicate composes with any candidate generator. */
  def hardNegatives(corpus: DataFrame, probes: DataFrame, k: Int,
                    labelCol: String = "label",
                    idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    val p = probes.select(col(idCol).as("probe_id"),
      col(labelCol).as("p_lab"), col(vecCol).as("p_vec"),
      VectorFunctions.norm(col(vecCol)).as("p_nrm"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(labelCol).as("c_lab"), col(vecCol).as("c_vec"),
      VectorFunctions.norm(col(vecCol)).as("c_nrm"))
    val scored = c.join(broadcast(p),
        col("probe_id") =!= col("neighbor_id") &&
          col("p_lab") =!= col("c_lab"))
      .select(col("probe_id"), col("neighbor_id"), cosineScore.as("cos"))
    topKPerGroup(scored, "probe_id", k)
  }

  /** Per-group top-k via the custom [[graft.expressions.BoundedTopK]]
    * aggregate: partial state is a k-capped heap, so map-side combine
    * emits <= k entries per group per task and the shuffle carries
    * |groups| × k × |tasks| worst-case — never the full scored
    * candidate set, and no global sort anywhere. */
  private[graft] def topKPerGroup(scored: DataFrame, groupCol: String,
                                  k: Int): DataFrame =
    scored
      .groupBy(col(groupCol))
      .agg(graft.expressions.BoundedTopK.boundedTopK(
        col("cos"), col("neighbor_id"), k).as("top"))
      .select(col(groupCol), posexplode(col("top")))
      .select(col(groupCol), (col("pos") + 1).as("rank"),
        col("col.id").as("neighbor_id"),
        // raw IEEE double — round() differs between engines on .5
        // ties, and the unrounded score hash-matches DuckDB exactly
        col("col.score").as("cos"))

  /** BITEXT MINING — margin-based parallel-pair extraction across
    * two embedding corpora (Artetxe & Schwenk 2019, the CCMatrix /
    * LASER mining criterion): raw cosine over-fires on "hub"
    * vectors that are close to everything, so each candidate pair
    * is scored by its cosine RELATIVE to both endpoints'
    * neighborhood densities,
    *   margin(x,y) = cos(x,y) / ((avgᵏ(x) + avgᵏ(y)) / 2),
    * and per x the max-margin y is kept if it clears the threshold.
    *
    * Exactness discipline (the bm25 tick pattern): the cosines are
    * the shared [[cosineScore]] tree (bit-identical across engines);
    * each is floored to 1e-9 ticks, the two k-neighborhood sums are
    * exact long sums (order-free), and the margin is ONE integer
    * division, margin_fp = (cos_fp · 2k · 10⁶) div (sum_x + sum_y) —
    * so the mined set is reproducible bit-for-bit anywhere. Pairs
    * with a non-positive cosine or neighborhood sum are not mineable
    * (a translation candidate is positively correlated by
    * construction) — also what keeps the integer division in
    * truncate==floor territory on both engines.
    *
    * Candidates are the UNION of forward (x→Y) and backward (y→X)
    * top-k lists — the paper's 'max' retrieval intersected down by
    * the per-x argmax. Plan shape: two [[bruteForceTopK]] passes
    * (broadcast the probing side; at 100 TB swap the candidate
    * generator for the IVF/LSH index exactly as [[hardNegatives]]
    * documents — the margin arithmetic composes with any candidate
    * source), two |side|-row neighborhood-sum tables broadcast back,
    * one map-side-combined max_by argmax. The dedup `distinct` is exact:
    * cos(x,y) and cos(y,x) are bit-equal (IEEE multiply commutes;
    * the zip-fold order is identical).
    *
    * Output: (x_id, y_id, cos, margin_fp) — one row per x that
    * mined a pair at margin_fp ≥ marginFpMin (margin 1.0 ≡ 10⁶). */
  def bitextMine(xSide: DataFrame, ySide: DataFrame, k: Int,
                 marginFpMin: Long,
                 idCol: String = "vec_id",
                 vecCol: String = "embedding"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val cosFp = floor(col("cos") * 1e9).cast("long")
    val fwd = bruteForceTopK(ySide, xSide, k, idCol, vecCol)
      .select(col("probe_id").as("x_id"), col("neighbor_id").as("y_id"),
        col("cos"), cosFp.as("cos_fp"))
    val bwd = bruteForceTopK(xSide, ySide, k, idCol, vecCol)
      .select(col("neighbor_id").as("x_id"), col("probe_id").as("y_id"),
        col("cos"), cosFp.as("cos_fp"))
    val sumX = broadcast(fwd.groupBy(col("x_id").as("__sx_id"))
      .agg(sum(col("cos_fp")).as("__sum_x")))
    val sumY = broadcast(bwd.groupBy(col("y_id").as("__sy_id"))
      .agg(sum(col("cos_fp")).as("__sum_y")))
    val scored = fwd.union(bwd).distinct()
      .join(sumX, col("x_id") === col("__sx_id"))
      .join(sumY, col("y_id") === col("__sy_id"))
      .filter(col("cos_fp") > 0 && (col("__sum_x") + col("__sum_y")) > 0)
      .withColumn("margin_fp", call_function("div",
        col("cos_fp") * (2L * k) * 1000000L,
        col("__sum_x") + col("__sum_y")))
    // argmax margin per x (ties to the smallest y), then threshold.
    // max_by carries the payload THROUGH the aggregation (map-side
    // combined) — a join-back to recover cos planned as a sort-merge
    // join of two |X|-row sides; the lexicographic (margin, −y)
    // struct key is the (margin desc, y asc) order exactly
    scored
      .groupBy(col("x_id"))
      .agg(max_by(
        struct(col("y_id"), col("cos"), col("margin_fp")),
        struct(col("margin_fp"), -col("y_id"))).as("__best"))
      .select(col("x_id"), col("__best.y_id").as("y_id"),
        col("__best.cos").as("cos"),
        col("__best.margin_fp").as("margin_fp"))
      .filter(col("margin_fp") >= marginFpMin)
  }

  /** Recall@k of an approximate ANN result against the exact one:
    * per probe, |approx∩exact| / |exact| over the top-k neighbor
    * sets. The standard tuning loop for (nBits, nCells, nProbe) at
    * scale — run on a sampled probe set, never the full corpus.
    * Inputs are outputs of `bruteForceTopK`-shaped queries
    * (probe col, neighbor_id, rank <= k). One small join on
    * (probe, neighbor): exact side is |probes|×k rows. */
  def recallAtK(approx: DataFrame, exact: DataFrame, k: Int,
                probeCol: String = "probe_id"): DataFrame = {
    val a = approx.filter(col("rank") <= k)
      .select(col(probeCol), col("neighbor_id"))
    val e = exact.filter(col("rank") <= k)
      .select(col(probeCol), col("neighbor_id"))
    val hits = a.join(e, Seq(probeCol, "neighbor_id"), "left_semi")
      .groupBy(col(probeCol)).agg(count(lit(1)).as("n_hit"))
    e.groupBy(col(probeCol)).agg(count(lit(1)).as("n_exact"))
      .join(hits, Seq(probeCol), "left")
      .na.fill(0L, Seq("n_hit"))
      .withColumn("recall",
        col("n_hit").cast("double") / col("n_exact"))
  }

  /** Multi-table LSH ANN: `nTables` independent `nBits`-hyperplane
    * codes per vector; a candidate pair is any (probe, corpus) pair
    * sharing ANY table's code — recall 1−(1−p^nBits)^nTables instead
    * of the single-table p^nBits (measured 0.025 → healthy on the
    * test corpus; single-code LSH is a recall trap). Candidate
    * generation stays an equi-join on (table, code); candidate ids
    * are deduped BEFORE vectors are fetched and scored, so each
    * surviving pair is scored exactly once and no vector rides the
    * multi-table join. Still never a cross join — the 100 TB trade
    * is one coded shuffle per table. */
  def lshTopK(corpus: DataFrame, probes: DataFrame, k: Int, dim: Int,
              nBits: Int = 6, nTables: Int = 8, idCol: String = "vec_id",
              vecCol: String = "embedding",
              weight: (Int, Int, Int) => Double =
                VectorFunctions.murmurWeight): DataFrame = {
    def codes(df: DataFrame, idAs: String) =
      df.select(col(idCol).as(idAs),
        explode(array((0 until nTables).map(t =>
          struct(lit(t).as("t"),
            VectorFunctions.hyperplaneCode(col(vecCol), dim, nBits, t,
              weight).as("code"))): _*)).as("tc"))
    val cand = codes(corpus, "neighbor_id")
      .join(codes(probes, "probe_id"), Seq("tc"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .select(col("probe_id"), col("neighbor_id"))
      .distinct()
    def side(df: DataFrame, id: String, vec: String, nrm: String) =
      df.select(col(idCol).as(id), col(vecCol).as(vec),
        VectorFunctions.norm(col(vecCol)).as(nrm))
    val scored = cand
      .join(side(corpus, "neighbor_id", "c_vec", "c_nrm"), "neighbor_id")
      .join(side(probes, "probe_id", "p_vec", "p_nrm"), "probe_id")
      .select(col("probe_id"), col("neighbor_id"), cosineScore.as("cos"))
    topKPerGroup(scored, "probe_id", k)
  }
}
