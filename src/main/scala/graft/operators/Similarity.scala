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

  /** Brute-force cosine top-k: broadcast `probes` (must be small)
    * against `corpus`, then a per-probe top-k AGGREGATION — partial
    * top-k lists merge map-side, so the shuffle carries only
    * |probes| × k rows and there is no global sort of the scored
    * probe×corpus set (a window row_number here would shuffle and
    * sort the whole cross product — the 100 TB killer).
    * Deterministic ties: score desc, then neighbor id asc. */
  def bruteForceTopK(corpus: DataFrame, probes: DataFrame, k: Int,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    // norms precomputed once per side — not once per scored pair
    val p = probes.select(col(idCol).as("probe_id"), col(vecCol).as("p_vec"),
      VectorFunctions.norm(col(vecCol)).as("p_nrm"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("c_vec"), VectorFunctions.norm(col(vecCol)).as("c_nrm"))
    val denom = col("p_nrm") * col("c_nrm")
    val scored = c.join(broadcast(p), col("probe_id") =!= col("neighbor_id"))
      .select(col("probe_id"), col("neighbor_id"),
        when(denom === 0.0, lit(0.0))
          .otherwise(VectorFunctions.dot(col("p_vec"), col("c_vec")) / denom)
          .as("cos"))
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

  /** LSH-bucketed ANN: corpus and probes coded with `nBits` random
    * hyperplanes; candidates = same code (equi-join), ranked by exact
    * cosine within bucket. Recall < 1 by construction — the 100 TB
    * trade: no cross join ever materializes. */
  def lshTopK(corpus: DataFrame, probes: DataFrame, k: Int, dim: Int,
              nBits: Int = 6, idCol: String = "vec_id",
              vecCol: String = "embedding"): DataFrame = {
    def coded(df: DataFrame, id: String, vec: String, nrm: String) =
      df.select(col(idCol).as(id), col(vecCol).as(vec),
        VectorFunctions.norm(col(vecCol)).as(nrm),
        VectorFunctions.hyperplaneCode(col(vecCol), dim, nBits).as("code"))
    val c = coded(corpus, "neighbor_id", "c_vec", "c_nrm")
    val p = coded(probes, "probe_id", "p_vec", "p_nrm")
    val denom = col("p_nrm") * col("c_nrm")
    val scored = c.join(p, Seq("code"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .select(col("probe_id"), col("neighbor_id"),
        when(denom === 0.0, lit(0.0))
          .otherwise(VectorFunctions.dot(col("p_vec"), col("c_vec")) / denom)
          .as("cos"))
    topKPerGroup(scored, "probe_id", k)
  }
}
