package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Merge/join operators.
  *
  * Re-expresses ProteoFAV's mergers (proteofav/mergers.py:29,65,103,
  * 141,167 pairwise left merges on composite keys; mergers.py:403
  * table_merger chain; mergers.py:193 union-style variant merge) as
  * Spark joins with explicit broadcast hints for genuinely bounded
  * dimension tables. At 100 TB the fact-fact joins shuffle on their
  * keys and rely on AQE for skew; dims under the broadcast threshold
  * never shuffle the fact side.
  */
object Joins {

  /** Left join on pairwise column equalities (composite key).
    * reference: proteofav/mergers.py:65 (mmcif_dssp_table_merger —
    * left merge on [seq_id_full, asym_id] × [RES_FULL, CHAIN_FULL]). */
  def leftMerge(left: DataFrame, right: DataFrame,
                keys: Seq[(String, String)]): DataFrame = {
    val cond = keys.map { case (l, r) => left(l) === right(r) }.reduce(_ && _)
    left.join(right, cond, "left")
  }

  /** Left merge with schema-driven key fallback: each left key may
    * name an alternate column that takes precedence WHEN PRESENT in
    * the schema (the reference's BioUnits workaround — merge on
    * orig_*_asym_id when the table carries it, the plain column
    * otherwise); missing BOTH is an error, matching the reference's
    * TableMergerError rather than a silent empty join.
    * reference: proteofav/mergers.py:29-59. */
  def leftMergeWithFallback(left: DataFrame, right: DataFrame,
                            keys: Seq[(String, Option[String], String)])
  : DataFrame = {
    val resolved = keys.map { case (primary, alt, rightKey) =>
      val leftKey = alt.filter(left.columns.contains).getOrElse(primary)
      require(left.columns.contains(leftKey),
        s"neither '$primary' nor its fallback is present in the left schema")
      require(right.columns.contains(rightKey),
        s"right key '$rightKey' missing from the right schema")
      leftKey -> rightKey
    }
    leftMerge(left, right, resolved)
  }

  /** Chain of left merges — the table_merger pipeline.
    * reference: proteofav/mergers.py:403. */
  def chainMerge(base: DataFrame,
                 steps: Seq[(DataFrame, Seq[(String, String)])]): DataFrame =
    steps.foldLeft(base) { case (acc, (r, keys)) => leftMerge(acc, r, keys) }

  /** Join fact to a bounded dimension with an explicit broadcast hint.
    * reference: proteofav/mergers.py:141 (sifts ⋈ annotation lookups). */
  def broadcastDim(fact: DataFrame, dim: DataFrame, factKey: String,
                   dimKey: String, how: String = "inner"): DataFrame =
    fact.join(broadcast(dim), fact(factKey) === dim(dimKey), how)

  /** Union two row sources and de-duplicate — the uniprot+ensembl
    * variants merge. reference: proteofav/mergers.py:193. */
  def unionDedup(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).distinct()

  /** Keep left rows whose key appears in `ids` (semi) — membership
    * lookup without duplicating left rows. At scale Spark plans this
    * as a broadcast/shuffled semi join: only the key column of the
    * right side ever moves. reference: proteofav/variants.py:196
    * (id cross-mapping membership). */
  def semiJoin(left: DataFrame, ids: DataFrame,
               keys: Seq[(String, String)]): DataFrame = {
    val cond = keys.map { case (l, r) => left(l) === ids(r) }.reduce(_ && _)
    left.join(ids, cond, "left_semi")
  }

  /** Keep left rows whose key does NOT appear in `ids` (anti).
    * reference: proteofav/variants.py:196 (unmapped-id detection). */
  def antiJoin(left: DataFrame, ids: DataFrame,
               keys: Seq[(String, String)]): DataFrame = {
    val cond = keys.map { case (l, r) => left(l) === ids(r) }.reduce(_ && _)
    left.join(ids, cond, "left_anti")
  }
}
