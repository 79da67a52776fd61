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

  /** Bloom prefilter for a big-probe semi join: build a bloom filter
    * over the build side's keys (Spark's own Catalyst
    * `BloomFilterAggregate`, merged tree-wise like any partial
    * aggregate), then keep only probe rows whose key MIGHT be in it
    * (`BloomFilterMightContain`, codegen'd, zero false negatives).
    *
    * This is the runtime-filter shape Catalyst's InjectRuntimeFilter
    * produces for selective joins, exposed as an explicit operator:
    * at 100 TB the win is that the probe side is cut to ~selectivity
    * BEFORE its shuffle, and the build side ships as one
    * O(numBits/8) sketch (a few MB for 100M keys at 3% fpp) where a
    * broadcast hash join would need the full key set and a shuffled
    * semi join would move every probe row. The sketch is bounded
    * driver state (the Ivf-centroid precedent): collecting it is
    * exactly the materialization Catalyst's ScalarSubquery performs.
    *
    * False positives survive — callers needing exact semantics use
    * [[bloomSemiJoin]], which chains the exact semi join on the
    * (already tiny) prefiltered probe. */
  def bloomPrefilter(probe: DataFrame, build: DataFrame,
                     keys: Seq[(String, String)],
                     expectedItems: Long = 1000000L): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    require(keys.nonEmpty, "bloomPrefilter needs at least one key pair")
    // xxhash64 hashes e.g. Int and Long inputs DIFFERENTLY and no
    // coercion is inserted for hash children — mismatched key types
    // would silently hash build and probe keys onto disjoint values
    // and drop every true match. Fail loud instead.
    for ((l, r) <- keys) {
      // resolve through select (the session's resolver — honors
      // case-insensitivity and qualified names), not a case-sensitive
      // StructType lookup that would reject names probe(l) accepts
      val lt = probe.select(probe(l)).schema.head.dataType
      val rt = build.select(build(r)).schema.head.dataType
      require(lt == rt,
        s"bloom key type mismatch: probe '$l' is $lt, build '$r' is $rt " +
          "— cast the columns to a common type first")
    }
    val buildHash = xxhash64(keys.map { case (_, r) => build(r) }: _*)
    val agg = new BloomFilterAggregate(expression(buildHash), expectedItems)
    val sketch = build
      .select(column(agg.toAggregateExpression()).as("bf"))
      .head.getAs[Array[Byte]](0)
    val probeHash = xxhash64(keys.map { case (l, _) => probe(l) }: _*)
    probe.filter(column(BloomFilterMightContain(
      Literal.create(sketch, org.apache.spark.sql.types.BinaryType),
      expression(probeHash))))
  }

  /** Exact semi join with a bloom prefilter on the probe side:
    * result is IDENTICAL to [[semiJoin]] (the exact join clears the
    * bloom's false positives; the bloom has no false negatives), but
    * the probe side entering the join shuffle is already reduced to
    * roughly the matching fraction. The shape for "keep the 0.1% of
    * a 100 TB fact table whose key appears in a 100M-row build side
    * that is too big to broadcast as a hash relation".
    *
    * The build side is consumed TWICE — the sketch-build action and
    * the exact join. A plain table scan re-reads cheaply, but if
    * `build` is a derived pipeline, persist it first (the
    * [[Corpus.decontaminate]] bloom path does exactly this) or the
    * derivation runs twice. */
  def bloomSemiJoin(probe: DataFrame, build: DataFrame,
                    keys: Seq[(String, String)],
                    expectedItems: Long = 1000000L): DataFrame =
    semiJoin(bloomPrefilter(probe, build, keys, expectedItems), build, keys)
}
