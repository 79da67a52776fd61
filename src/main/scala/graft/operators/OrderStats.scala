package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed order statistics without a global sort: the machinery
  * behind scale-safe exact top-N selection (DSIR) and per-group
  * tercile boundaries (CCNet). A single-partition `row_number` window
  * is exact but funnels the whole corpus through one task at 100 TB;
  * the operators here compute the same answers with bounded driver
  * state and no un-partitioned WindowExec anywhere in the plan:
  * quantile-sketch narrowing to a small value band, then an exact
  * walk over the band's (value, count) table.
  */
object OrderStats {

  /** Exact k-th largest value of a numeric column (1-based, multiset
    * order statistic), plus the exact count of rows strictly greater
    * than it. No global sort: each iteration picks a pivot with
    * `approxQuantile` (rank error <= relErr * bandRows) and narrows
    * the candidate band with exact counts; once the band fits under
    * `exactFinishRows` the answer comes from a driver walk of the
    * band's distinct-value counts (a bounded-metadata collect, the
    * same discipline as IVF centroids / PQ codebooks). The band
    * shrinks geometrically (~2*relErr per pinch pair), so 100 TB
    * converges in a handful of scan-narrow rounds.
    *
    * Pivot comparisons run on the column cast to double; that cast is
    * monotone, and the final value is read back in the column's own
    * type from the band walk, so longs beyond 2^53 still resolve
    * exactly. Null values are ignored (a null never has a rank).
    *
    * Returns (kthValue, countStrictlyGreater) with
    * countStrictlyGreater < k <= countGreaterOrEqual by construction.
    */
  def kthLargest(df: DataFrame, valueCol: String, k: Long,
                 relErr: Double = 1e-3, exactFinishRows: Long = 100000L,
                 maxIters: Int = 64): (Any, Long) = {
    require(k >= 1, s"k must be >= 1, got $k")
    val base = df.select(col(valueCol)).filter(col(valueCol).isNotNull)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val vd = col(valueCol).cast("double")
      var band: DataFrame = base
      var kk = k // rank of the target within the current band, from the top
      var dropped = 0L // rows above the band (all > the k-th value)
      var iter = 0
      while (iter < maxIters) {
        val nb = band.count()
        require(nb >= kk,
          s"k=$k exceeds the non-null row count (band $nb, need $kk)")
        def bandWalk(b: DataFrame, k0: Long, dropped0: Long): (Any, Long) = {
          // exact finish: walk the band's distinct (value, count)
          // table on the driver (bounded by construction at the call
          // sites — either <= exactFinishRows rows or a single
          // double-collision class of values)
          val rows = b.groupBy(col(valueCol)).count()
            .orderBy(col(valueCol).desc).collect()
          var acc = 0L
          var i = 0
          while (i < rows.length) {
            val cnt = rows(i).getLong(1)
            if (acc + cnt >= k0)
              return (rows(i).get(0), dropped0 + acc)
            acc += cnt
            i += 1
          }
          sys.error(s"band walk exhausted at $acc < $k0 — unreachable")
        }
        if (nb <= exactFinishRows)
          return bandWalk(band, kk, dropped)
        val q = math.max(0.0, math.min(1.0, 1.0 - kk.toDouble / nb))
        val t = band.stat.approxQuantile(valueCol, Array(q), relErr)(0)
        val r = band.agg(
          sum(when(vd > t, 1L).otherwise(0L)).cast("long"),
          sum(when(vd >= t, 1L).otherwise(0L)).cast("long")).head()
        val cGt = r.getLong(0)
        val cGe = r.getLong(1)
        if (cGt >= kk) {
          // pivot below the target: values <= t all rank BELOW the
          // k-th, so `dropped` (rows above it) is unchanged
          band = band.filter(vd > t)
        } else if (cGe < kk) {
          // pivot above the target: rows >= t are all above the k-th
          dropped += cGe
          kk -= cGe
          band = band.filter(vd < t)
        } else {
          // bracketed in double space: the target sits in the pivot's
          // double-collision class — distinct exact values inside one
          // double are bounded by its ulp span, so resolve exactly
          // now (also covers the degenerate all-one-weight band that
          // row-count narrowing could never shrink)
          return bandWalk(band.filter(vd === t), kk - cGt, dropped + cGt)
        }
        iter += 1
      }
      sys.error(s"kthLargest failed to converge in $maxIters rounds " +
        s"(relErr=$relErr) — raise exactFinishRows or relErr")
    } finally base.unpersist(false)
  }

  /** Exact top-N selection by (weight desc, id asc) WITHOUT a global
    * sort: marks every row with `selected` = whether it is among the
    * first `n` under that total order — bit-identical to
    * `row_number().over(Window.orderBy(weight desc, id asc)) <= n`,
    * but the plan never contains an un-partitioned window. Shape:
    * [[kthLargest]] finds the boundary weight w* and the exact count
    * above it; only the rows TIED at w* (bounded by the boundary
    * weight's multiplicity — tiny for 64-bit sum weights) pass
    * through a window partitioned by the weight column to break the
    * tie by id, and the winners come back as a broadcast semi-set.
    * Rows with a null weight are never selected.
    *
    * `df` is scanned several times (count, narrowing rounds, the tie
    * scan, the final join) — persist it first unless its lineage is
    * trivial, as dsirWeights/perplexityBucketsByBoundary do.
    */
  def selectTopN(df: DataFrame, n: Long, weightCol: String,
                 idCol: String, relErr: Double = 1e-3,
                 exactFinishRows: Long = 100000L): DataFrame = {
    if (n <= 0L)
      return df.withColumn("selected", lit(false))
    val total = df.filter(col(weightCol).isNotNull).count()
    if (n >= total)
      return df.withColumn("selected", col(weightCol).isNotNull)
    val (wStar, cGt) = kthLargest(df, weightCol, n, relErr, exactFinishRows)
    val slots = n - cGt // boundary ties to admit, smallest ids first
    val tieW = org.apache.spark.sql.expressions.Window
      .partitionBy(col(weightCol)).orderBy(col(idCol).asc)
    val tieKeep = broadcast(
      df.filter(col(weightCol) === lit(wStar))
        .select(col(idCol), row_number().over(tieW).as("__tie_rk"))
        .filter(col("__tie_rk") <= slots)
        .select(col(idCol), lit(true).as("__tie_sel")))
    df.join(tieKeep, Seq(idCol), "left_outer")
      .withColumn("selected",
        coalesce((col(weightCol) > lit(wStar)) ||
          coalesce(col("__tie_sel"), lit(false)), lit(false)))
      .drop("__tie_rk", "__tie_sel")
  }
}
