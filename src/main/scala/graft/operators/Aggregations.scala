package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Group-level aggregation operators.
  *
  * Re-expresses ProteoFAV's residue/annotation aggregation
  * (proteofav/structures.py:483 residues_aggregation,
  * annotation.py:67 annotation_aggregation, structures.py:689
  * get_sequence, structures.py:430 _remove_partial_residues) as
  * single-shuffle Spark aggregations with map-side partial combine.
  *
  * Determinism note: money-like doubles are accumulated as
  * DECIMAL(28+,scale) so results are bit-exact regardless of
  * partition order (see SURVEY.md §5).
  */
object Aggregations {

  /** Exact, order-independent sum of a double column: accumulate in
    * decimal, surface as double. Scale 2 suits money; pass a higher
    * scale (>= 6) for full-precision measures like coordinates. */
  def decSum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(28, scale))).cast("double")

  /** Exact mean derived as decimal-sum / count-of-non-null (matches
    * pandas/DuckDB avg null semantics; never avg over raw doubles —
    * partial-aggregation order would change the bits). */
  def decAvg(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(28, scale))).cast("double") / count(c)

  /** Centroid aggregation: per-group exact mean of the given measure
    * columns + group size. Default scale 6 preserves coordinate
    * precision (the reference takes full-precision means of
    * Cartesian x/y/z). reference: proteofav/structures.py:483
    * (residues_aggregation, agg_method='centroid'). */
  def centroid(df: DataFrame, groupKeys: Seq[String],
               measures: Seq[String], scale: Int = 6): DataFrame = {
    val aggs = measures.map(m => decAvg(col(m), scale).as(s"${m}_centroid")) :+
      count(lit(1)).as("n")
    df.groupBy(groupKeys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** residues_aggregation (structures.py:483), knob for knob: one
    * row per (model, asym, seq) with the reference's per-method
    * column treatment — 'centroid'/'mean' average the numeric
    * columns (decimal-exact, order-independent) and keep the
    * file-order-first value of object columns; 'backbone_centroid'
    * restricts to backbone atoms first; 'first' keeps first-by-order
    * everywhere; 'unique' collects distinct values per column
    * (sorted — the reference keeps appearance order, which has no
    * deterministic distributed analog); `id` always keeps its first
    * value (the reference's columns_to_agg['id']='first'). Unknown
    * method raises. One hash aggregation, single shuffle;
    * "first-by-file-order" is min_by over the id column, so no sort
    * and no window. */
  def residuesAggregation(df: DataFrame, aggMethod: String = "centroid",
                          category: String = "auth",
                          idCol: String = "id"): DataFrame = {
    import org.apache.spark.sql.types.NumericType
    val methods =
      Seq("centroid", "first", "unique", "mean", "backbone_centroid")
    if (!methods.contains(aggMethod)) throw new IllegalArgumentException(
      s"Method $aggMethod is not currently implemented...")
    var t = df
    var m = aggMethod
    if (m == "backbone_centroid") {
      t = t.filter(col(s"${category}_atom_id")
        .isin(graft.sources.Library.backboneAtoms: _*))
      m = "centroid"
    }
    val numericMean = m == "centroid" || m == "mean"
    val keys = Seq("pdbx_PDB_model_num", s"${category}_asym_id",
      s"${category}_seq_id").filter(t.columns.contains)
    def firstByOrder(c: String) =
      min_by(col(c), when(col(c).isNotNull, col(idCol)))
    val aggCols = t.columns.filterNot(keys.contains)
    val aggs = aggCols.map { c =>
      val isNum = t.schema(c).dataType.isInstanceOf[NumericType]
      val e =
        if (c == idCol) firstByOrder(c)
        else if (m == "unique") array_sort(collect_set(col(c)))
        else if (numericMean && isNum) decAvg(col(c), 6)
        else firstByOrder(c)
      e.as(c)
    }
    t.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail.toIndexedSeq: _*)
  }

  /** Flagship pricing-summary aggregation (TPC-H Q1 shape): per
    * (returnflag, linestatus) decimal-exact sums, derived averages,
    * and row counts over lineitem. Single hash aggregation with
    * map-side partial combine — the canonical 100 TB groupBy: no
    * sort, shuffle carries only |groups| × partial states.
    * reference analog: proteofav/structures.py:483
    * (residues_aggregation 'mean' over grouped measures). */
  def pricingSummary(lineitem: DataFrame): DataFrame = {
    // Tight decimal widths so the 3-factor product stays inside both
    // Spark's and DuckDB's 38-digit cap with identical exact math.
    val one = lit(1).cast(DecimalType(6, 4))
    val disc = col("l_extendedprice").cast(DecimalType(12, 4)) *
      (one - col("l_discount").cast(DecimalType(6, 4)))
    val charge = disc * (one + col("l_tax").cast(DecimalType(6, 4)))
    lineitem
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        decSum(col("l_quantity")).as("sum_qty"),
        decSum(col("l_extendedprice")).as("sum_base_price"),
        // Rescale each PER-ROW product to its TRUE scale before
        // summing: the inputs are 2-decimal money, so disc_price =
        // price×(1−disc) needs scale 4 and charge needs scale 6 —
        // the dropped digits are all zero, making the rescale exact
        // in both engines (no rounding mode involved — Spark rounds
        // HALF_UP, DuckDB truncates, which diverges if applied AFTER
        // the sum). With the summed scaled integer < 2^53 both
        // engines' decimal→double conversions are a single exact
        // division → identical bits. Validity bound: group sums must
        // stay under 2^53/10^scale ≈ 9e8 (charge) / 9e11 (disc) —
        // holds through the harness SFs (sf0.1 max group ≈ 5e9 total
        // → per-group ≈ 8.5e8); beyond that the decimal sums remain
        // exact and only the final double conversion may differ by
        // 1 ulp between engines.
        sum(disc.cast(DecimalType(28, 4))).cast("double").as("sum_disc_price"),
        sum(charge.cast(DecimalType(28, 6))).cast("double").as("sum_charge"),
        (decSum(col("l_quantity")) / count(col("l_quantity"))).as("avg_qty"),
        (decSum(col("l_extendedprice")) / count(col("l_extendedprice"))).as("avg_price"),
        (decSum(col("l_discount"), 4) / count(col("l_discount"))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Fixed-width histogram per group: bin = clamp(floor((v−lo)/w)),
    * one map-side-combined aggregation — the shuffle carries
    * |groups × bins| partial counts. Distribution profiling for a
    * new table at any scale (the groupable twin of the sketch
    * percentiles). */
  def histogram(df: DataFrame, valueCol: String, keys: Seq[String],
                lo: Double, width: Double, nBins: Int): DataFrame = {
    val bin = least(lit(nBins - 1), greatest(lit(0),
      floor((col(valueCol) - lo) / width))).cast("long")
    // greatest/least skip nulls, so a null value would otherwise land
    // in bin 0 — drop nulls instead of misattributing them.
    df.filter(col(valueCol).isNotNull)
      .groupBy((keys.map(col) :+ bin.as("bin")): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("bin_lo", lit(lo) + col("bin") * width)
  }

  /** Keep the first row of each group under an explicit ordering —
    * window row_number, one shuffle. reference:
    * proteofav/structures.py:483 (residues_aggregation 'first'). */
  def firstPerGroup(df: DataFrame, groupKeys: Seq[String],
                    ordering: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(groupKeys.map(col): _*).orderBy(ordering: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Per-group ordered concatenation of a value column (residue →
    * sequence string): an aggregate Column for use inside
    * `groupBy(...).agg(...)`. collect_list of (order, value) structs
    * sorted post-hoc, so it is a plain hash aggregation — no sort
    * shuffle. reference: proteofav/structures.py:689 (get_sequence). */
  def orderedConcat(orderCol: String, valueCol: String,
                    sep: String = ""): Column =
    array_join(
      transform(
        array_sort(collect_list(struct(col(orderCol), col(valueCol)))),
        s => s.getField(valueCol)),
      sep)

  /** Drop groups that fail a completeness predicate over the whole
    * group (HAVING). reference: proteofav/structures.py:430
    * (_remove_partial_residues: drop residues with missing backbone
    * atoms). */
  def completeGroups(df: DataFrame, groupKeys: Seq[String],
                     having: Column): DataFrame =
    df.groupBy(groupKeys.map(col): _*)
      .agg(count(lit(1)).as("n_members"))
      .filter(having)

  /** ANALYZE-style COLUMN STATISTICS — what an engine's stats
    * collector ships (row/null counts, exact NDV, min/max, the
    * quartile boundaries a cost model or equi-depth histogram
    * starts from), one output row per profiled column.
    *
    * Shape (the measured one — a first draft computed everything in
    * ONE aggregation with per-column `countDistinct`: Spark plans
    * multi-distinct as an Expand that multiplies every row by
    * |cols|+1 and funnels the whole table through the single global
    * reducer — 16.4 s at sf0.1 vs 1.4 s for this form):
    *  - counts / nulls / min / max for ALL columns in one pass of
    *    cheap partial aggregations;
    *  - exact NDV per column as a DISTRIBUTED two-stage
    *    (groupBy(col) map-side combine, then count the group rows —
    *    never a single-task distinct; the cost model needs real
    *    NDV, the sketch variant is the sketch_profile family);
    *  - quartiles per column as the B7 exact interpolated
    *    percentile — its final merge holds ONE column's value map,
    *    not |cols| of them (the _scale twin exists for columns too
    *    wide even alone). `sketched = true` is the 100 TB form: the
    *    whole-table percentile IS a one-group aggregate (the
    *    B7 exact-form caveat at its worst — every value of the
    *    column buffers in ONE task), so the quartiles come from the
    *    mergeable KLL aggregate instead (O(k·log n) state, discrete
    *    quantiles at the spec-pinned rank error).
    * The per-leg re-scans prune to a SINGLE column each — in a
    * columnar format the "extra" passes reread only the bytes of
    * the column being profiled, not the table. */
  def columnStats(df: DataFrame, cols: Seq[String],
                  sketched: Boolean = false,
                  sketchK: Int = 200): DataFrame = {
    require(cols.nonEmpty, "columnStats needs at least one column")
    require(cols.forall(!_.contains("`")),
      "columnStats: backticks in column names are not supported")
    // backtick-quote EVERY name reference: a bare col("a.b") parses
    // the dot as a struct accessor and expr("percentile(a-b, …)")
    // parses the hyphen as a minus — quoting makes names with
    // spaces/dots/hyphens first-class (and the __nn_/__mn_ aliases
    // inherit the same characters, so their reads quote too)
    def qc(c: String): Column = col(s"`$c`")
    val base = df.agg(
      count(lit(1)).as("n_rows"),
      cols.flatMap(c => Seq(
        sum(when(qc(c).isNull, 1L).otherwise(0L)).cast("long")
          .as(s"__nn_$c"),
        min(qc(c)).cast("double").as(s"__mn_$c"),
        max(qc(c)).cast("double").as(s"__mx_$c"))): _*)
    val legs = cols.map { c =>
      val quartiles =
        if (sketched)
          df.agg(graft.expressions.KllQuantiles.kllQuantiles(
              qc(c).cast("double"), Seq(0.25, 0.5, 0.75), sketchK)
            .as("__qs"))
            .select(element_at(col("__qs"), 1).as("p25"),
              element_at(col("__qs"), 2).as("p50"),
              element_at(col("__qs"), 3).as("p75"))
        else df.agg(
          // ONE percentile buffer for all three quartiles: separate
          // percentile() calls each build their own value-count map
          // of the ENTIRE column and sort it independently (r17 —
          // measured 3x the aggregate state and sort work for
          // identical values; the array form is the same exact
          // interpolation over one buffer)
          expr(s"percentile(`$c`, array(0.25, 0.5, 0.75))").as("__qs"))
          .select(col("__qs")(0).as("p25"), col("__qs")(1).as("p50"),
            col("__qs")(2).as("p75"))
      df.groupBy(qc(c)).agg(count(lit(1)))
        .filter(qc(c).isNotNull)
        .agg(count(lit(1)).cast("long").as("ndv"))
        .crossJoin(quartiles)
        .select(lit(c).as("column"), col("ndv"), col("p25"),
          col("p50"), col("p75"))
    }.reduce(_ unionByName _)
    // ONE crossJoin against the 1-row base (referencing base inside
    // each leg would recompute the all-columns pass per column);
    // the per-column base fields project out by a literal CASE chain
    def pick(prefix: String) = cols.tail.foldLeft(
      when(col("column") === cols.head, qc(s"__${prefix}_${cols.head}"))) {
      (acc, c) => acc.when(col("column") === c, qc(s"__${prefix}_$c"))
    }
    legs.crossJoin(broadcast(base))
      .select(col("column"), col("n_rows"),
        pick("nn").as("n_null"), col("ndv"),
        pick("mn").as("min_v"), pick("mx").as("max_v"),
        col("p25"), col("p50"), col("p75"))
  }

  /** CONTINGENCY CHI-SQUARE + Cramér's V — categorical association
    * between two columns (is `lang` independent of `source`? the
    * mix-shift detector for corpus slices). Observed/expected counts
    * are exact integers/rationals; each cell's (O−E)²/E term floors
    * ONCE to 1e-6 ticks (the pageRankTicks discipline), so the
    * cross-partition SUM is LONG arithmetic — order-independent and
    * hash-exact, where a double Σ over cells would pick up
    * partition-order ULPs. Cramér's V² derives from the ticked χ²
    * by integer division (a DEFINED derived metric, mirrored in the
    * replay). Shape: one (a, b) count aggregation, two broadcast
    * marginal joins, one single-row rollup; cells = |A|×|B|.
    * Output: n, n_a, n_b, dof, chi2_ticks, cramers_v2_ppm. */
  def chiSquare(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df.filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol).as("__a"), col(bCol).as("__b"))
      .agg(count(lit(1)).as("o"))
    val ra = cells.groupBy("__a").agg(sum(col("o")).as("ta"))
    val rb = cells.groupBy("__b").agg(sum(col("o")).as("tb"))
    val tot = cells.agg(sum(col("o")).as("n"),
      countDistinct(col("__a")).as("n_a"),
      countDistinct(col("__b")).as("n_b"))
    // DENSIFY: a zero-observed cell still contributes (its E is not
    // 0) — the grid is marginals × marginals with o coalesced, the
    // langIdModel dense-CTE precedent
    val joined = ra.crossJoin(rb)
      .join(cells, Seq("__a", "__b"), "left")
      .withColumn("o", coalesce(col("o"), lit(0L)))
      .crossJoin(broadcast(tot))
    // (O − E)²/E with E = ta·tb/n, as the algebraically-equal
    // (O·n − ta·tb)² / (n·ta·tb) — numerator/denominator exact longs
    // cast once, ONE pinned double division, then the tick floor
    val num = (col("o") * col("n") - col("ta") * col("tb"))
    val term = (num.cast("double") * num.cast("double")) /
      (col("n") * col("ta") * col("tb")).cast("double")
    joined
      .select(col("n"), col("n_a"), col("n_b"),
        floor(lit(1e6) * term).cast("long").as("cell_ticks"))
      .groupBy("n", "n_a", "n_b")
      .agg(sum(col("cell_ticks")).as("chi2_ticks"))
      .select(col("n"), col("n_a"), col("n_b"),
        ((col("n_a") - 1) * (col("n_b") - 1)).as("dof"),
        col("chi2_ticks"),
        when(least(col("n_a"), col("n_b")) > 1,
          call_function("div", col("chi2_ticks"),
            col("n") * (least(col("n_a"), col("n_b")) - 1)))
          .otherwise(lit(0L)).as("cramers_v2_ppm"))
  }
}
