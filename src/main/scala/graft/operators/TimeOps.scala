package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Batch time-window aggregation — the batch twin of
  * streaming/EventStreams. reference analog: per-interval collapse of
  * time/sequence-indexed observations (proteofav/sifts.py:64 region
  * segmentation; the events table is the driver's time-series).
  */
object TimeOps {

  /** Epoch-microsecond tumbling-window bucket start. Pure integer
    * arithmetic (`div`) — engine-portable and exact, unlike
    * float-division + floor at 1e15 magnitudes. */
  def windowStartUs(ts: Column, windowMicros: Long): Column =
    call_function("div", unix_micros(ts), lit(windowMicros)) * windowMicros

  /** Tumbling-window count + decimal-exact sum per (window, key).
    * Single hash aggregation; map-side partial combine makes the
    * shuffle carry |windows × keys| states only.
    * Output: window_start_us, <keys...>, n, sum_value. */
  def tumblingAgg(df: DataFrame, tsCol: String, keys: Seq[String],
                  valueCol: String, windowMicros: Long): DataFrame =
    df.groupBy((windowStartUs(col(tsCol), windowMicros).as("window_start_us")
        +: keys.map(col)): _*)
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast(DecimalType(28, 2))).cast("double").as("sum_value"))

  /** Sliding (overlapping) window count + decimal-exact sum per
    * (window, key): each event lands in width/slide windows. Uses
    * Spark's native `window(ts, width, slide)` — the multi-window
    * replication is a codegen'd generator in the scan stage, then one
    * hash aggregation whose shuffle carries |windows × keys| states;
    * no self-join, no range join. Requires width to be a multiple of
    * slide (the standard hopping-window contract).
    * Output: window_start_us, <keys...>, n, sum_value. */
  def slidingAgg(df: DataFrame, tsCol: String, keys: Seq[String],
                 valueCol: String, widthMicros: Long, slideMicros: Long)
  : DataFrame = {
    require(widthMicros % slideMicros == 0,
      "width must be a multiple of slide")
    df.groupBy((window(col(tsCol), s"$widthMicros microseconds",
        s"$slideMicros microseconds").as("w") +: keys.map(col)): _*)
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast(DecimalType(28, 2))).cast("double")
          .as("sum_value"))
      .select((unix_micros(col("w.start")).as("window_start_us")
        +: keys.map(col)) ++ Seq(col("n"), col("sum_value")): _*)
  }

  /** GAP FILL with last-observation-carried-forward (the
    * resample-and-ffill shape every time-series feature pipeline
    * runs before a model sees regular intervals): densify each
    * key's bucket axis to the full [min, max] range
    * (`sequence` + explode — the grid generates distributed, one
    * row per missing bucket, no driver loop), left-join the
    * observed buckets back, and fill each `valueCols` entry with
    * the latest non-null predecessor (`last(ignoreNulls)` over an
    * unbounded-preceding row window). The first bucket of every key
    * is observed by construction (the range STARTS at an observed
    * minimum), so filled values are never null.
    *
    * Scale note: the window runs over the BUCKET GRID (keys ×
    * buckets — hours/days per key), never over the raw event
    * stream; a key's grid is bounded by its time span, so the
    * per-partition window state is small even when the underlying
    * events are not. Emits `<v>_filled` and `<v>_gap` per value
    * column; original (nullable) columns ride along as evidence.
    */
  def gapFillLocf(buckets: DataFrame, keys: Seq[String],
                  bucketCol: String,
                  valueCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty && valueCols.nonEmpty,
      "gapFillLocf needs at least one key and one value column")
    val rng = buckets.groupBy(keys.map(col): _*)
      .agg(min(col(bucketCol)).as("__b0"), max(col(bucketCol)).as("__b1"))
    val grid = rng.select(keys.map(col) :+
      explode(sequence(col("__b0"), col("__b1"))).as(bucketCol): _*)
    val joined = grid.join(buckets, keys :+ bucketCol, "left")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*).orderBy(col(bucketCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    valueCols.foldLeft(joined) { (acc, v) =>
      acc.withColumn(s"${v}_filled",
          last(col(v), ignoreNulls = true).over(w))
        .withColumn(s"${v}_gap", col(v).isNull)
    }
  }

  /** ORDERED FUNNEL over an event log — the product-analytics
    * staple: how many users performed step 1, then step 2 STRICTLY
    * AFTER their first step 1, then step 3 strictly after that
    * earliest qualifying step 2. The strict-order chain is what
    * separates a funnel from three independent filters (a purchase
    * BEFORE signup must not convert), and the min-chain definition —
    * t₁ = first step-1, t₂ = first step-2 after t₁, t₃ = first
    * step-3 after t₂ — is the standard greedy semantics: if any
    * ordered chain exists, the min-chain exists.
    *
    * Scale shape: one keyed aggregation per step, each joined back
    * to the (pre-filtered, step-only) event slice on the user key —
    * never a per-user window over the full stream, never a
    * collect-and-fold; each stage's frame shrinks monotonically
    * (users at step k ⊆ step k−1). Returns per-step user counts as
    * one row: (n_users, n_step1, n_step2, n_step3).
    */
  def funnel(events: DataFrame, steps: Seq[String],
             userCol: String = "user_id", tsCol: String = "ts",
             typeCol: String = "event_type"): DataFrame = {
    require(steps.length == 3, "funnel expects exactly 3 step types")
    val us = unix_micros(col(tsCol))
    val e = events.select(col(userCol).as("u"), col(typeCol).as("et"),
      us.as("us"))
    val t1 = e.filter(col("et") === steps.head)
      .groupBy("u").agg(min(col("us")).as("t1"))
    val t2 = e.filter(col("et") === steps(1))
      .join(t1, "u").filter(col("us") > col("t1"))
      .groupBy("u").agg(min(col("us")).as("t2"))
    val t3 = e.filter(col("et") === steps(2))
      .join(t2, "u").filter(col("us") > col("t2"))
      .groupBy("u").agg(min(col("us")).as("t3"))
    val total = e.select(countDistinct(col("u")).as("n_users"))
    total
      .crossJoin(t1.agg(count(lit(1)).as("n_step1")))
      .crossJoin(t2.agg(count(lit(1)).as("n_step2")))
      .crossJoin(t3.agg(count(lit(1)).as("n_step3")))
  }

  /** RETENTION COHORTS — the other analytics staple: users
    * cohorted by their FIRST active bucket (week), counted in every
    * later bucket they return in. (cohort, offset, n_users) is the
    * retention triangle a dashboard renders; all exact integers.
    * Shape: distinct (user, bucket) pairs → per-user min bucket →
    * one co-partitioned join back → one aggregation. */
  def retentionCohorts(events: DataFrame, bucketMicros: Long,
                       userCol: String = "user_id",
                       tsCol: String = "ts"): DataFrame = {
    require(bucketMicros >= 1L, s"bucketMicros must be >= 1")
    // FLOOR division in exact integer arithmetic: `a - pmod(a, b)` is
    // the largest multiple of b <= a for b > 0, so the div is exact —
    // pre-epoch (negative) timestamps floor like DuckDB's `//`, and
    // no double rounding at 1e15 magnitudes (`/ … cast long` is a
    // double divide truncating toward zero — off by one for a < 0)
    val us = unix_micros(col(tsCol))
    val bucket = call_function("div",
      us - pmod(us, lit(bucketMicros)), lit(bucketMicros))
    val ub = events.select(col(userCol).as("u"), bucket.as("b"))
      .distinct()
    val cohort = ub.groupBy("u").agg(min(col("b")).as("cohort"))
    ub.join(cohort, "u")
      .groupBy(col("cohort"), (col("b") - col("cohort")).as("offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** GROUPED r² (coefficient of determination) between two
    * cents-scalable columns — [[trendSlope]]'s sibling for "are
    * these two measures related per group?". Pearson r needs a
    * sqrt (libm, not engine-portable); r² is PURE RATIONAL:
    * (nΣxy − ΣxΣy)² / ((nΣx² − (Σx)²)(nΣy² − (Σy)²)) — every sum an
    * exact long over scale-quantized values, the final tree a
    * handful of pinned IEEE ops identical in SQL. One map-side-
    * combined aggregation; zero-variance groups null out.
    *
    * CALLER CONTRACT: pick scales so n·max(x)²·scale² fits a long —
    * Σy² is the binding term (2-decimal money at 1e7+ rows wants
    * scale 1, i.e. whole units; the quantization is part of the
    * measure's definition, not an approximation of this code). */
  def groupedR2(df: DataFrame, keyCol: String,
                xCol: String, yCol: String,
                xScale: Long = 1L, yScale: Long = 1L): DataFrame = {
    require(xScale >= 1 && yScale >= 1, "scales must be >= 1")
    val x = floor(col(xCol) * xScale + 0.5).cast("long")
    val y = floor(col(yCol) * yScale + 0.5).cast("long")
    val sums = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(keyCol), x.as("x"), y.as("y"))
      .groupBy(col(keyCol)).agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
    // the combinations run in DOUBLE: n·Σy² overflows a long at
    // ~1e5 rows of unit-scaled money (silent wrap in Spark, an
    // ERROR in DuckDB); each exact long sum casts once and the rest
    // is one pinned IEEE tree, identical in both engines
    def d(c: Column) = c.cast("double")
    val cov = d(sums("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy"))
    val vx = d(sums("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx"))
    val vy = d(sums("n")) * d(col("syy")) - d(col("sy")) * d(col("sy"))
    sums.select(col(keyCol), col("n"),
      when(vx =!= 0.0 && vy =!= 0.0,
        (cov * cov) / (vx * vy)).as("r2"))
  }

  /** GROUPED TREND SLOPE — per-key OLS over a pre-aggregated daily
    * series (activity trending up or down?): y = exact daily cents,
    * x = day index, slope/intercept from the closed-form normal
    * equations. Exactness: every Σ (x, y, xy, x²) is an exact LONG
    * over the rolled-up series; the normal-equation COMBINATIONS run
    * in double — each exact sum casts ONCE and the determinant /
    * numerators are a pinned IEEE tree identical in the SQL replay
    * (the groupedR2 discipline: n·Σxy as a raw long product silently
    * wraps in Spark at large per-bucket cent sums while DuckDB
    * errors — the double tree degrades gracefully and identically in
    * both engines). Scale shape: the daily rollup is ONE map-side-
    * combined aggregation (row-level points never cross the shuffle
    * as x/y pairs); the regression then runs over |keys × days|
    * rows. Degenerate series (one distinct x) yield null slope
    * rather than a division blowup. */
  def trendSlope(events: DataFrame, keyCol: String, tsCol: String,
                 valueCol: String, bucketMicros: Long): DataFrame = {
    require(bucketMicros >= 1L, "bucketMicros must be >= 1")
    val us = unix_micros(col(tsCol))
    val bucket = call_function("div",
      us - pmod(us, lit(bucketMicros)), lit(bucketMicros))
    val daily = events
      .groupBy(col(keyCol), bucket.as("__x"))
      .agg(sum(floor(col(valueCol) * 100 + 0.5).cast("long")).as("__y"))
    // re-zero x per key so Σx² stays small and the intercept is
    // "cents at the key's first bucket"
    val x0 = daily.groupBy(col(keyCol)).agg(min(col("__x")).as("__x0"))
    val pts = daily.join(x0, Seq(keyCol))
      .select(col(keyCol), (col("__x") - col("__x0")).as("x"), col("__y").as("y"))
    val sums = pts.groupBy(col(keyCol)).agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"),
      sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"))
    // each exact long sum casts ONCE; every combination is double —
    // no n·Σxy long product to wrap at large per-bucket cent sums
    val (nD, sxD, syD, sxyD, sxxD) = (sums("n").cast("double"),
      col("sx").cast("double"), col("sy").cast("double"),
      col("sxy").cast("double"), col("sxx").cast("double"))
    val det = nD * sxxD - sxD * sxD
    sums.select(col(keyCol), col("n"),
      when(det =!= 0.0,
        (nD * sxyD - sxD * syD) / det).as("slope_cents_per_bucket"),
      when(det =!= 0.0,
        (sxxD * syD - sxD * sxyD) / det).as("intercept_cents"))
  }

  /** SCD TYPE-2 HISTORY — the slowly-changing-dimension build every
    * warehouse runs over a change log: each key's changes become
    * validity intervals [valid_from_us, valid_to_us) with the open
    * current row marked. One per-key window (lead over the pinned
    * (ts, tie) total order — the tie column makes simultaneous
    * changes deterministic, the C15 discipline); at 100 TB the
    * window partitions by the dimension key, so no partition exceeds
    * one key's change count. */
  def scd2History(changes: DataFrame, keyCol: String, tsCol: String,
                  tieCol: String, attrCols: Seq[String]): DataFrame = {
    require(attrCols.nonEmpty, "scd2History needs attribute columns")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol))
      .orderBy(col("valid_from_us"), col(tieCol))
    changes.select((Seq(col(keyCol), col(tieCol)) ++
        attrCols.map(col) :+
        unix_micros(col(tsCol)).as("valid_from_us")): _*)
      .withColumn("valid_to_us", lead(col("valid_from_us"), 1).over(w))
      .withColumn("is_current", col("valid_to_us").isNull)
  }

  /** HALF-LIFE DECAYED SCORE — freshness weighting for recency-aware
    * ranking (host authority that fades, user activity scores, crawl
    * re-fetch priority): each event contributes value / 2^age, age
    * counted in whole half-lives before `asOfUs`. The usual
    * exp(−λ·Δt) is NOT engine-portable (libm exp differs in the last
    * bit across engines); quantizing age to integer half-lives makes
    * the weight an EXACT power of two — 2^k is a long shift, and
    * 1e6·value / 2^k is two IEEE-pinned double ops identical in any
    * IEEE-754 engine — so the per-event tick
    * floor(1e6 · value / 2^k) is bit-exact, and the per-key SUM of
    * longs is partition-order-independent. Ages are clamped to
    * [0, 62]: future events score as fresh (k=0) rather than
    * exploding, and 2^62 already underweights by ~4.6e18 — beyond
    * any double's contribution at 1e6 scale.
    *
    * Scale shape: one hash aggregation on the key — map-side
    * combine reduces the shuffle to |keys| partial sums; the decay
    * arithmetic is per-row, stage-fused into the scan.
    * Output: key, n_events, decayed_ticks (Σ floor(1e6·v/2^k)),
    * raw_sum (decimal-exact undecayed contrast). */
  def halfLifeScore(events: DataFrame, keyCol: String, tsCol: String,
                    valueCol: String, halfLifeMicros: Long,
                    asOfUs: Long): DataFrame = {
    require(halfLifeMicros >= 1L, "halfLifeMicros must be >= 1")
    val age = lit(asOfUs) - unix_micros(col(tsCol))
    val k = least(lit(62L), greatest(lit(0L),
      call_function("div", age - pmod(age, lit(halfLifeMicros)),
        lit(halfLifeMicros))))
    val weightDen = call_function("shiftleft", lit(1L), k.cast("int"))
      .cast("double")
    val tick = floor(lit(1e6) * col(valueCol) / weightDen).cast("long")
    events.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        sum(tick).as("decayed_ticks"),
        sum(col(valueCol).cast(DecimalType(28, 2))).cast("double")
          .as("raw_sum"))
  }
}
