package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset governance audits — the checks a 100 TB corpus owner runs
  * BEFORE shipping data to training or release: re-identification
  * risk (k-anonymity / l-diversity over quasi-identifier columns)
  * and referential-integrity profiling (orphan rates across the
  * fact→dim key edges a pipeline joins on). Beyond-reference
  * additions in the same spirit as the reference's eager
  * validation-before-merge discipline (ProteoFAV refuses to merge
  * tables whose key columns are absent, mergers.py:29-59); here the
  * refusal signal is a measured table, not an exception.
  *
  * Both audits are single hash aggregations: one shuffle on the
  * audited key, map-side partial combine, output bounded by the
  * number of equivalence classes / relations — never by row count.
  * All risk ratios are integer tick arithmetic (parts-per-million
  * via long floor-division), so results are bit-exact across
  * engines and partitionings.
  */
object Audit {

  /** k-anonymity / l-diversity profile. Every row's quasi-identifier
    * combination (the columns an attacker can link on) defines an
    * equivalence class; a class smaller than k re-identifies its
    * members, and a class whose sensitive column is constant
    * discloses the value even at size ≥ k (the homogeneity attack
    * l-diversity guards). One pass, two aggregates over the same
    * grouping:
    *
    *  - `class_size`  — rows in the class
    *  - `l_distinct`  — distinct sensitive values in the class
    *    (distinct-within-group plans as Spark's two-stage partial
    *    aggregate on (quasi, sensitive) — no per-group set buffer)
    *  - `at_risk_k`   — class_size < k
    *  - `at_risk_l`   — l_distinct < l (homogeneous enough to leak)
    *
    * Scale shape: shuffle keys are the quasi columns; output rows =
    * |classes|, independent of corpus size. A high-cardinality quasi
    * set (many singleton classes) is itself the finding — the table
    * IS the risk report.
    */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String],
                 sensitiveCol: String, k: Int, l: Int = 2): DataFrame = {
    require(quasiCols.nonEmpty, "kAnonymity needs quasi-identifier columns")
    require(k >= 1 && l >= 1, "k and l must be positive")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(col(sensitiveCol)).as("l_distinct"))
      .withColumn("at_risk_k", col("class_size") < k)
      .withColumn("at_risk_l", col("l_distinct") < l)
  }

  /** Referential-integrity profile for one child→parent key edge:
    * total child rows, orphan rows (fk not null, absent from the
    * parent key set), null-fk rows, distinct orphan keys, and the
    * orphan rate in exact parts-per-million
    * (1e6·orphans div non-null children — long floor-division, no
    * float). Output: ONE row tagged `relation`, so audits over many
    * edges union into a single report.
    *
    * Scale shape: ONE membership join + ONE aggregation — the child
    * left-joins the distinct parent key set (build side is |keys|,
    * not |parent rows|; Catalyst broadcasts a dim-sized build), an
    * unmatched non-null fk flags as orphan, and every report column
    * comes out of a single hash aggregate over the flagged rows.
    * Nothing data-sized reaches the driver.
    */
  def referentialIntegrity(relation: String,
                           child: DataFrame, fkCol: String,
                           parent: DataFrame, pkCol: String): DataFrame = {
    val keys = parent.select(col(pkCol).as("__pk")).distinct()
    child.select(col(fkCol).as("__fk"))
      .join(keys, col("__fk") === col("__pk"), "left")
      .select(col("__fk"),
        (col("__fk").isNotNull && col("__pk").isNull).as("__orphan"))
      .agg(count(lit(1)).as("n_child"),
        count(col("__fk")).as("n_fk_nonnull"),
        sum(when(col("__orphan"), 1L).otherwise(0L)).as("n_orphans"),
        countDistinct(when(col("__orphan"), col("__fk")))
          .as("n_orphan_keys"))
      .select(lit(relation).as("relation"),
        col("n_child"),
        (col("n_child") - col("n_fk_nonnull")).as("n_null_fk"),
        col("n_orphans"), col("n_orphan_keys"),
        when(col("n_fk_nonnull") > 0,
          call_function("div", col("n_orphans") * 1000000L,
            col("n_fk_nonnull")))
          .otherwise(lit(0L)).as("orphan_ppm"))
  }

  /** Benford's-law ticks for digits 1..9: floor(1e6·log10(1+1/d)),
    * computed ONCE here on the JVM and interpolated as integer
    * literals into the oracle SQL — the single-source bake that
    * keeps libm log10 out of BOTH engines' query plans. */
  val benfordTicks: Seq[(Int, Long)] = (1 to 9).map { d =>
    d -> math.floor(1e6 * math.log10(1.0 + 1.0 / d)).toLong
  }

  /** BENFORD FIRST-DIGIT PROFILE — the classic fabricated-numbers
    * audit (real-world magnitudes spread across scales follow
    * P(d) = log10(1+1/d); invented or clipped figures don't): per
    * first significant digit, observed count and ppm vs the Benford
    * ppm, plus each digit's absolute deviation — Σdev/2 is the total
    * variation distance, all INTEGER ticks (the expected ppm are
    * baked literals, observed ppm is long floor-division, no libm in
    * the plan). First digit = head of the integer
    * part's decimal string — exact and identical in every engine for
    * |v| ≥ 1 (the operator's contract: rows under 1 are excluded; a
    * fractional rendering would ride each engine's float-formatting
    * rounding). One grouped count; output = ≤ 9 rows.
    */
  def benfordProfile(df: DataFrame, valueCol: String): DataFrame = {
    val firstDigit = substring(
      floor(abs(col(valueCol))).cast("long").cast("string"), 1, 1)
    val counts = df
      .filter(col(valueCol).isNotNull && abs(col(valueCol)) >= 1)
      .groupBy(firstDigit.cast("int").as("digit"))
      .agg(count(lit(1)).as("n"))
    val expected = df.sparkSession.createDataFrame(
      benfordTicks.map { case (d, t) => (d, t) }).toDF("digit", "benford_ppm")
    val tot = counts.agg(sum(col("n")).as("n_total"))
    expected.join(counts, Seq("digit"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .crossJoin(broadcast(tot))
      .select(col("digit"), col("n"),
        call_function("div", col("n") * 1000000L, col("n_total"))
          .as("obs_ppm"),
        col("benford_ppm"))
      .withColumn("dev_ppm",
        abs(col("obs_ppm") - col("benford_ppm")))
  }
}
