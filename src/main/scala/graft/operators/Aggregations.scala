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
    * decimal, surface as double. */
  def decSum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(28, scale))).cast("double")

  /** Exact mean derived as decimal-sum / count (never avg over raw
    * doubles — partial-aggregation order would change the bits). */
  def decAvg(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(28, scale))).cast("double") / count(lit(1))

  /** Centroid aggregation: per-group exact mean of the given measure
    * columns + group size. reference: proteofav/structures.py:483
    * (residues_aggregation, agg_method='centroid' — mean of
    * Cartesian_x/y/z per residue). */
  def centroid(df: DataFrame, groupKeys: Seq[String],
               measures: Seq[String]): DataFrame = {
    val aggs = measures.map(m => decAvg(col(m)).as(s"${m}_centroid")) :+
      count(lit(1)).as("n")
    df.groupBy(groupKeys.map(col): _*).agg(aggs.head, aggs.tail: _*)
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
    * sequence string). collect_list of (order, value) structs sorted
    * post-hoc, so it is a plain hash aggregation — no sort shuffle.
    * reference: proteofav/structures.py:689 (get_sequence). */
  def orderedConcat(df: DataFrame, groupKeys: Seq[String],
                    orderCol: String, valueCol: String,
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
}
