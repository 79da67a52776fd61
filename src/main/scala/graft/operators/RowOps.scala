package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Generic row/column operators.
  *
  * Spark-first re-expression of ProteoFAV's table utilities:
  * `row_selector` (proteofav/utils.py:97), `exclude_columns`
  * (utils.py:203), `constrain_column_types` (utils.py:136),
  * `splitting_up_by_key` (utils.py:223) and `merging_down_by_key`
  * (utils.py:250). All are `DataFrame => DataFrame` and stay fully
  * declarative so Catalyst pushes filters/projections into the scan.
  */
object RowOps {

  /** Keep rows where `key` equals / is-in `values`; `reverse` negates.
    * reference: proteofav/utils.py:97 (row_selector). */
  def rowSelector(df: DataFrame, key: String, values: Seq[Any],
                  reverse: Boolean = false): DataFrame = {
    val pred: Column =
      if (values.size == 1) col(key) === lit(values.head)
      else col(key).isin(values.map(lit): _*)
    df.filter(if (reverse) !pred else pred)
  }

  /** Drop the given columns (ignoring absent ones).
    * reference: proteofav/utils.py:203 (exclude_columns). */
  def excludeColumns(df: DataFrame, excluded: Seq[String]): DataFrame =
    df.drop(excluded: _*)

  /** Cast columns and fill nulls with defaults — the Spark analog of
    * pandas dtype constraining + fillna.
    * reference: proteofav/utils.py:136 (constrain_column_types). */
  def constrainColumnTypes(df: DataFrame,
                           casts: Map[String, DataType] = Map.empty,
                           fills: Map[String, Any] = Map.empty): DataFrame = {
    val casted = casts.foldLeft(df) { case (d, (c, t)) =>
      d.withColumn(c, col(c).cast(t))
    }
    fills.foldLeft(casted) { case (d, (c, v)) =>
      d.withColumn(c, coalesce(col(c), lit(v)))
    }
  }

  /** Explode a delimited string column into one row per element,
    * dropping empties. reference: proteofav/utils.py:223
    * (splitting_up_by_key). */
  def splitUpByKey(df: DataFrame, key: String, sep: String = ";",
                   as: String = "element"): DataFrame =
    df.withColumn(as,
        explode(filter(split(col(key), sep), e => e =!= lit(""))))
      .drop(key)

  /** Collapse to one row per `groupKeys`: every other column becomes
    * the sorted-unique values joined by `sep` — single shuffle, no
    * driver-side loops. reference: proteofav/utils.py:250
    * (merging_down_by_key). */
  def mergeDownByKey(df: DataFrame, groupKeys: Seq[String],
                     sep: String = ";"): DataFrame = {
    val others = df.columns.filterNot(groupKeys.contains)
    val aggs = others.map { c =>
      array_join(array_sort(collect_set(col(c).cast("string"))), sep).as(c)
    }
    df.groupBy(groupKeys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
