package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — for each left row, the LATEST right
  * row with the same key and right.ts <= left.ts. Spark has no
  * native operator for this (the prompt-book example of a gap in the
  * built-ins); the naive theta join `l.ts >= r.ts` explodes to a
  * cross product per key.
  *
  * Spark-first formulation: UNION both sides tagged, one window over
  * (key ORDER BY ts, side) carrying `last(right payload, ignoreNulls)`
  * up to the current row, keep left rows. ONE shuffle on the key —
  * the same cost as a plain equi-join — and no range explosion; at
  * 100 TB this is the only shape that survives (a per-key sort the
  * engine was going to do anyway).
  *
  * Ties (left.ts == right.ts): the right row sorts BEFORE the left
  * row (side tag 0 < 1), so an exactly-simultaneous right row IS
  * matched — `<=` semantics, same as DuckDB's ASOF JOIN.
  *
  * Ties among RIGHT rows (two right rows, same key, same ts): the
  * window order must be TOTAL over right rows or the carried payload
  * is whichever row happens to sort last — nondeterministic across
  * runs and partitionings, which breaks a hash-checked contract.
  * `rightTieBreak` names right-side column(s) that pin the winner:
  * the row with the MINIMUM tie-break value is matched (the
  * `ORDER BY ts DESC, id ASC LIMIT 1` convention). The tie columns
  * ride the union as hidden payload — no extra shuffle. Pass a
  * unique right-row id; empty keeps the (unpinned) legacy behavior.
  */
object AsOfJoin {

  /** Tag + harmonize the two sides for the union-window plan.
    * Hidden columns: __k key, __ts event time, __side (0=right,
    * 1=left), __tb* tie-break values (null on the left side). */
  private def tagged(left: DataFrame, right: DataFrame,
                     leftKey: String, rightKey: String,
                     leftTs: String, rightTs: String,
                     payloadCols: Seq[String],
                     rightTieBreak: Seq[String]): DataFrame = {
    val lCols = left.columns.toSeq
    val tb = rightTieBreak.zipWithIndex
    val l = left.select(
      (col(leftKey).as("__k") +: col(leftTs).as("__ts") +: lit(1).as("__side")
        +: lCols.map(col)) ++
        tb.map { case (c, i) =>
          lit(null).cast(right.schema(c).dataType).as(s"__tb$i") } ++
        payloadCols.map(c =>
          lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val r = right.select(
      (col(rightKey).as("__k") +: col(rightTs).as("__ts") +: lit(0).as("__side")
        +: lCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))) ++
        tb.map { case (c, i) => col(c).as(s"__tb$i") } ++
        payloadCols.map(col): _*)
    l.unionByName(r)
  }

  /** Window order: ts (given direction), then side (right rows first
    * at equal ts), then tie-break DESC so the MIN-tie right row is
    * traversed LAST among its equal-(ts, side) peers and is what
    * `last(…, ignoreNulls)` carries. Left rows hold null tie values
    * but never compare on them — __side already separates the sides. */
  private def orderCols(tsCol: Column, nTie: Int): Seq[Column] =
    (tsCol +: col("__side") +:
      (0 until nTie).map(i => col(s"__tb$i").desc)).toSeq

  /** Left as-of join.
    * @param left  probe side; all its columns survive
    * @param right reference side: key col, ts col, payload cols
    * @param rightTieBreak right columns pinning equal-ts right rows
    *        (minimum wins); pass a unique id for determinism
    * @return left columns + right payload cols (null when no right
    *         row at-or-before the left ts exists) */
  def asOf(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTs: String, rightTs: String,
           payloadCols: Seq[String],
           rightTieBreak: Seq[String] = Seq.empty): DataFrame = {
    val lCols = left.columns.toSeq
    val u = tagged(left, right, leftKey, rightKey, leftTs, rightTs,
      payloadCols, rightTieBreak)
    val w = Window.partitionBy(col("__k"))
      .orderBy(orderCols(col("__ts"), rightTieBreak.size): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = u.select(
      (Seq(col("__side")) ++ lCols.map(col) ++
        payloadCols.map(c => last(col(c), ignoreNulls = true).over(w).as(c))): _*)
    carried.filter(col("__side") === 1).drop("__side")
  }

  /** FORWARD as-of join — for each left row, the EARLIEST right row
    * with the same key and right.ts >= left.ts (pandas
    * merge_asof(direction='forward')): the exact mirror of [[asOf]],
    * one window ordered DESCENDING over the same single key shuffle.
    * Ties (equal ts): the right row is matched (`>=` semantics — in
    * the descending traversal the right side tag still sorts before
    * the left row); equal-ts right rows pin to min rightTieBreak. */
  def asOfForward(left: DataFrame, right: DataFrame,
                  leftKey: String, rightKey: String,
                  leftTs: String, rightTs: String,
                  payloadCols: Seq[String],
                  rightTieBreak: Seq[String] = Seq.empty): DataFrame = {
    val lCols = left.columns.toSeq
    val u = tagged(left, right, leftKey, rightKey, leftTs, rightTs,
      payloadCols, rightTieBreak)
    val w = Window.partitionBy(col("__k"))
      .orderBy(orderCols(col("__ts").desc, rightTieBreak.size): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = u.select(
      (Seq(col("__side")) ++ lCols.map(col) ++
        payloadCols.map(c => last(col(c), ignoreNulls = true).over(w).as(c))): _*)
    carried.filter(col("__side") === 1).drop("__side")
  }

  /** NEAREST as-of join — the closest right row in EITHER direction
    * (pandas merge_asof(direction='nearest')); an exact-distance tie
    * goes to the BACKWARD row (our pinned contract — pandas leaves
    * it unspecified across versions, a hash-checked operator can't).
    * Timestamps must be NUMERIC (the distance subtraction is the
    * definition). Both directional carries ride ONE key shuffle —
    * same partitioning, two sort orders — then a per-row CASE picks
    * the closer side; the right TS travels as a hidden payload so
    * the comparison never re-joins. Equal-ts right rows within each
    * direction pin to min rightTieBreak. */
  def asOfNearest(left: DataFrame, right: DataFrame,
                  leftKey: String, rightKey: String,
                  leftTs: String, rightTs: String,
                  payloadCols: Seq[String],
                  rightTieBreak: Seq[String] = Seq.empty): DataFrame = {
    val lCols = left.columns.toSeq
    val pay = payloadCols :+ "__rts"
    val rightX = right.withColumn("__rts", col(rightTs))
    val u = tagged(left, rightX, leftKey, rightKey, leftTs, rightTs,
      pay, rightTieBreak)
    val wB = Window.partitionBy(col("__k"))
      .orderBy(orderCols(col("__ts"), rightTieBreak.size): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(col("__k"))
      .orderBy(orderCols(col("__ts").desc, rightTieBreak.size): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = u.select(
      (Seq(col("__side"), col("__ts")) ++ lCols.map(col) ++
        pay.map(c => last(col(c), ignoreNulls = true).over(wB)
          .as(s"${c}__b")) ++
        pay.map(c => last(col(c), ignoreNulls = true).over(wF)
          .as(s"${c}__f"))): _*)
    val bts = col("__rts__b")
    val fts = col("__rts__f")
    val useB = bts.isNotNull &&
      (fts.isNull || (col("__ts") - bts) <= (fts - col("__ts")))
    carried.filter(col("__side") === 1)
      .select(lCols.map(col) ++ payloadCols.map(c =>
        when(useB, col(s"${c}__b")).otherwise(col(s"${c}__f")).as(c)): _*)
  }
}
