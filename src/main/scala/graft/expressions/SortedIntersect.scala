package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Intersection size of two SORTED `array<bigint>` columns — a
  * custom Catalyst `BinaryExpression` with whole-stage codegen.
  *
  * The set-similarity verify step (exact Jaccard on shingle-hash
  * sets) runs once per candidate pair — hundreds of thousands of
  * pairs per partition. Spark's `array_intersect` + `array_union`
  * each build a hash set PER CALL and materialize an intermediate
  * array only to take its `size`; for distinct-element sorted inputs
  * the same number is a single allocation-free merge walk, and the
  * union size falls out as |a| + |b| − |a∩b|. 2 sorts per DOCUMENT
  * (done once, in the cached sketch table) buy an O(n) primitive
  * loop per PAIR — the right trade whenever candidates ≫ documents.
  *
  * Inputs MUST be sorted ascending with distinct elements (as
  * produced by `sort_array(array_distinct(...))`); duplicates are
  * counted once per matching position pair, unsorted input
  * undercounts. Null if either side is null.
  */
case class SortedIntersectSize(left: Expression, right: Expression)
  extends BinaryExpression {

  private def okType(dt: DataType): Boolean = dt match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (okType(left.dataType) && okType(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0; var j = 0; var inter = 0
    while (i < nx && j < ny) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { inter += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    inter
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val inter = ctx.freshName("inter")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $nx = $x.numElements(); int $ny = $y.numElements();
         |int $i = 0; int $j = 0; int $inter = 0;
         |while ($i < $nx && $j < $ny) {
         |  long $xv = $x.getLong($i); long $yv = $y.getLong($j);
         |  if ($xv == $yv) { $inter++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $inter;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "sorted_intersect_size"
}

/** Clipped MULTISET overlap of two SORTED `array<string>` columns —
  * Σ_g min(count_left(g), count_right(g)), the kernel of ROUGE /
  * BLEU modified n-gram precision. Same allocation-free merge walk
  * as [[SortedIntersectSize]], over UTF8String binary order (what
  * `sort_array` uses), with duplicates KEPT: a run of c copies on
  * the left and r on the right matches exactly min(c, r) position
  * pairs — the two-pointer `==` branch advances both sides, so each
  * copy pairs at most once. Running it scan-fused per (candidate,
  * reference) row removes the per-(id, gram) explode + shuffle + join
  * an aggregation-based clip pays — measured 8.7 s → sub-second at
  * sf0.1 for the ROUGE driver query. Null if either side is null.
  */
case class SortedOverlapStrings(left: Expression, right: Expression)
  extends BinaryExpression {

  private def okType(dt: DataType): Boolean = dt match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (okType(left.dataType) && okType(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0; var j = 0; var inter = 0
    while (i < nx && j < ny) {
      val c = x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (c == 0) { inter += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    inter
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val inter = ctx.freshName("inter")
      val c = ctx.freshName("cmp")
      s"""
         |int $nx = $x.numElements(); int $ny = $y.numElements();
         |int $i = 0; int $j = 0; int $inter = 0;
         |while ($i < $nx && $j < $ny) {
         |  int $c = $x.getUTF8String($i).compareTo($y.getUTF8String($j));
         |  if ($c == 0) { $inter++; $i++; $j++; }
         |  else if ($c < 0) { $i++; } else { $j++; }
         |}
         |${ev.value} = $inter;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedOverlapStrings =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "sorted_multiset_overlap"
}

object SortedIntersect {
  /** Intersection size of two sorted-distinct long arrays. */
  def size(a: Column, b: Column): Column =
    GraftColumnBridge.column(SortedIntersectSize(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Clipped multiset overlap (Σ min multiplicities) of two SORTED
    * string arrays — duplicates kept; sort with `sort_array` first. */
  def clippedOverlap(a: Column, b: Column): Column =
    GraftColumnBridge.column(SortedOverlapStrings(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Exact Jaccard of two sorted-distinct long arrays:
    * |a∩b| / (|a| + |b| − |a∩b|), one merge walk per pair. */
  def jaccard(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.{size => asize}
    val inter = size(a, b)
    inter.cast("double") / (asize(a) + asize(b) - inter)
  }
}
