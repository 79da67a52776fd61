package graft.plans

import graft.expressions.{ArrayDot, BoundedTopK, LongestMatchEncode, MinHashSig, MultiPatternCount, SortedIntersectSize, SortedOverlapStrings, WordPieceEncode}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Spark session extension: registers graft's custom expressions so
  * plain `spark.sql` users can call them.
  *
  * Usage: `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`
  * or `SparkSession.builder.withExtensions(new GraftExtensions()(_))`.
  *
  *   SELECT probe_id, bounded_top_k(cos, neighbor_id, 5) FROM scored
  *   GROUP BY probe_id
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    // HOF dot-product pattern -> codegen'd ArrayDot (semantics-equal;
    // see DotProductRewrite). Users writing the portable SQL spelling
    // get the native expression for free.
    ext.injectOptimizerRule(_ => DotProductRewrite)
  }
}

object GraftExtensions {

  /** The registrations, exposed so tests exercise the EXACT builder
    * lambdas (argument-shape matches included) that production
    * sessions get via injectFunction. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
    Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("bounded_top_k"),
      new ExpressionInfo(classOf[BoundedTopK].getName, "bounded_top_k"),
      (args: Seq[Expression]) => args match {
        case Seq(score, id, Literal(k: Int, _)) => BoundedTopK(score, id, k)
        case _ => throw new IllegalArgumentException(
          "bounded_top_k(score double, id bigint, k int-literal)")
      }),
    (new FunctionIdentifier("array_dot"),
      new ExpressionInfo(classOf[ArrayDot].getName, "array_dot"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => ArrayDot(a, b)
        case _ => throw new IllegalArgumentException(
          "array_dot(array<float|double>, array<float|double>)")
      }),
    (new FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_signature"),
      (args: Seq[Expression]) => args match {
        case Seq(sh, Literal(n: Int, _)) => MinHashSig(sh, n)
        case _ => throw new IllegalArgumentException(
          "minhash_signature(array<bigint>, numHashes int-literal)")
      }),
    (new FunctionIdentifier("sorted_intersect_size"),
      new ExpressionInfo(classOf[SortedIntersectSize].getName,
        "sorted_intersect_size"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => SortedIntersectSize(a, b)
        case _ => throw new IllegalArgumentException(
          "sorted_intersect_size(array<bigint> sorted-distinct, array<bigint> sorted-distinct)")
      }),
    (new FunctionIdentifier("longest_match_encode"),
      new ExpressionInfo(classOf[LongestMatchEncode].getName,
        "longest_match_encode"),
      (args: Seq[Expression]) => args match {
        case Seq(word, vocab) =>
          LongestMatchEncode(word,
            stringArray(vocab, "longest_match_encode vocab"))
        case _ => throw new IllegalArgumentException(
          "longest_match_encode(word string, vocab array<string> constant)")
      }),
    (new FunctionIdentifier("wordpiece_encode"),
      new ExpressionInfo(classOf[WordPieceEncode].getName,
        "wordpiece_encode"),
      (args: Seq[Expression]) => args match {
        case Seq(word, vocab) =>
          WordPieceEncode(word,
            stringArray(vocab, "wordpiece_encode vocab"), "[UNK]", 100)
        case Seq(word, vocab, Literal(unk: UTF8String, StringType),
            Literal(max: Int, _)) =>
          WordPieceEncode(word,
            stringArray(vocab, "wordpiece_encode vocab"),
            unk.toString, max)
        case _ => throw new IllegalArgumentException(
          "wordpiece_encode(word string, vocab array<string> constant" +
            "[, unk string-literal, maxWordChars int-literal])")
      }),
    (new FunctionIdentifier("multi_pattern_count"),
      new ExpressionInfo(classOf[MultiPatternCount].getName,
        "multi_pattern_count"),
      (args: Seq[Expression]) => args match {
        case Seq(text, pats) =>
          MultiPatternCount(text,
            stringArray(pats, "multi_pattern_count patterns"))
        case _ => throw new IllegalArgumentException(
          "multi_pattern_count(text string, patterns array<string> constant)")
      }),
    (new FunctionIdentifier("sorted_multiset_overlap"),
      new ExpressionInfo(classOf[SortedOverlapStrings].getName,
        "sorted_multiset_overlap"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => SortedOverlapStrings(a, b)
        case _ => throw new IllegalArgumentException(
          "sorted_multiset_overlap(array<string> sorted, array<string> sorted)")
      }))

  /** Fold a constant array<string> argument (an `array('a','b')`
    * literal in SQL arrives as a foldable CreateArray, not a
    * Literal) into the Seq the kernel expressions carry as data. */
  private def stringArray(e: Expression, what: String): Seq[String] = {
    val ok = e.foldable && (e.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    })
    if (!ok) throw new IllegalArgumentException(
      s"$what must be a constant array<string>")
    val data = e.eval(null).asInstanceOf[ArrayData]
    (0 until data.numElements()).map { i =>
      val s = data.getUTF8String(i)
      if (s == null) throw new IllegalArgumentException(
        s"$what: array elements must be non-null string literals " +
          s"(element $i is NULL)")
      s.toString
    }
  }
}
