package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Viterbi (max-score) segmentation of one WORD under a unigram
  * piece model — the decode kernel of a SentencePiece-style unigram
  * tokenizer, and the DP counterpart of [[LongestMatchEncode]]'s
  * greedy maximal munch: where greedy commits to the longest prefix,
  * Viterbi picks the GLOBALLY best split by total piece weight
  * (weights are integer ticks of log-probabilities, so the DP is
  * exact integer arithmetic — bit-replayable across engines).
  *
  * The model is carried as expression data (piece → weight ticks,
  * the LongestMatchEncode / IVF-centroid precedent) and compiled once
  * per executor into a transient UTF-8 byte trie with terminal
  * weights; each row is O(len × maxPieceLen) trie walks. Characters
  * not covered by any piece segment as single-character tokens at
  * `oovWeight` (the unk-piece floor) — multi-byte characters advance
  * whole code points, never a fraction of one, so concatenating the
  * output always reproduces the input word.
  *
  * Determinism contract (spec-pinned, replayed by the SQL oracle):
  * best[e] = max over s of best[s] + w(word[s..e)); on equal score
  * the SMALLEST s wins (prefer the longer final piece). Positions
  * are visited in increasing order, so the tie rule is total.
  *
  * Codegen keeps the row loop inside whole-stage codegen via a
  * reference-object call (BoundedTopK precedent).
  */
case class ViterbiSegment(child: Expression, model: Seq[(String, Long)],
                          oovWeight: Long)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got " +
        child.dataType.catalogString)

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  // --- weighted byte trie, rebuilt lazily per deserialized instance ---
  private final class Node {
    val children = new java.util.HashMap[Integer, Node]()
    var weight: Long = Long.MinValue // MinValue = not a terminal
  }

  @transient private lazy val root: Node = {
    val r = new Node
    model.foreach { case (term, w) =>
      val bytes = term.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var node = r
      var i = 0
      while (i < bytes.length) {
        val key = Integer.valueOf(bytes(i) & 0xff)
        var next = node.children.get(key)
        if (next == null) { next = new Node; node.children.put(key, next) }
        node = next
        i += 1
      }
      if (bytes.nonEmpty) node.weight = w
    }
    r
  }

  /** UTF-8 lead-byte character length, clamped to the remainder. */
  private def charLen(b: Int, remaining: Int): Int = {
    val n =
      if ((b & 0x80) == 0) 1
      else if ((b & 0xe0) == 0xc0) 2
      else if ((b & 0xf0) == 0xe0) 3
      else if ((b & 0xf8) == 0xf0) 4
      else 1 // broken lead byte: advance one so we always terminate
    math.min(n, remaining)
  }

  /** One word → its max-score segmentation. Public only for the
    * codegen reference call and the spec's sequential replay. */
  def segment(word: UTF8String): GenericArrayData = {
    val bytes = word.getBytes
    val n = bytes.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val best = Array.fill(n + 1)(Long.MinValue)
    val back = Array.fill(n + 1)(-1)
    best(0) = 0L
    var p = 0
    while (p < n) {
      if (best(p) != Long.MinValue) {
        val base = best(p)
        val cl = charLen(bytes(p) & 0xff, n - p)
        var coveredSingle = false
        var node = root
        var q = p
        var continue = true
        while (continue && q < n) {
          val next = node.children.get(Integer.valueOf(bytes(q) & 0xff))
          if (next == null) continue = false
          else {
            node = next
            q += 1
            if (node.weight != Long.MinValue) {
              val cand = base + node.weight
              if (cand > best(q) || (cand == best(q) && p < back(q))) {
                best(q) = cand; back(q) = p
              }
              if (q == p + cl) coveredSingle = true
            }
          }
        }
        if (!coveredSingle) {
          val q2 = p + cl
          val cand = base + oovWeight
          if (cand > best(q2) || (cand == best(q2) && p < back(q2))) {
            best(q2) = cand; back(q2) = p
          }
        }
      }
      p += 1
    }
    // backtrack (every char boundary is reachable via the fallback)
    val out = new scala.collection.mutable.ArrayBuffer[Any](8)
    var pos = n
    while (pos > 0) {
      val s = back(pos)
      out += UTF8String.fromBytes(bytes, s, pos - s)
      pos = s
    }
    new GenericArrayData(out.reverse.toArray)
  }

  override protected def nullSafeEval(input: Any): Any =
    segment(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("segmenter", this,
      classOf[ViterbiSegment].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.segment($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): ViterbiSegment = copy(child = newChild)
  override def prettyName: String = "viterbi_segment"
}

object ViterbiSegment {
  /** Max-score unigram segmentation of a single word column. */
  def segment(word: Column, model: Seq[(String, Long)],
              oovWeight: Long): Column =
    GraftColumnBridge.column(ViterbiSegment(
      GraftColumnBridge.expression(word), model, oovWeight))
}
