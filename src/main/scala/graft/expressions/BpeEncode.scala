package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match (maximal-munch) subword tokenization of one
  * WORD against a fixed vocabulary — the production BPE/WordPiece
  * encode kernel ([[graft.operators.Bpe.applyMerges]] replays merges
  * in training order, which is faithful to the trainer but builds an
  * O(nMerges)-deep expression chain; a deployed 32k-vocab tokenizer
  * encodes against the merge-product TABLE instead — same model,
  * O(word) apply).
  *
  * The vocabulary is carried as expression data (a literal list, like
  * the IVF centroid matrix — data, not code) and compiled once per
  * executor into a transient UTF-8 byte trie; each row is a single
  * trie walk per input position: longest terminal wins, a character
  * not starting any vocab entry falls back to itself (single-char
  * tokens are implicitly in-vocab, the Sennrich base alphabet). Vocab
  * entries are whole-character strings, so byte-level matches always
  * end on character boundaries, and the fallback advances one UTF-8
  * character (code point), never a fraction of one. Concatenating the
  * output tokens always reproduces the input word exactly.
  *
  * Codegen keeps the row loop inside whole-stage codegen via a
  * reference-object call (BoundedTopK precedent).
  */
case class LongestMatchEncode(child: Expression, vocab: Seq[String])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got " +
        child.dataType.catalogString)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  // --- byte trie, rebuilt lazily per deserialized instance ---
  private final class Node {
    val children = new java.util.HashMap[Integer, Node]()
    var terminal = false
  }

  @transient private lazy val root: Node = {
    val r = new Node
    vocab.foreach { term =>
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
      if (bytes.nonEmpty) node.terminal = true
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

  /** One word → its greedy longest-match token array. Public only for
    * the codegen reference call. */
  def encode(word: UTF8String): ArrayData = {
    val bytes = word.getBytes
    val out = new scala.collection.mutable.ArrayBuffer[Any](8)
    var p = 0
    while (p < bytes.length) {
      var node = root
      var q = p
      var best = -1
      var continue = true
      while (continue && q < bytes.length) {
        val next = node.children.get(Integer.valueOf(bytes(q) & 0xff))
        if (next == null) continue = false
        else {
          node = next
          q += 1
          if (node.terminal) best = q
        }
      }
      val end =
        if (best > p) best
        else p + charLen(bytes(p) & 0xff, bytes.length - p)
      out += UTF8String.fromBytes(bytes, p, end - p)
      p = end
    }
    new GenericArrayData(out.toArray)
  }

  override protected def nullSafeEval(input: Any): Any =
    encode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("encoder", this,
      classOf[LongestMatchEncode].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.encode($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): LongestMatchEncode = copy(child = newChild)
  override def prettyName: String = "longest_match_encode"
}

object BpeEncode {
  /** Greedy longest-match tokens of a single word column. */
  def longestMatch(word: Column, vocab: Seq[String]): Column =
    GraftColumnBridge.column(LongestMatchEncode(
      GraftColumnBridge.expression(word), vocab))
}
