package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** WordPiece encode of one WORD — the BERT tokenizer's apply kernel
  * (Wu et al. 2016; Devlin et al. 2018), the third member of the
  * production-tokenizer triad next to [[LongestMatchEncode]] (BPE
  * maximal munch) and [[ViterbiSegment]] (Unigram): greedy longest
  * match like BPE, but position-AWARE and total-failure-is-UNK.
  *
  * Two semantics distinguish WordPiece from the BPE kernel:
  *
  *  1. POSITION-SPLIT VOCABULARY. A vocab entry either starts a word
  *     (plain, e.g. "un") or continues one ("##"-prefixed, e.g.
  *     "##ing"); the same surface string can be in-vocab at one
  *     position and OOV at the other. The match at the word start
  *     consults only word-initial entries, every later cursor
  *     position only continuation entries, and continuation pieces
  *     are EMITTED with their "##" marker (the BERT output
  *     convention — detokenization strips it).
  *  2. WHOLE-WORD [UNK]. There is no single-char fallback: a cursor
  *     position where NO vocab entry matches makes the ENTIRE word a
  *     single `unk` token — pieces already matched are discarded.
  *     (BPE instead keeps the char and moves on; WordPiece's
  *     contract is that a word is either fully segmentable or
  *     unknown.) Words longer than `maxWordChars` CODE POINTS are
  *     `unk` without scanning — HuggingFace's
  *     max_input_chars_per_word=100 rule, which bounds the trie work
  *     per pathological row.
  *
  * The vocabulary travels as expression data (the
  * [[LongestMatchEncode]] / IVF-centroid discipline) and compiles
  * once per executor into TWO transient UTF-8 byte tries — one for
  * word-initial entries, one for "##"-stripped continuation bodies.
  * Each row is O(word) trie walks; codegen keeps the loop inside
  * whole-stage codegen via a reference-object call.
  *
  * Vocab entries are whole-character strings, so byte-trie matches
  * always end on UTF-8 character boundaries and the emitted pieces
  * concatenate (markers stripped) back to the word exactly — unless
  * the word went [UNK], which is the one lossy path and the reason
  * BERT-era pipelines pre-filter their alphabet.
  */
case class WordPieceEncode(child: Expression, vocab: Seq[String],
                           unk: String, maxWordChars: Int)
  extends UnaryExpression {

  require(maxWordChars >= 1,
    s"maxWordChars must be >= 1, got $maxWordChars")
  require(unk.nonEmpty, "unk token must be non-empty")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got " +
        child.dataType.catalogString)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  private final class Node {
    val children = new java.util.HashMap[Integer, Node]()
    var terminal = false
  }

  private def insert(root: Node, term: String): Unit = {
    val bytes = term.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var node = root
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

  /** Word-initial trie: entries WITHOUT the ## marker. */
  @transient private lazy val initialRoot: Node = {
    val r = new Node
    vocab.foreach(t => if (!t.startsWith("##")) insert(r, t))
    r
  }

  /** Continuation trie: ##-entries with the marker STRIPPED (the
    * trie matches surface bytes; the marker is output decoration). */
  @transient private lazy val contRoot: Node = {
    val r = new Node
    vocab.foreach(t => if (t.startsWith("##")) insert(r, t.substring(2)))
    r
  }

  @transient private lazy val unkU8 = UTF8String.fromString(unk)
  @transient private lazy val unkArr =
    new GenericArrayData(Array[Any](unkU8))
  @transient private lazy val contMarker = UTF8String.fromString("##")

  /** One word → WordPiece token array, or [unk]. Public only for the
    * codegen reference call. */
  def encode(word: UTF8String): ArrayData = {
    if (word.numChars > maxWordChars) return unkArr
    val bytes = word.getBytes
    if (bytes.length == 0) return new GenericArrayData(Array.empty[Any])
    val out = new scala.collection.mutable.ArrayBuffer[Any](8)
    var p = 0
    while (p < bytes.length) {
      var node = if (p == 0) initialRoot else contRoot
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
      if (best < 0) return unkArr // whole-word failure, by contract
      val piece = UTF8String.fromBytes(bytes, p, best - p)
      out += (if (p == 0) piece else UTF8String.concat(contMarker, piece))
      p = best
    }
    new GenericArrayData(out.toArray)
  }

  override protected def nullSafeEval(input: Any): Any =
    encode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wpEncoder", this,
      classOf[WordPieceEncode].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.encode($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): WordPieceEncode = copy(child = newChild)
  override def prettyName: String = "wordpiece_encode"
}

object WordPieceEncode {
  /** WordPiece tokens of a single word column. */
  def apply(word: Column, vocab: Seq[String], unk: String = "[UNK]",
            maxWordChars: Int = 100): Column =
    GraftColumnBridge.column(new WordPieceEncode(
      GraftColumnBridge.expression(word), vocab, unk, maxWordChars))
}
