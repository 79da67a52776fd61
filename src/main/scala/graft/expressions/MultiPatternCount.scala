package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-pattern SUBSTRING counting — the content-filter
  * kernel (the C4/RefinedWeb badwords scan, PII keyword sweeps,
  * license-header detection): ONE pass over the text counts every
  * occurrence of every pattern, whatever the pattern count. The
  * naive form is |patterns| regex/contains passes — a 10k-entry
  * blocklist makes the scan 10k× wider; the automaton makes pattern
  * count free at match time (the whole reason AC exists).
  *
  * Patterns travel as expression data (the trie-kernel discipline:
  * LongestMatchEncode, WordPieceEncode) and compile once per executor
  * into the automaton: a byte trie + BFS failure links + dictionary
  * suffix links. Matching is over UTF-8 BYTES — UTF-8 is
  * self-synchronizing, so a valid pattern byte string only ever
  * matches at character boundaries; substring semantics means
  * matches may overlap and cross token boundaries (catches spaced
  * phrases and concatenation obfuscation a per-token filter misses).
  * Every (end position, pattern) pair counts once — "aa" occurs
  * twice in "aaa".
  *
  * Output: struct(n_hits BIGINT — total occurrences,
  * n_patterns INT — distinct patterns that hit at least once).
  * At most 64 patterns per instance (the distinct set rides a long
  * bitmask; compose instances for larger lists, or partition the
  * blocklist). Codegen keeps the scan inside whole-stage codegen via
  * a reference-object call.
  */
case class MultiPatternCount(child: Expression, patterns: Seq[String])
  extends UnaryExpression {

  require(patterns.nonEmpty, "pattern list must be non-empty")
  require(patterns.size <= 64,
    s"at most 64 patterns per instance (got ${patterns.size}); " +
      "compose instances for larger blocklists")
  require(patterns.forall(_.nonEmpty), "empty pattern is not allowed")
  require(patterns.distinct.size == patterns.size,
    "duplicate patterns would double-count")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got " +
        child.dataType.catalogString)

  override def dataType: DataType = StructType(Seq(
    StructField("n_hits", LongType, nullable = false),
    StructField("n_patterns", IntegerType, nullable = false)))

  // --- automaton, rebuilt lazily per deserialized instance ---
  // nodes in flat arrays: children as per-node HashMap (byte ->
  // node), fail link, and the pattern-id list ending at the node
  // (own terminal + dictionary-suffix chain, precollapsed at build)
  private final class Node {
    val children = new java.util.HashMap[Integer, Node]()
    var fail: Node = _
    var out: Array[Int] = Array.emptyIntArray
  }

  @transient private lazy val root: Node = {
    val r = new Node
    patterns.zipWithIndex.foreach { case (p, id) =>
      val bytes = p.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var n = r
      var i = 0
      while (i < bytes.length) {
        val k = Integer.valueOf(bytes(i) & 0xff)
        var next = n.children.get(k)
        if (next == null) { next = new Node; n.children.put(k, next) }
        n = next
        i += 1
      }
      n.out = n.out :+ id
    }
    // BFS failure links; collapse dictionary-suffix outputs into out
    val q = new java.util.ArrayDeque[Node]()
    r.fail = r
    val it0 = r.children.values().iterator()
    while (it0.hasNext) { val c = it0.next(); c.fail = r; q.add(c) }
    while (!q.isEmpty) {
      val n = q.poll()
      val it = n.children.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val (k, c) = (e.getKey, e.getValue)
        var f = n.fail
        while (f.children.get(k) == null && (f ne r)) f = f.fail
        val fc = f.children.get(k)
        c.fail = if (fc != null && (fc ne c)) fc else r
        if (c.fail.out.nonEmpty) c.out = c.out ++ c.fail.out
        q.add(c)
      }
    }
    r
  }

  /** One text → (total hits, distinct-pattern bitmask popcount).
    * Public only for the codegen reference call. */
  def count(text: UTF8String): InternalRow = {
    val bytes = text.getBytes
    var node = root
    var hits = 0L
    var mask = 0L
    var i = 0
    while (i < bytes.length) {
      val k = Integer.valueOf(bytes(i) & 0xff)
      while (node.children.get(k) == null && (node ne root))
        node = node.fail
      val next = node.children.get(k)
      if (next != null) node = next
      val out = node.out
      var j = 0
      while (j < out.length) {
        hits += 1L
        mask |= 1L << out(j)
        j += 1
      }
      i += 1
    }
    InternalRow(hits, java.lang.Long.bitCount(mask))
  }

  override protected def nullSafeEval(input: Any): Any =
    count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("acMatcher", this,
      classOf[MultiPatternCount].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.count($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): MultiPatternCount = copy(child = newChild)
  override def prettyName: String = "multi_pattern_count"
}

object MultiPatternCount {
  /** struct(n_hits, n_patterns) of one text column against a fixed
    * pattern list. */
  def apply(text: Column, patterns: Seq[String]): Column =
    GraftColumnBridge.column(new MultiPatternCount(
      GraftColumnBridge.expression(text), patterns))
}
