package graft.expressions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fast evaluators for the md5-PORTABLE hash family — the family the
  * DuckDB oracle replays as SQL text:
  *
  *   md5intN(c) = conv(substring(md5(c), 1, N), 16, 10)::long
  *
  * i.e. the first N hex nibbles of the md5 digest read as an unsigned
  * base-16 integer — which is exactly the big-endian first 4·N bits
  * of the raw digest. The SQL form allocates a 32-char hex string,
  * substrings it, and PARSES it back per call; inside the minhash
  * signature HOF (`transform(sequence(0, 31), j => array_min(
  * transform(sh, v => md5int15(concat(v, '_', j)))))`) that chain is
  * interpreted per (token × seed) — the dominant scan cost of every
  * md5-family dedup/decontamination query. These expressions compute
  * the same VALUES from the raw digest bytes (no hex, no conv, no
  * concat allocation) in one codegen'd call per row.
  *
  * Oracle compatibility is by construction: the oracle SQL is
  * unchanged (DuckDB still runs the conv/substring form); Spark-side
  * equality is spec-pinned against the HOF form token-for-token.
  */
object Md5Hash {

  private val md = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** Decimal byte renderings of 0..63 — the `_j` seed suffixes. */
  private val seedBytes: Array[Array[Byte]] =
    Array.tabulate(64)(j => ("_" + j).getBytes(StandardCharsets.US_ASCII))

  /** First 4·nibbles bits of md5(bytes), big-endian — equals
    * conv(substring(md5(bytes), 1, nibbles), 16, 10) for
    * 1 <= nibbles <= 15. */
  def prefixLong(bytes: Array[Byte], nibbles: Int): Long = {
    val d = md.get(); d.reset()
    val out = d.digest(bytes)
    var acc = 0L; var i = 0
    while (i < 8) { acc = (acc << 8) | (out(i) & 0xffL); i += 1 }
    acc >>> (64 - 4 * nibbles)
  }

  /** The md5-family minhash signature of a pre-hashed shingle set:
    * sig(j) = min over v in sh of md5int15(v + "_" + j). One digest
    * instance per thread, one decimal rendering per v (not per
    * (v, j)), no string concat — the digest input is streamed as
    * update() calls. */
  def minSig(arr: ArrayData, numHashes: Int): UnsafeArrayData = {
    val d = md.get()
    val n = arr.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val vb = java.lang.Long.toString(arr.getLong(i))
        .getBytes(StandardCharsets.US_ASCII)
      var j = 0
      while (j < numHashes) {
        d.reset()
        d.update(vb)
        d.update(seedBytes(j))
        val out = d.digest()
        var acc = 0L; var b = 0
        while (b < 8) { acc = (acc << 8) | (out(b) & 0xffL); b += 1 }
        val h = acc >>> 4
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }
}

/** `conv(substring(md5(child), 1, nibbles), 16, 10)::long` as one
  * codegen'd call over the raw digest (string child → UTF-8 bytes,
  * identical to Spark's md5-of-string cast). */
case class Md5PrefixLong(child: Expression, nibbles: Int)
  extends UnaryExpression {

  require(nibbles >= 1 && nibbles <= 15,
    s"nibbles must be in [1, 15] to fit a long exactly, got $nibbles")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    Md5Hash.prefixLong(input.asInstanceOf[UTF8String].getBytes, nibbles)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.expressions.Md5Hash.prefixLong(" +
        s"$s.getBytes(), $nibbles);")

  override protected def withNewChildInternal(newChild: Expression): Md5PrefixLong =
    copy(child = newChild)
  override def prettyName: String = "md5_prefix_long"
}

/** The md5-family minhash signature (see [[Md5Hash.minSig]]) —
  * value-identical to
  * `transform(sequence(0, numHashes-1), j => array_min(transform(sh,
  * v => md5int15(concat(v, '_', j)))))` on a NON-EMPTY sh (every
  * call site filters `size(sh) > 0` first; an empty sh yields null
  * here, where the HOF form yields an array of nulls). */
case class Md5MinHashSig(child: Expression, numHashes: Int)
  extends UnaryExpression {

  require(numHashes >= 1 && numHashes <= 64,
    s"numHashes must be in [1, 64], got $numHashes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (arr.numElements() == 0) null
    else Md5Hash.minSig(arr, numHashes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"""
         |if ($arr.numElements() == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.expressions.Md5Hash.minSig($arr, $numHashes);
         |}
       """.stripMargin)

  override def nullable: Boolean = true

  override protected def withNewChildInternal(newChild: Expression): Md5MinHashSig =
    copy(child = newChild)
  override def prettyName: String = "md5_minhash_signature"
}

object Md5MinHashSig {
  /** Column API: md5-family minhash signature of a pre-hashed
    * (array<bigint>) shingle set. */
  def of(shingleHashes: Column, numHashes: Int): Column =
    GraftColumnBridge.column(Md5MinHashSig(
      GraftColumnBridge.expression(shingleHashes), numHashes))

  /** Column API: md5intN — the first `nibbles` md5 hex nibbles of a
    * string as a long. */
  def prefix(c: Column, nibbles: Int): Column =
    GraftColumnBridge.column(Md5PrefixLong(
      GraftColumnBridge.expression(c), nibbles))
}
