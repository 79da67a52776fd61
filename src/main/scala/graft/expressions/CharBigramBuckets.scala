package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All character-bigram md5 buckets of a string in ONE walk — the
  * feature extractor behind model-based language ID
  * ([[graft.operators.Corpus.langIdModel]]).
  *
  * Element i equals `md5Bucket16(substr(text, i+1, 2)) % nBuckets`
  * exactly (the first four hex chars of md5 are the first two digest
  * BYTES big-endian), which is what the DuckDB oracle replays via
  * substring + strpos — but computed without the per-position
  * `substr` that made the HOF formulation quadratic per document
  * (UTF8String position lookups walk the string from the start, so
  * Σ_i O(i) = O(len²)), without materializing per-bigram strings or
  * 32-char hex strings, and with the MessageDigest instance reused
  * per thread instead of re-created per call (commons-codec).
  *
  * A string with fewer than two characters yields an empty array;
  * null yields null. Scan-stage, zero shuffles; codegen via
  * reference call (the MinHashSig precedent).
  */
case class CharBigramBuckets(child: Expression, nBuckets: Int)
  extends UnaryExpression {

  require(nBuckets > 0 && nBuckets <= 65536,
    "nBuckets must be in 1..65536 (md5Bucket16 range)")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got " +
        child.dataType.catalogString)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  /** UTF-8 lead-byte char length, clamped to the remainder (broken
    * lead bytes advance one — the LongestMatchEncode rule, though a
    * valid UTF8String never hits it). */
  private def charLen(b: Int, remaining: Int): Int = {
    val n =
      if ((b & 0x80) == 0) 1
      else if ((b & 0xe0) == 0xc0) 2
      else if ((b & 0xf0) == 0xe0) 3
      else if ((b & 0xf8) == 0xf0) 4
      else 1
    math.min(n, remaining)
  }

  /** One string → its bigram bucket array. Public only for the
    * codegen reference call. */
  def buckets(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    if (bytes.length < 2) return new GenericArrayData(Array.empty[Long])
    val md = CharBigramBuckets.digest.get()
    // char start offsets: p0 = current char, p1 = next, p2 = one past
    // the bigram — each bigram is bytes[p0, p2)
    var p0 = 0
    var p1 = charLen(bytes(0) & 0xff, bytes.length)
    val out = new scala.collection.mutable.ArrayBuffer[Long](
      math.max(bytes.length - 1, 4))
    while (p1 < bytes.length) {
      val p2 = p1 + charLen(bytes(p1) & 0xff, bytes.length - p1)
      md.reset()
      md.update(bytes, p0, p2 - p0)
      val d = md.digest()
      out += (((d(0) & 0xff) << 8) | (d(1) & 0xff)).toLong % nBuckets
      p0 = p1
      p1 = p2
    }
    new GenericArrayData(out.toArray)
  }

  override protected def nullSafeEval(input: Any): Any =
    buckets(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bigrams", this,
      classOf[CharBigramBuckets].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.buckets($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): CharBigramBuckets = copy(child = newChild)
  override def prettyName: String = "char_bigram_buckets"
}

object CharBigramBuckets {
  /** MessageDigest is stateful and not thread-safe — one per executor
    * thread, reset per call. */
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def apply(c: Column, nBuckets: Int): Column =
    GraftColumnBridge.column(CharBigramBuckets(
      GraftColumnBridge.expression(c), nBuckets))
}
