package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** GPT-2 byte↔unicode remapping (Radford et al. 2019, the
  * `bytes_to_unicode` table every byte-level BPE tokenizer ships):
  * each of the 256 byte values maps to ONE printable unicode
  * character — the 188 visually safe Latin-1 bytes ([33,126],
  * [161,172], [174,255]) map to themselves, the 68 remaining
  * (controls, space, DEL, NBSP, soft hyphen) map to U+0100.. in
  * increasing byte order. The remapped string is what byte-level
  * merges/vocab entries are written in; because the map is a
  * bijection on bytes, ANY input — any script, broken UTF-8 never
  * arises since we remap the UTF-8 encoding of a valid string —
  * round-trips exactly, so a byte-level tokenizer has no OOV and no
  * fallback alphabet beyond the 256 base bytes.
  *
  * Scan-stage, zero shuffles; codegen via reference call (the
  * NormalizeText precedent).
  */
case class ByteRemapExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got " +
        child.dataType.catalogString)

  override def dataType: DataType = StringType

  /** One string → its byte-remapped form (one output char per UTF-8
    * byte of the input). Public only for the codegen reference call. */
  def remap(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    val out = new Array[Char](bytes.length)
    var i = 0
    while (i < bytes.length) {
      out(i) = ByteRemap.byteToChar(bytes(i) & 0xff)
      i += 1
    }
    UTF8String.fromString(new String(out))
  }

  override protected def nullSafeEval(input: Any): Any =
    remap(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("remapper", this,
      classOf[ByteRemapExpr].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.remap($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): ByteRemapExpr = copy(child = newChild)
  override def prettyName: String = "byte_remap"
}

/** Inverse of [[ByteRemapExpr]]: each display char maps back to its
  * byte; the byte sequence decodes as UTF-8. The detokenizer's last
  * step — concat a doc's byte-level tokens, unremap, and the
  * original text is restored byte-exactly. A char outside the
  * 256-entry table yields null (not-a-remapped-string is data
  * corruption, surfaced rather than guessed around). */
case class ByteUnremapExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got " +
        child.dataType.catalogString)

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  /** Public only for the codegen reference call. */
  def unremap(s: UTF8String): UTF8String = {
    val str = s.toString
    val bytes = new Array[Byte](str.length)
    var i = 0
    while (i < str.length) {
      val b = ByteRemap.charToByte.getOrElse(str.charAt(i), -1)
      if (b < 0) return null
      bytes(i) = b.toByte
      i += 1
    }
    UTF8String.fromBytes(bytes)
  }

  override protected def nullSafeEval(input: Any): Any =
    unremap(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unremapper", this,
      classOf[ByteUnremapExpr].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.unremap($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): ByteUnremapExpr = copy(child = newChild)
  override def prettyName: String = "byte_unremap"
}

object ByteRemap {
  /** byte value → display char, the exact GPT-2 construction: the
    * printable Latin-1 ranges keep their own code point; everything
    * else gets 256+k for k = running count in byte order. */
  val byteToChar: Array[Char] = {
    val printable = (33 to 126) ++ (161 to 172) ++ (174 to 255)
    val isPrintable = printable.toSet
    val arr = new Array[Char](256)
    var n = 0
    var b = 0
    while (b < 256) {
      if (isPrintable(b)) arr(b) = b.toChar
      else { arr(b) = (256 + n).toChar; n += 1 }
      b += 1
    }
    arr
  }

  /** display char → byte value, the exact inverse (the table is a
    * bijection byte → char; every mapped char is a single UTF-16
    * unit, all < U+0400). */
  val charToByte: Map[Char, Int] =
    byteToChar.zipWithIndex.map { case (c, b) => c -> b }.toMap

  /** Driver-side remap of a literal (vocab entries, fixtures) — the
    * same map the expression applies per row, so vocabulary written
    * with this is guaranteed to be in remapped space. */
  def remapString(s: String): String = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = new Array[Char](bytes.length)
    var i = 0
    while (i < bytes.length) {
      out(i) = byteToChar(bytes(i) & 0xff)
      i += 1
    }
    new String(out)
  }

  /** Inverse of [[remapString]]: remapped chars → bytes → string.
    * Throws on a char outside the table (not a remapped string). */
  def unremapString(s: String): String = {
    val bytes = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) {
      bytes(i) = charToByte(s.charAt(i)).toByte
      i += 1
    }
    new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
  }

  def apply(c: Column): Column =
    GraftColumnBridge.column(ByteRemapExpr(GraftColumnBridge.expression(c)))

  def unremapCol(c: Column): Column =
    GraftColumnBridge.column(ByteUnremapExpr(GraftColumnBridge.expression(c)))
}
