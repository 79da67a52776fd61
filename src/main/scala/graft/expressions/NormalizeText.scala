package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization of a string column — the stage-0 text
  * canonicalization every production corpus pipeline runs before
  * tokenization (SentencePiece normalizes to NFKC by default; CCNet
  * normalizes before LM scoring): composed/decomposed variants of
  * the same text otherwise hash apart through every dedup family and
  * split apart in every vocabulary.
  *
  * Delegates to the JDK's `java.text.Normalizer` (zero new
  * dependencies — the javax.imageio precedent); `form` is one of
  * NFC / NFD / NFKC / NFKD. NFC output is bit-identical to DuckDB's
  * `nfc_normalize` (verified across composed, decomposed,
  * reordered-combining-mark, ligature and fullwidth inputs — both
  * implement UAX #15), which is what lets the driver query
  * hash-check this path end-to-end. Fast path: ASCII bytes are
  * normalization-invariant in every form, so pure-ASCII strings
  * return without materializing a java.lang.String.
  *
  * Scan-stage, zero shuffles; codegen via reference call (the
  * BoundedTopK precedent).
  */
case class NormalizeText(child: Expression, form: String)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got " +
          child.dataType.catalogString)
    else if (!NormalizeText.forms.contains(form))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName form must be one of ${NormalizeText.forms}, got $form")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = StringType

  @transient private lazy val nf = java.text.Normalizer.Form.valueOf(form)

  /** One string → its normalized form. Public only for the codegen
    * reference call. */
  def normalize(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    var i = 0
    var ascii = true
    while (ascii && i < bytes.length) {
      if ((bytes(i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (ascii) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s.toString, nf))
  }

  override protected def nullSafeEval(input: Any): Any =
    normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("normalizer", this,
      classOf[NormalizeText].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.normalize($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): NormalizeText = copy(child = newChild)
  override def prettyName: String = "normalize_text"
}

object NormalizeText {
  val forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")

  def apply(c: Column, form: String): Column =
    GraftColumnBridge.column(NormalizeText(
      GraftColumnBridge.expression(c), form))
}
