package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Unicode NFC normalization (canonical
  * composition) of a string column.
  *
  * Web-crawl text arrives in mixed normalization forms — `é` as one
  * codepoint (U+00E9) or as `e` + combining acute (U+0065 U+0301) —
  * and every downstream exact operator in this engine (md5
  * fingerprint dedup q14/q21, shingle hashing, BPE type tables,
  * equality joins on text keys) treats those as DIFFERENT strings.
  * Normalizing to NFC first is the standard corpus-prep step (the
  * same default utf8proc/ICU pipeline DuckDB's `nfc_normalize`,
  * Python's `unicodedata.normalize('NFC', …)` and HF tokenizers'
  * NFC pre-tokenizer apply), so byte-level operators see one
  * canonical spelling.
  *
  * Why a native expression and not a UDF: normalization sits at the
  * head of every text pipeline — a Scala UDF there would fence the
  * whole downstream projection out of whole-stage codegen and box
  * every row. This expression stays inside the codegen span (one
  * static call on the UTF8String), is NULL-preserving, and row-local
  * (map-only at any scale). The common already-normalized case (all
  * ASCII included) is detected with `Normalizer.isNormalized` — a
  * scan, not a rewrite — and returns the input UTF8String unchanged,
  * zero allocation.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.NfcNormalize.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  val info = new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize")

  /** Called from interpreted eval AND generated code. */
  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
