package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression — the
  * canonicalization step text dedup needs BEFORE fingerprinting (the
  * same logical string arrives from different sources as composed
  * U+00E9 or decomposed e + U+0301; byte-level md5 treats them as
  * different documents). Spark has no built-in normalizer; a UDF would
  * break WholeStageCodegen in the hottest path (every document, every
  * ingest), so this is the [[Md5Prefix60]] seam: `doGenCode` emits one
  * static call.
  *
  * Semantics mirror DuckDB's `nfc_normalize(text)` exactly (both defer
  * to the Unicode NFC spec), which is what makes a cross-engine oracle
  * possible. The ASCII/already-normalized fast path returns the input
  * buffer untouched — on a mostly-ASCII crawl the expression costs one
  * `isNormalized` scan and zero allocations per row.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.sql}")

  override def dataType: DataType = StringType

  override def nullable: Boolean = child.nullable

  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {

  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}
