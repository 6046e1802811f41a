package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The first 60 bits of md5(input) as a non-negative long — bit-identical
  * to `conv(substr(md5(x), 1, 15), 16, 10)` (the first 15 hex nibbles are
  * the first 60 bits of the digest, big-endian) and to the DuckDB oracle's
  * `CAST('0x'||substr(md5(x),1,15) AS BIGINT)`, but computed straight from
  * the digest bytes: no hex-string render, no substring, no base-16
  * parse. hash60 runs once per shingle in every dedup/fingerprint
  * pipeline (millions of evaluations per query), where the 5-allocation
  * string chain is the dominant cost.
  */
case class Md5Prefix60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.sql}")

  override def dataType: DataType = LongType

  override def nullable: Boolean = child.nullable

  override def prettyName: String = "graft_md5_prefix60"

  override def nullSafeEval(input: Any): Any =
    Md5Prefix60.hash(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Prefix60.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix60 =
    copy(child = newChild)
}

object Md5Prefix60 {

  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5(s), big-endian: first 8 digest bytes as an
    * unsigned big-endian 64-bit value, logically shifted right 4.
    */
  def hash(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }
}
