package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Pack the sign pattern of a vector against a bank of hyperplanes into
  * one long: bit j set iff dot(v, planes(j)) > 0.
  *
  * The declarative formulation — 32 `when(graft_dot(v, array(65
  * literals)) > 0, 1L<<j)` terms summed — is semantically identical but
  * inflates the generated code by the full plane matrix (32×65 literal
  * array constructions per projection), which pushes whole-stage codegen
  * into multi-second Janino compiles. Here the plane bank rides along as
  * a REFERENCE OBJECT (one `double[][]` shared by every row and every
  * generated class), the generated code is a two-level primitive loop,
  * and at 100 TB the same object ships once per executor via the task
  * closure — the broadcast-variable seam for a learned projection bank.
  *
  * Dot accumulation order is left-to-right double — identical to
  * [[DotProduct]]/DuckDB `list_dot_product` — so sign decisions (and
  * therefore every packed signature) are bit-exact across engines.
  * Planes whose length differs from the input vector's length make the
  * result null (the [[DotProduct]] length contract); a null or
  * null-element input is null.
  */
case class SignPack(child: Expression, planes: Seq[Seq[Double]])
    extends UnaryExpression {

  require(planes.nonEmpty && planes.size <= 63,
    s"SignPack packs 1..63 bits, got ${planes.size}")

  @transient private lazy val bank: Array[Array[Double]] =
    planes.map(_.toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<double>, got ${t.sql}")
    }

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "graft_sign_pack"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var bits = 0L
    var j = 0
    while (j < bank.length) {
      val p = bank(j)
      if (p.length != n) return null
      var s = 0.0
      var i = 0
      while (i < n) {
        if (v.isNullAt(i)) return null
        s += v.getDouble(i) * p(i)
        i += 1
      }
      if (s > 0.0) bits |= (1L << j)
      j += 1
    }
    bits
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val bankRef = ctx.addReferenceObj("planeBank", bank, "double[][]")
      val n = ctx.freshName("n")
      val bits = ctx.freshName("bits")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val s = ctx.freshName("s")
      s"""
         |final int $n = $v.numElements();
         |long $bits = 0L;
         |for (int $j = 0; $j < $bankRef.length && !${ev.isNull}; $j++) {
         |  final double[] $p = $bankRef[$j];
         |  if ($p.length != $n) { ${ev.isNull} = true; break; }
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($v.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += $v.getDouble($i) * $p[$i];
         |  }
         |  if (!${ev.isNull} && $s > 0.0) $bits |= (1L << $j);
         |}
         |if (!${ev.isNull}) ${ev.value} = $bits;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SignPack =
    copy(child = newChild)
}
