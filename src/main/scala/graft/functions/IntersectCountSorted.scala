package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** |A ∩ B| of two SORTED-ASCENDING distinct-element arrays as one
  * zero-allocation merge scan — the per-candidate-pair kernel of the
  * dedup verify stage (guide §1.2 "per-task work": the verify join
  * evaluates one intersection per candidate pair, and the pair count is
  * the quadratic-capable term of the whole LSH family).
  *
  * `size(array_intersect(a, b))` computes the same number but pays, per
  * pair, a hash-set build over one side, a probe pass over the other,
  * AND the materialization of the intersection ARRAY that `size` then
  * reads one field from. On sorted inputs the count needs none of that:
  * two cursors, element compares, no allocation, whole-stage codegen.
  * The sort is hoisted to the per-DOCUMENT side of the join
  * ([[graft.etl.Dedup.verifyJaccard]] sorts each shingle set once,
  * before the candidate join fans it out per pair), so the per-pair
  * cost drops from O(n) hashing + alloc to O(n) primitive compares —
  * measured ~1.7× on t08's verify stage, the bench's single most
  * expensive exec (see OPTIMIZATION_r18.md).
  *
  * PRECONDITION (enforced by construction, not checked): both arrays
  * sorted ascending in the element type's canonical order —
  * `sort_array` default — with nulls FIRST, and element sets distinct
  * (the shingle-builder contract). On unsorted input the count is
  * silently wrong; every caller must sort at the source. The count
  * itself is order-insensitive, so sorting upstream changes no declared
  * result (TextDedupSpec pins verifyJaccard's output against the
  * oracle either way).
  *
  * Element semantics mirror `array_intersect`: null elements compare
  * equal to each other (SQL set semantics over arrays, not three-valued
  * comparison), so a null present in both sides counts once.
  *
  * Supported element types: LONG (packed char-3-gram shingles — t08's
  * injective packChar3 longs) and STRING (token shingles — UTF8String
  * binary order, which is exactly `sort_array`'s comparator and
  * DuckDB's collation). Null contract: null if either ARRAY is null.
  */
case class IntersectCountSorted(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<long> or two array<string> " +
          s"inputs, got ${l.sql}, ${r.sql}")
    }

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "graft_intersect_count_sorted"

  private def isLongElem: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var c = 0L
    if (isLongElem) {
      while (i < nx && j < ny) {
        val xn = x.isNullAt(i)
        val yn = y.isNullAt(j)
        if (xn || yn) {
          // nulls sort first; null == null counts once
          if (xn && yn) { c += 1; i += 1; j += 1 }
          else if (xn) i += 1
          else j += 1
        } else {
          val xv = x.getLong(i)
          val yv = y.getLong(j)
          if (xv == yv) { c += 1; i += 1; j += 1 }
          else if (xv < yv) i += 1
          else j += 1
        }
      }
    } else {
      while (i < nx && j < ny) {
        val xn = x.isNullAt(i)
        val yn = y.isNullAt(j)
        if (xn || yn) {
          if (xn && yn) { c += 1; i += 1; j += 1 }
          else if (xn) i += 1
          else j += 1
        } else {
          val cmp = x.getUTF8String(i).binaryCompare(y.getUTF8String(j))
          if (cmp == 0) { c += 1; i += 1; j += 1 }
          else if (cmp < 0) i += 1
          else j += 1
        }
      }
    }
    c
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val c = ctx.freshName("c")
      val xn = ctx.freshName("xn")
      val yn = ctx.freshName("yn")
      val cmpBlock = if (isLongElem) {
        val xv = ctx.freshName("xv")
        val yv = ctx.freshName("yv")
        s"""
           |final long $xv = $a.getLong($i);
           |final long $yv = $b.getLong($j);
           |if ($xv == $yv) { $c++; $i++; $j++; }
           |else if ($xv < $yv) { $i++; } else { $j++; }
         """.stripMargin
      } else {
        val cmp = ctx.freshName("cmp")
        s"""
           |final int $cmp =
           |  $a.getUTF8String($i).binaryCompare($b.getUTF8String($j));
           |if ($cmp == 0) { $c++; $i++; $j++; }
           |else if ($cmp < 0) { $i++; } else { $j++; }
         """.stripMargin
      }
      s"""
         |final int $nx = $a.numElements();
         |final int $ny = $b.numElements();
         |int $i = 0;
         |int $j = 0;
         |long $c = 0L;
         |while ($i < $nx && $j < $ny) {
         |  final boolean $xn = $a.isNullAt($i);
         |  final boolean $yn = $b.isNullAt($j);
         |  if ($xn || $yn) {
         |    if ($xn && $yn) { $c++; $i++; $j++; }
         |    else if ($xn) { $i++; } else { $j++; }
         |  } else {
         |    $cmpBlock
         |  }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntersectCountSorted =
    copy(left = newLeft, right = newRight)
}
