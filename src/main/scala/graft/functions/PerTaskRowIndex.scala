package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{LeafExpression, Nondeterministic}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType}

/** 0-based row ordinal WITHIN the current task — the counting half of
  * `monotonically_increasing_id()` (partition-local long counter,
  * codegen'd mutable state, zero shuffle/state) without the global-id
  * half that gets that built-in blocklisted in streaming plans: a
  * micro-batch re-run can renumber rows, which breaks mono_id's
  * unique-ID contract but is immaterial for THIS expression's one
  * consumer, the streaming probe fan-out guard
  * ([[graft.streaming.StreamOps]]) — a threshold check on "how many
  * rows has this task produced" is idempotent under replay (the retry
  * re-derives the same rows and trips, or passes, identically).
  *
  * `stateful = true`: one counter per expression instance per task;
  * Spark fresh-copies stateful nondeterministic expressions wherever
  * an instance would otherwise be shared.
  */
case class PerTaskRowIndex() extends LeafExpression with Nondeterministic {

  override def nullable: Boolean = false

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_per_task_row_index"

  override def stateful: Boolean = true

  @transient private[this] var count: Long = _

  override def initializeInternal(partitionIndex: Int): Unit =
    count = 0L

  override def evalInternal(input: InternalRow): Any = {
    val v = count
    count += 1
    v
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val countTerm =
      ctx.addMutableState(CodeGenerator.JAVA_LONG, "perTaskRowCount")
    ctx.addPartitionInitializationStatement(s"$countTerm = 0L;")
    ev.copy(
      code = code"""
        final long ${ev.value} = $countTerm;
        $countTerm++;""",
      isNull = FalseLiteral)
  }
}
