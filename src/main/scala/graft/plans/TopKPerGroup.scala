package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Alias, And, Attribute, AttributeSeq, BindReferences, BoundReference,
  EqualTo, Expression, GreaterThan, GreaterThanOrEqual, IntegerLiteral,
  JoinedRow, LessThan, LessThanOrEqual, NamedExpression, RowNumber,
  SortOrder, UnsafeProjection, UnsafeRow, WindowExpression,
  WindowSpecDefinition}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{
  Filter, LogicalPlan, Window => LogicalWindow}
import org.apache.spark.sql.catalyst.plans.logical
import org.apache.spark.sql.catalyst.plans.physical.{
  AllTuples, ClusteredDistribution, Distribution, Partitioning,
  UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** Native per-group top-k: the whole-operator Catalyst extension
  * (logical node + optimizer rule + strategy + physical operator,
  * registered through [[graft.GraftExtensions]]) for the single most
  * common window pattern in this codebase —
  *
  *   row_number() OVER (PARTITION BY g ORDER BY o)  ...  WHERE rnk <= k
  *
  * (68 occurrences across the registry; `etl.TopK` is the helper form).
  *
  * What Spark does by default: `InferWindowGroupLimit` (3.5+) inserts a
  * rank prefilter, but the surviving rows still flow through
  * SortExec + WindowExec — a full per-partition sort on both sides of
  * the shuffle. This operator REPLACES the sort+window pair with a
  * bounded heap per (group, partition):
  *
  *   - partial stage (map side, before the exchange): each input
  *     partition keeps at most k rows per group in a max-heap keyed by
  *     the sort order — O(n log k) comparisons, no sort, shuffle
  *     volume capped at k·groups·partitions rows;
  *   - final stage (after the group-keyed exchange): same heap per
  *     group, then each ≤k-row group is sorted (k log k) and emitted
  *     with the rank appended — producing EXACTLY the attribute the
  *     window alias bound, so downstream plans are untouched.
  *
  * Semantics contract: identical to row_number+filter whenever the
  * window order is TOTAL within each group — the standing requirement
  * for every oracle-compared query in this repo (SCALE.md "pinned
  * total orders"; `TopK.perGroup` docs). Under ties both formulations
  * are nondeterministic, and neither promises anything.
  *
  * Memory contract: state is ≤ k rows × (groups resident in one task)
  * — the same residency bound as hash aggregation. Like hash agg, the
  * operator degrades rather than OOMs when that bound is exceeded
  * (many small groups in one task): retained bytes are tracked, and
  * past [[TopKPerGroup.fallbackBytes]] the task switches to a
  * sort-based path — retained rows plus the remaining input go through
  * an [[org.apache.spark.sql.execution.UnsafeExternalRowSorter]]
  * (spills to disk) ordered by (group, window order), and the sorted
  * stream is cut at k per group. Identical output (the heap kept a
  * superset of every group's top-k), WindowExec's spill behavior, heap
  * speed in the common case. The rewrite additionally refuses
  * k > 10 000 (`maxK`) and leaves the window plan alone there.
  */
object TopKPerGroup {
  val maxK = 10000

  /** Per-task retained-state budget before the sort-based spill path
    * kicks in. @volatile so tests can force the fallback; executors in
    * local mode share the driver JVM, and on a cluster the default
    * ships with the jar (64 MB — far under any sane executor memory,
    * far over any well-behaved top-k task's state).
    */
  @volatile var fallbackBytes: Long = 64L << 20

  /** Install: optimizer rule + planner strategy. */
  def register(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(RewriteWindowTopK)
    ext.injectPlannerStrategy(_ => TopKPerGroupStrategy)
  }
}

/** Logical: child's rows, at most `limit` per distinct `partitionExprs`
  * value under `order`, plus the 1-based rank as `rankAttr`.
  */
case class TopKPerGroupNode(
    partitionExprs: Seq[Expression],
    order: Seq[SortOrder],
    limit: Int,
    rankAttr: Attribute,
    child: LogicalPlan) extends logical.UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr :: Nil)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupNode =
    copy(child = newChild)
}

/** Rewrite Filter(rnk ≤ k, Window(row_number as rnk)) → TopKPerGroupNode.
  *
  * Conservative by design: fires only on a single-expression Window
  * whose sole member is a row_number alias, with a rank bound that is a
  * positive integer literal ≤ maxK. Residual filter conjuncts that
  * don't touch the rank survive above the new node; any other shape is
  * left for WindowExec.
  */
case class RewriteWindowTopK(spark: SparkSession) extends Rule[LogicalPlan] {

  /** cond → (k, residual) when cond bounds `rnk` from above. */
  private def rankBound(cond: Expression, rnk: Attribute): Option[(Int, Option[Expression])] = {
    def bound(e: Expression): Option[Int] = e match {
      case LessThanOrEqual(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rnk) => Some(k)
      case LessThan(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rnk) => Some(k - 1)
      case GreaterThanOrEqual(IntegerLiteral(k), a: Attribute) if a.semanticEquals(rnk) => Some(k)
      case GreaterThan(IntegerLiteral(k), a: Attribute) if a.semanticEquals(rnk) => Some(k - 1)
      case EqualTo(a: Attribute, IntegerLiteral(1)) if a.semanticEquals(rnk) => Some(1)
      case EqualTo(IntegerLiteral(1), a: Attribute) if a.semanticEquals(rnk) => Some(1)
      case _ => None
    }
    cond match {
      case b if bound(b).isDefined => Some((bound(b).get, None))
      case And(l, r) =>
        (bound(l), bound(r)) match {
          case (Some(k), None) if !r.references.contains(rnk) => Some((k, Some(r)))
          case (None, Some(k)) if !l.references.contains(rnk) => Some((k, Some(l)))
          case _ => None
        }
      case _ => None
    }
  }

  /** Floating-point partition keys are REFUSED: the physical operator
    * groups by UnsafeRow byte equality (heap HashMap, hash exchange,
    * fallback group-change test), while WindowExec's partition keys go
    * through NormalizeFloatingNumbers — 0.0 vs -0.0 (and non-canonical
    * NaN bit patterns) are ONE group there but would be TWO here,
    * silently emitting up to 2k rows with duplicate ranks. Such queries
    * keep their Window plan; every registry use partitions by
    * string/integer keys.
    */
  private def hasFloatKey(exprs: Seq[Expression]): Boolean = {
    def floaty(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case org.apache.spark.sql.types.FloatType |
          org.apache.spark.sql.types.DoubleType => true
      case s: org.apache.spark.sql.types.StructType =>
        s.fields.exists(f => floaty(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => floaty(a.elementType)
      case m: org.apache.spark.sql.types.MapType =>
        floaty(m.keyType) || floaty(m.valueType)
      case _ => false
    }
    exprs.exists(e => floaty(e.dataType))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, w: LogicalWindow)
        if w.windowExpressions.size == 1 =>
      w.windowExpressions.head match {
        case alias @ Alias(WindowExpression(_: RowNumber,
            WindowSpecDefinition(_, order, _)), _) if order.nonEmpty =>
          rankBound(cond, alias.toAttribute) match {
            case Some((k, residual)) if k >= 1 && k <= TopKPerGroup.maxK &&
                !hasFloatKey(w.partitionSpec) =>
              val topk = TopKPerGroupNode(
                w.partitionSpec, w.orderSpec, k, alias.toAttribute, w.child)
              residual.map(Filter(_, topk)).getOrElse(topk)
            case _ => f
          }
        case _ => f
      }
  }
}

object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupNode(part, order, k, rankAttr, child) =>
      val partial = TopKPerGroupExec(part, order, k, None, planLater(child))
      TopKPerGroupExec(part, order, k, Some(rankAttr), partial) :: Nil
    case _ => Nil
  }
}

/** Physical bounded per-group top-k. `rankAttr = None` marks the
  * partial (pre-shuffle) stage: no distribution requirement, no rank
  * output. The final stage requires a group-clustered distribution —
  * EnsureRequirements inserts the one hash exchange — and emits rank.
  */
case class TopKPerGroupExec(
    partitionExprs: Seq[Expression],
    order: Seq[SortOrder],
    limit: Int,
    rankAttr: Option[Attribute],
    child: SparkPlan) extends UnaryExecNode {

  private def partial: Boolean = rankAttr.isEmpty

  override def output: Seq[Attribute] = child.output ++ rankAttr

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr.toSeq)

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else if (partitionExprs.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(partitionExprs) :: Nil

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val partExprs = partitionExprs
    val sortOrder = order
    val k = limit
    val isPartial = partial
    child.execute().mapPartitions({ iter =>
      val groupProj = UnsafeProjection.create(partExprs, childOutput)
      // normalize to UnsafeRow regardless of what the child emits
      val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
      val ordering = GenerateOrdering.generate(
        sortOrder.map(BindReferences.bindReference(_, AttributeSeq(childOutput))))
      // max-heap: head = worst (largest under the sort order) of the
      // kept rows, so a better row evicts it in O(log k)
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
      val revCmp = new java.util.Comparator[UnsafeRow] {
        override def compare(a: UnsafeRow, b: UnsafeRow): Int = ordering.compare(b, a)
      }
      // fallback gate: retained state is bounded per group but not per
      // task (many small groups); past the byte budget, degrade to the
      // spilling sort path instead of OOMing. Requires an orderable
      // group key (always true for this registry's string/numeric keys).
      val budget = TopKPerGroup.fallbackBytes
      val spillable = partExprs.forall(e =>
        org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(e.dataType))
      var retainedBytes = 0L
      var overflow = false
      while (iter.hasNext && !overflow) {
        val row = toUnsafe(iter.next())
        val key = groupProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          // small initial capacity: java.util.PriorityQueue grows on
          // demand, so memory tracks actual occupancy instead of
          // preallocating k+1 slots for every resident group
          heap = new java.util.PriorityQueue[UnsafeRow](math.min(k, 16) + 1, revCmp)
          val keyCopy = key.copy()
          heaps.put(keyCopy, heap)
          retainedBytes += keyCopy.getSizeInBytes
        }
        if (heap.size() < k) {
          heap.add(row.copy()); retainedBytes += row.getSizeInBytes
        } else if (ordering.compare(row, heap.peek()) < 0) {
          retainedBytes -= heap.poll().getSizeInBytes
          heap.add(row.copy()); retainedBytes += row.getSizeInBytes
        }
        if (retainedBytes > budget && spillable) overflow = true
      }
      if (overflow) {
        // ---- sort-based fallback (spills to disk) ----
        // The heaps hold a SUPERSET of every group's top-k among rows
        // seen so far (only k-dominated rows were discarded), so
        // re-sorting retained ∪ remaining by (group, order) and cutting
        // at k per group yields exactly the all-heap answer.
        val fullOrder = partExprs.map(org.apache.spark.sql.catalyst.expressions
            .SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending)) ++
          sortOrder
        val fullOrdering = GenerateOrdering.generate(
          fullOrder.map(BindReferences.bindReference(_, AttributeSeq(childOutput))))
        val prefixComputer = new org.apache.spark.sql.execution
            .UnsafeExternalRowSorter.PrefixComputer {
          private val zero = new org.apache.spark.sql.execution
            .UnsafeExternalRowSorter.PrefixComputer.Prefix
          override def computePrefix(row: InternalRow)
              : org.apache.spark.sql.execution.UnsafeExternalRowSorter.PrefixComputer.Prefix = {
            zero.isNull = false; zero.value = 0L; zero
          }
        }
        val sorter = org.apache.spark.sql.execution.UnsafeExternalRowSorter.create(
          org.apache.spark.sql.catalyst.types.DataTypeUtils.fromAttributes(childOutput),
          fullOrdering,
          org.apache.spark.util.collection.unsafe.sort.PrefixComparators.LONG,
          prefixComputer,
          org.apache.spark.SparkEnv.get.memoryManager.pageSizeBytes,
          false)
        val drained = heaps.values().iterator()
        while (drained.hasNext) {
          val h = drained.next()
          while (!h.isEmpty) sorter.insertRow(h.poll())
        }
        heaps.clear()
        while (iter.hasNext) sorter.insertRow(toUnsafe(iter.next()))
        val sorted = sorter.sort()
        val rankRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
        val joined = new JoinedRow
        val proj = UnsafeProjection.create(
          childOutput.zipWithIndex.map { case (a, i) =>
            BoundReference(i, a.dataType, a.nullable) } :+
            BoundReference(childOutput.size, IntegerType, nullable = false))
        new Iterator[InternalRow] {
          private var curKey: UnsafeRow = null
          private var rank = 0
          private var pending: InternalRow = null
          private def advance(): Unit = {
            while (pending == null && sorted.hasNext) {
              val row = sorted.next()
              val key = groupProj(row)
              if (curKey == null || key != curKey) { curKey = key.copy(); rank = 0 }
              rank += 1
              if (rank <= k) pending = row
            }
            if (pending == null && !sorted.hasNext) sorter.cleanupResources()
          }
          override def hasNext: Boolean = { advance(); pending != null }
          override def next(): InternalRow = {
            advance()
            val row = pending; pending = null
            if (isPartial) row
            else {
              rankRow.setInt(0, rank)
              proj(joined(row, rankRow))
            }
          }
        }
      } else {
      val groups = heaps.values().iterator()
      if (isPartial) {
        new Iterator[InternalRow] {
          private var cur: java.util.Iterator[UnsafeRow] = java.util.Collections.emptyIterator()
          override def hasNext: Boolean = {
            while (!cur.hasNext && groups.hasNext) cur = groups.next().iterator()
            cur.hasNext
          }
          override def next(): InternalRow = cur.next()
        }
      } else {
        // emit each group ascending with rank appended
        val rankRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
        val joined = new JoinedRow
        val proj = UnsafeProjection.create(
          childOutput.zipWithIndex.map { case (a, i) =>
            BoundReference(i, a.dataType, a.nullable) } :+
            BoundReference(childOutput.size, IntegerType, nullable = false))
        new Iterator[InternalRow] {
          private var rows: Array[UnsafeRow] = Array.empty
          private var pos = 0
          override def hasNext: Boolean = {
            while (pos >= rows.length && groups.hasNext) {
              rows = {
                val h = groups.next()
                val a = new Array[UnsafeRow](h.size())
                var i = 0
                while (!h.isEmpty) { a(i) = h.poll(); i += 1 }
                // heap drains worst-first → reverse for ascending rank
                var l = 0; var r = a.length - 1
                while (l < r) { val t = a(l); a(l) = a(r); a(r) = t; l += 1; r -= 1 }
                a
              }
              pos = 0
            }
            pos < rows.length
          }
          override def next(): InternalRow = {
            rankRow.setInt(0, pos + 1)
            val out = proj(joined(rows(pos), rankRow))
            pos += 1
            out
          }
        }
      }
      }
    }, preservesPartitioning = true)
  }
}
