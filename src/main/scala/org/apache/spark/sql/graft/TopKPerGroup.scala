package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.classic.ColumnNodeToExpressionConverter
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator example of the brief's preference ladder step (c):
  * top-k-per-group as a first-class plan node instead of the
  * window-function idiom (`row_number().over(partitionBy(g).orderBy(o))
  * <= k`), which materializes a full sort of every group. The physical
  * operator keeps a bounded k-element heap per group inside each
  * partition — O(n log k) with O(groups·k) memory, no sort — and runs
  * TWO-PHASE like a hash aggregate: a partial pass heaps within every
  * scan partition (full parallelism even when the group domain is tiny,
  * e.g. 2 query entities over a corpus-sized scored relation), so the
  * group-key shuffle moves only partitions×groups×k survivor rows, and
  * the final pass merges them (top-k of a union ≡ top-k of concatenated
  * per-partition top-ks under a total order).
  *
  * Wire-up: `TopKPerGroup(df, groupCols, orderCols, k)` inserts the
  * logical node directly; `GraftExtensions` also injects the strategy
  * so config-installed sessions plan it.
  *
  * MEMORY CONTRACT: each task holds every group of its partition as a
  * k-element heap — O(groups_in_partition · k) rows, no spill. This is
  * the right operator when the group domain is bounded (per-query
  * top-k, per-label leaders); for unbounded/high-cardinality group
  * keys prefer the window idiom, whose sort spills to disk. The
  * contract is enforced, not assumed: a partition exceeding
  * `spark.graft.topk.maxGroupsPerPartition` (default 8M) groups fails
  * fast with guidance instead of OOMing the executor, and the output
  * phase drains heaps lazily (one group in flight) rather than
  * re-buffering all kept rows.
  */
final case class TopKPerGroupPlan(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupPlan =
    copy(child = newChild)
}

object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupPlan(g, o, k, child) =>
      // Partial (map-side) heaps feed the final merge across the one
      // group-key shuffle — the partial-aggregation shape.
      TopKPerGroupExec(g, o, k,
        TopKPerGroupExec(g, o, k, planLater(child), partial = true)) :: Nil
    case _ => Nil
  }
}

final case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan,
    partial: Boolean = false) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  // Partial phase heaps wherever the rows already are; the final phase
  // shuffles the ≤ partitions×groups×k survivors so every group lands
  // whole in one task.
  override def requiredChildDistribution: Seq[Distribution] =
    (if (partial) UnspecifiedDistribution else ClusteredDistribution(groupExprs)) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val groupE = groupExprs
    val orderE = order
    val limit = k
    val childOutput = child.output
    // Heap state is driver-invisible on-heap memory (not tracked by the
    // task memory manager), so an unbounded group domain would OOM the
    // executor with no useful signal. Cap the per-partition group count
    // and fail with guidance instead — the window idiom spills, this
    // operator deliberately does not.
    val maxGroups = conf.getConfString(
      "spark.graft.topk.maxGroupsPerPartition", (8L * 1024 * 1024).toString).toLong
    child.execute().mapPartitionsInternal { it =>
      val keyProj = UnsafeProjection.create(groupE, childOutput)
      // Identity projection to UnsafeRow — the child is not guaranteed
      // to emit UnsafeRows (a row-based source or a non-codegen operator
      // may hand over GenericInternalRow), so never blind-cast.
      val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
      val ord = GenerateOrdering.generate(orderE, childOutput)
      // max-heap under ord: the root is the WORST of the kept k, popped
      // when a better row arrives.
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
      val revOrd = new java.util.Comparator[UnsafeRow] {
        override def compare(a: UnsafeRow, b: UnsafeRow): Int = -ord.compare(a, b)
      }
      while (it.hasNext) {
        val row = toUnsafe(it.next())
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          if (heaps.size() >= maxGroups) throw new IllegalStateException(
            s"TopKPerGroup: more than $maxGroups distinct groups in one partition " +
              "(no-spill operator, O(groups*k) memory). Use the window idiom " +
              "(row_number over partitionBy) for unbounded group domains, or raise " +
              "spark.graft.topk.maxGroupsPerPartition.")
          heap = new java.util.PriorityQueue[UnsafeRow](limit + 1, revOrd)
          heaps.put(key.copy(), heap)
        }
        if (heap.size() < limit) heap.add(row.copy())
        else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      // Drain lazily, one group at a time — O(k) transient per group
      // instead of re-buffering every kept row into one collection.
      val heapIt = heaps.values().iterator()
      new Iterator[InternalRow] {
        private var current: Array[UnsafeRow] = Array.empty
        private var pos = 0
        private def advance(): Unit =
          while (pos >= current.length && heapIt.hasNext) {
            val heap = heapIt.next()
            val rows = new Array[UnsafeRow](heap.size())
            var i = rows.length - 1
            while (i >= 0) { rows(i) = heap.poll(); i -= 1 } // emit in sort order
            heapIt.remove() // release the drained heap's map entry
            current = rows; pos = 0
          }
        override def hasNext: Boolean = { advance(); pos < current.length }
        override def next(): InternalRow = { advance(); val r = current(pos); pos += 1; r }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

object TopKPerGroup {
  /** Top-k rows per group under the given order (ascending Columns or
    * `col.desc`), emitted in per-group sort order. */
  def apply(df: DataFrame, group: Seq[Column], orderBy: Seq[Column], k: Int): DataFrame = {
    val spark = df.sparkSession
    // Fully convert Column nodes to raw Catalyst expressions — the lazy
    // ColumnNodeExpression wrapper ExpressionUtils returns is not
    // resolved inside a custom logical node.
    def toExpr(c: Column): Expression = ColumnNodeToExpressionConverter(c.node)
    val sortOrders = orderBy.map(c => toExpr(c) match {
      case s: SortOrder => s
      case e => SortOrder(e, org.apache.spark.sql.catalyst.expressions.Ascending)
    })
    val plan = TopKPerGroupPlan(group.map(toExpr), sortOrders, k, df.queryExecution.logical)
    withStrategy(spark)
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
  }

  /** Idempotently add the planning strategy to a session. */
  def withStrategy(spark: SparkSession): Unit = {
    val exp = spark.experimental
    if (!exp.extraStrategies.contains(TopKPerGroupStrategy)) {
      exp.extraStrategies = TopKPerGroupStrategy +: exp.extraStrategies
    }
  }
}
