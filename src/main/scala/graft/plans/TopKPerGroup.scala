package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator extension tier (custom LogicalPlan + Strategy +
  * SparkPlan): exact top-k rows per group, TWO-PHASE.
  *
  * The idiomatic encoding — `row_number().over(Window.partitionBy(g)
  * .orderBy(o)) <= k` — shuffles EVERY row to its group's partition and
  * sorts the whole partition before discarding all but k. This operator
  * runs a bounded per-group heap BEFORE the exchange (each map partition
  * surrenders at most k rows per group it has seen), shuffles only those
  * survivors, and merges heaps after — the same partial/final shape as
  * aggregation, applied to row selection. At 1000 executors the exchange
  * carries ≤ partitions×groups×k rows instead of the full table, and
  * nothing is ever fully sorted.
  *
  * Memory: per-task state is (groups-resident-in-partition) × k rows —
  * the pre-spill HashAggregate envelope; v1 does not spill (documented).
  * Output order within a group is unspecified, like any aggregate.
  */
object TopKPerGroup extends Serializable {

  /** Logical node: exact top-k rows per `groupExprs` under `sortOrders`
    * (which encode asc/desc and tie-breaks; make them total for
    * deterministic results).
    */
  case class TopKNode(groupExprs: Seq[Expression], sortOrders: Seq[SortOrder],
                      k: Int, child: LogicalPlan) extends UnaryNode {
    require(k >= 1)
    override def output: Seq[Attribute] = child.output
    override def maxRows: Option[Long] = child.maxRows
    override protected def withNewChildInternal(newChild: LogicalPlan): TopKNode =
      copy(child = newChild)
  }

  /** Groups resident per task before the PARTIAL phase flushes its heaps:
    * flushing emits a superset (≤ flushed-segments × k rows per group) and
    * clears state, so partial memory is bounded regardless of key
    * cardinality — the final phase stays exact because it re-selects from
    * all survivors. The FINAL phase must never flush (its output IS the
    * answer); its memory is groups-per-reduce-partition × k, tuned by the
    * shuffle partition count like any hash aggregate.
    */
  private[plans] var partialFlushGroups = 1 << 17 // var: spec shrinks it to force the flush path

  /** Shared heap pass: keep the k smallest rows per group under `ord`.
    * With `maxGroups > 0` the pass runs SEGMENTED: whenever a new group
    * would exceed the bound, the current heaps stream out and state
    * resets — memory stays ≤ maxGroups × k rows while the output remains
    * a valid survivor superset. `maxGroups = 0` disables segmentation
    * (final phase — must hold every resident group to be exact).
    */
  private def topKPartition(iter: Iterator[InternalRow], groupExprs: Seq[Expression],
                            sortOrders: Seq[SortOrder], k: Int,
                            childOutput: Seq[Attribute],
                            maxGroups: Int): Iterator[InternalRow] = {
    val groupProj = UnsafeProjection.create(groupExprs, childOutput)
    // SortOrder already encodes direction: "best" = smallest under ord.
    // PriorityQueue dequeues its MAX, so the head is the worst kept row.
    implicit val ord: Ordering[InternalRow] =
      new LazilyGeneratedOrdering(sortOrders, childOutput)

    new Iterator[InternalRow] {
      private var pending: InternalRow = null // first row of the next segment
      private var cur: Iterator[InternalRow] = Iterator.empty

      private def insert(heaps: mutable.HashMap[UnsafeRow, mutable.PriorityQueue[InternalRow]],
                         row: InternalRow, key: UnsafeRow): Boolean =
        heaps.get(key) match {
          case None =>
            if (maxGroups > 0 && heaps.size >= maxGroups) false
            else {
              val h = mutable.PriorityQueue.empty[InternalRow]
              h.enqueue(row.copy())
              heaps.put(key.copy(), h)
              true
            }
          case Some(h) =>
            if (h.size < k) h.enqueue(row.copy())
            else if (ord.compare(row, h.head) < 0) { h.dequeue(); h.enqueue(row.copy()) }
            true
        }

      private def fill(): Unit = {
        if (pending == null && !iter.hasNext) return
        val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
        if (pending != null) {
          insert(heaps, pending, groupProj(pending).copy()); pending = null
        }
        var segmentFull = false
        while (!segmentFull && iter.hasNext) {
          val row = iter.next()
          if (!insert(heaps, row, groupProj(row))) {
            pending = row.copy() // opens the next segment
            segmentFull = true
          }
        }
        cur = heaps.valuesIterator.flatMap(_.iterator)
      }

      override def hasNext: Boolean = { if (!cur.hasNext) fill(); cur.hasNext }
      override def next(): InternalRow = { if (!hasNext) Iterator.empty.next(); cur.next() }
    }
  }

  /** Map-side phase: per-partition bounded heaps, no distribution demand. */
  case class TopKPartialExec(groupExprs: Seq[Expression], sortOrders: Seq[SortOrder],
                             k: Int, child: SparkPlan) extends UnaryExecNode {
    override def output: Seq[Attribute] = child.output
    override def outputPartitioning: Partitioning = child.outputPartitioning
    override def nodeName: String = "GraftTopKPartial"
    override protected def doExecute(): RDD[InternalRow] = {
      val (g, s, kk, out) = (groupExprs, sortOrders, k, child.output)
      val mg = partialFlushGroups
      child.execute().mapPartitions(it => topKPartition(it, g, s, kk, out, mg))
    }
    override protected def withNewChildInternal(newChild: SparkPlan): TopKPartialExec =
      copy(child = newChild)
  }

  /** Reduce-side phase: demands clustering on the group key (EnsureRequirements
    * inserts the hash exchange over the partial survivors), merges heaps.
    */
  case class TopKFinalExec(groupExprs: Seq[Expression], sortOrders: Seq[SortOrder],
                           k: Int, child: SparkPlan) extends UnaryExecNode {
    override def output: Seq[Attribute] = child.output
    override def outputPartitioning: Partitioning = child.outputPartitioning
    override def nodeName: String = "GraftTopKFinal"
    // global top-k (no groups) must see ALL partial survivors in one
    // place — UnspecifiedDistribution would leave k rows PER PARTITION
    override def requiredChildDistribution: Seq[Distribution] =
      if (groupExprs.isEmpty) Seq(AllTuples)
      else Seq(ClusteredDistribution(groupExprs))
    override protected def doExecute(): RDD[InternalRow] = {
      val (g, s, kk, out) = (groupExprs, sortOrders, k, child.output)
      child.execute().mapPartitions(it => topKPartition(it, g, s, kk, out, maxGroups = 0))
    }
    override protected def withNewChildInternal(newChild: SparkPlan): TopKFinalExec =
      copy(child = newChild)
  }

  /** Planner strategy mapping the logical node to the two-phase pair. */
  object TopKStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case TopKNode(g, s, k, child) =>
        TopKFinalExec(g, s, k, TopKPartialExec(g, s, k, planLater(child))) :: Nil
      case _ => Nil
    }
  }

  /** Install the strategy into a running session (idempotent). New
    * sessions can instead load [[graft.GraftExtensions]].
    */
  def register(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(TopKStrategy))
      spark.experimental.extraStrategies = cur :+ TopKStrategy
  }

  /** DataFrame API: exact top-k rows per group. `orderBy` should totally
    * order rows (add a tie-break key) for deterministic output.
    */
  def topK(df: DataFrame, groupCols: Seq[String], orderBy: Seq[Column], k: Int): DataFrame = {
    val spark = df.sparkSession
    register(spark)
    val analyzed = df.queryExecution.analyzed
    val resolve = analyzed.output.map(a => a.name -> a).toMap
    val g = groupCols.map(c => resolve.getOrElse(c,
      throw new IllegalArgumentException(s"unknown group column $c")))
    val s = orderBy.map(org.apache.spark.sql.graftshim.GraftShim.expression).map {
      case so: SortOrder => so
      case e => SortOrder(e, org.apache.spark.sql.catalyst.expressions.Ascending)
    }
    org.apache.spark.sql.graftshim.GraftShim.ofRows(spark,
      TopKNode(g, s, k, analyzed))
  }
}
