package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator top-k-per-key: the rows that would survive
  * `row_number() OVER (PARTITION BY keys ORDER BY order) <= k`, computed
  * WITHOUT sorting any key group.
  *
  * Why a custom physical operator instead of the Window formulation: the
  * window plan is Exchange → per-partition FULL SORT → rank → filter. The
  * sort is O(n log n) in the partition and — the real cost at 100 TB —
  * buffers and spills every row of every key group to keep rows it will
  * immediately discard. This operator declares the same
  * ClusteredDistribution(keys) requirement (EnsureRequirements inserts the
  * one hash Exchange) but replaces sort+rank+filter with one streaming
  * pass per partition over bounded per-key heaps: O(n log k) time,
  * O(#keys-in-partition × k) memory, nothing spilled. Ties are broken by
  * the caller's total ordering (make it total — include a unique column —
  * exactly as a deterministic window query would).
  *
  * The operator demonstrates the full Catalyst extension ladder:
  * [[TopKPerKeyNode]] (logical) → [[TopKPerKeyStrategy]] (planning, via
  * `SparkSessionExtensions.injectPlannerStrategy` or the runtime
  * `experimental.extraStrategies` hook) → [[TopKPerKeyExec]] (physical).
  */
case class TopKPerKeyNode(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"topKPerKey needs k > 0, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

class TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  /** Co-locate each key's rows; deliberately NO required ordering — not
    * sorting is the operator's entire reason to exist. */
  override def requiredChildDistribution: Seq[Distribution] =
    if (keys.isEmpty) AllTuples :: Nil else ClusteredDistribution(keys) :: Nil

  /** Rows pass through key-stable, so the child's (hash) partitioning
    * survives — downstream operators on the same keys must not re-shuffle
    * what EnsureRequirements already co-located for us. */
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val orderLocal = order
    val keysLocal = keys
    val attrs = child.output
    // resolved on the DRIVER and captured by the closure: the documented
    // -Dgraft.topk.maxKeysPerPartition remedy must work when set on the
    // driver JVM — executors in a real cluster never see driver sysprops
    val maxKeys =
      java.lang.Long.getLong("graft.topk.maxKeysPerPartition", 4000000L)
    child.execute().mapPartitions { iter =>
      // generated comparator; "smaller" = earlier in the requested order,
      // i.e. would receive a smaller row_number
      val ord = new LazilyGeneratedOrdering(orderLocal, attrs)
      // float/double keys normalize -0.0 → 0.0 before byte-wise grouping:
      // NormalizeFloatingNumbers only rewrites the keys of operators it
      // knows (Aggregate/Window/Join), never a custom node, and UnsafeRow
      // equality is raw bytes — without this a DoubleType key holding both
      // zeros splits one SQL-equal key into two heaps (2k rows emitted)
      val normKeys = keysLocal.map { e =>
        e.dataType match {
          case org.apache.spark.sql.types.FloatType =>
            org.apache.spark.sql.catalyst.expressions.If(
              org.apache.spark.sql.catalyst.expressions.EqualTo(
                e, org.apache.spark.sql.catalyst.expressions.Literal(-0.0f)),
              org.apache.spark.sql.catalyst.expressions.Literal(0.0f), e)
          case org.apache.spark.sql.types.DoubleType =>
            org.apache.spark.sql.catalyst.expressions.If(
              org.apache.spark.sql.catalyst.expressions.EqualTo(
                e, org.apache.spark.sql.catalyst.expressions.Literal(-0.0d)),
              org.apache.spark.sql.catalyst.expressions.Literal(0.0d), e)
          case _ => e
        }
      }
      val keyGen = UnsafeProjection.create(normKeys, attrs)
      // max-heap per key: head = currently-worst kept row, evicted first.
      // Retained memory is #keys-in-partition × k rows and is NOT tracked
      // by TaskMemoryManager (no spill path) — the operator's contract is
      // grouped-top-k with key cardinality ≪ row count. The guard below
      // converts a silent executor OOM under extreme per-partition key
      // cardinality into an actionable error pointing at the Window
      // formulation (which spills) instead.
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        // look up with the REUSED projection output (UnsafeRow hash/equals
        // are byte-based); copy the key only on first insert — copying per
        // row paid an allocation + memcpy per input row just to probe the
        // map on the hot path
        val probe = keyGen(row)
        val heap = heaps.getOrElse(probe, null) match {
          case h if h != null => h
          case _ =>
            if (heaps.size >= maxKeys)
              throw new IllegalStateException(
                s"TopKPerKey: over $maxKeys distinct keys in one partition " +
                  s"(retaining k=$kLocal rows each); this heap operator holds " +
                  "keys×k rows un-spillably — raise -Dgraft.topk.maxKeysPerPartition, " +
                  "repartition finer on the keys, or use the Window row_number " +
                  "formulation, which spills")
            val h = mutable.PriorityQueue.empty[InternalRow](ord)
            heaps.put(probe.copy(), h)
            h
        }
        if (heap.size < kLocal) heap.enqueue(row.copy())
        else if (ord.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row.copy())
        }
      }
      heaps.valuesIterator.flatMap(_.dequeueAll.reverseIterator)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}
