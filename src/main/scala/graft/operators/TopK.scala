package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftPlanBridge}
import org.apache.spark.sql.catalyst.plans.logical.Sort

import graft.plans.{TopKPerKeyNode, TopKPerKeyStrategy}

/** Public API over [[graft.plans.TopKPerKeyNode]]: per-key top-k without
  * sorting key groups (see the plan node's scaladoc for the 100 TB
  * rationale vs the Window row_number formulation).
  *
  * {{{
  * TopK.perKey(customers, Seq("c_nationkey"),
  *   Seq(col("c_acctbal").desc, col("c_custkey")), k = 3)
  * }}}
  *
  * The ordering should be total (include a unique tie-break column) for a
  * deterministic result — the same contract a window query has.
  */
object TopK {

  def perKey(df: DataFrame, keys: Seq[String], order: Seq[Column], k: Int): DataFrame = {
    require(order.nonEmpty, "topKPerKey needs at least one ordering column")
    val spark = df.sparkSession
    // make the strategy available on this live session (idempotent); the
    // builder-time path is GraftExtensions / spark.sql.extensions
    GraftPlanBridge.addStrategy(spark, new TopKPerKeyStrategy)
    // Resolve keys and ordering to catalyst SortOrders by analyzing a
    // throwaway Sort over the same child: Spark 4 Columns carry an internal
    // (non-serializable) AST that only the analyzer lowers to catalyst
    // expressions, so harvesting from an analyzed node is the supported way
    // to get expressions safe to embed in a custom plan.
    val probe = df.sort(keys.map(df(_)) ++ order: _*)
    val (sortOrders, child) = GraftPlanBridge.analyzed(probe) match {
      case s: Sort => (s.order, s.child)
      case other => throw new IllegalStateException(s"expected Sort, got $other")
    }
    // keys/order are split positionally from the probe's SortOrders; if the
    // analyzer ever dedupes or normalizes them (e.g. a key repeated in
    // `order`), fail loudly rather than mis-split into a wrong plan
    require(sortOrders.length == keys.length + order.length,
      s"analyzer changed the probe sort arity: expected ${keys.length} keys + " +
        s"${order.length} order columns, got ${sortOrders.length} SortOrders " +
        "(is a key repeated in the ordering?)")
    val keyExprs = sortOrders.take(keys.length).map(_.child)
    GraftPlanBridge.ofRows(spark,
      TopKPerKeyNode(keyExprs, sortOrders.drop(keys.length), k, child))
  }
}
