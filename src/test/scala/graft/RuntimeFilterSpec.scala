package graft

import org.apache.spark.sql.functions._

/** Runtime Bloom-filter join pruning — the NON-partitioned complement to
  * t80's dynamic partition pruning: when the fact table isn't laid out by
  * the join key, Spark can still build a Bloom filter from the filtered dim
  * side at runtime and push a `might_contain(bloom_filter_agg(...))`
  * predicate into the fact side, skipping most fact rows before the join
  * shuffle.
  *
  * At 100 TB the default thresholds trigger this automatically (creation
  * side < 10 MB, application side > 10 GB); at test scale those thresholds
  * are deliberately lowered to force injection — the assertion is about the
  * PLAN SHAPE the optimizer produces, with result correctness proven
  * against the un-filtered join.
  */
class RuntimeFilterSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("selective dim filter injects a bloom filter into the fact side") {
    val supplier = Tables.supplier(spark, dir)
      .filter(col("s_nationkey") === 3) // selective dim predicate
    val got = withConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      // force a shuffled join: a broadcast dim needs no runtime filter
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val lineitem = Tables.lineitem(spark, dir)
      val joined = lineitem
        .join(supplier, lineitem("l_suppkey") === supplier("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("n"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(
        optimized.contains("might_contain") && optimized.contains("bloom_filter_agg"),
        s"expected a runtime bloom filter on the fact side:\n$optimized")
      joined.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    }

    // the runtime filter must not change the result: recompute with the
    // session back at defaults (test-scale thresholds don't inject) and
    // compare
    val clean = Tables.lineitem(spark, dir)
      .join(supplier, col("l_suppkey") === supplier("s_suppkey"))
      .groupBy(col("s_name")).agg(count(lit(1)).as("n"))
    assert(!clean.queryExecution.optimizedPlan.toString.contains("might_contain"))
    val expected = clean.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == expected && got.nonEmpty)
  }
}
