package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Adaptive Query Execution as the runtime complement to the repo's static
  * scale tooling: t62/SaltedJoin handles skew when you KNOW the hot key;
  * AQE handles what you only learn at runtime. Two behaviors matter at
  * 100 TB and are pinned here against regression in session defaults:
  *
  *  1. dynamic join selection — a join planned sort-merge (static stats
  *     too coarse, broadcast disabled) is rewritten to a broadcast join at
  *     runtime once the build side's ACTUAL post-shuffle size is known.
  *     On a 1000-executor cluster this is the difference between shuffling
  *     a 100 TB probe side and not.
  *  2. skew-join splitting — a hot partition detected from runtime map
  *     statistics is split into subpartitions, un-hot-spotting the one
  *     straggler task that would otherwise pace the whole stage.
  */
class AqeSpec extends SparkTestBase {

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // materialize so AQE finalizes the plan
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
  }

  test("AQE rewrites a statically-planned sort-merge join to broadcast at runtime") {
    import spark.implicits._
    val big = spark.range(0, 50000).select(col("id") % 97 as "k", col("id") as "v")
    val small = spark.range(0, 97).select(col("id") as "k", lit("dim") as "tag")
    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      // static planner must NOT broadcast (pretend stats are unknown)…
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      // …but AQE may, once runtime shuffle stats reveal the small side
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "10485760") {
      val joined = big.join(small, Seq("k"))
      val static = joined.queryExecution.sparkPlan.toString
      assert(static.contains("SortMergeJoin"), s"expected static SMJ:\n$static")
      val runtime = finalPlan(joined)
      assert(runtime.contains("BroadcastHashJoin"),
        s"expected AQE broadcast rewrite:\n$runtime")
    }
  }

  test("AQE splits a skewed join partition detected from runtime statistics") {
    import spark.implicits._
    // 90% of the left side lands on one key → one hot shuffle partition
    val skewed = spark.range(0, 200000)
      .select(when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id")).as("k"),
        concat(lit("payload-"), col("id")).as("pad"))
    val right = spark.range(0, 100000).select(col("id") as "k", col("id") as "rv")
    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "100KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "100KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false") {
      val runtime = finalPlan(skewed.join(right, Seq("k")))
      assert(runtime.contains("isSkew=true") || runtime.contains("skew="),
        s"expected a skew-split join in:\n$runtime")
    }
  }
}
