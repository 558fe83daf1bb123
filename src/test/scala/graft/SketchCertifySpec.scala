package graft

import org.apache.spark.sql.functions._

import graft.operators.SketchCertify

class SketchCertifySpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("sequentialArms changes the schedule, not the output") {
    val li = Tables.lineitem(spark, dir)
    val par = spark.sparkContext.defaultParallelism
    val concurrent = SketchCertify.sketchAccuracy(li, par).collect()
    val sequential = SketchCertify.sketchAccuracy(li, par, sequentialArms = true).collect()
    assert(concurrent.length == 1 && sequential.length == 1)
    assert(concurrent.head == sequential.head,
      s"sequential arms diverged: ${concurrent.head} vs ${sequential.head}")
    // the certification itself must hold on the fixture
    assert(sequential.head.getBoolean(1), "hll_ok false on fixture")
    assert(sequential.head.getBoolean(2), "pct_ok false on fixture")
  }

  test("sequential mode leaves no corpus work or pinned blocks for the cross-join") {
    val li = Tables.lineitem(spark, dir)
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val seqDf = SketchCertify.sketchAccuracy(
      li, spark.sparkContext.defaultParallelism, sequentialArms = true)
    // every corpus scan is gone from the plan: the arms already ran and
    // were rebuilt as local single-row relations
    val plan = seqDf.queryExecution.optimizedPlan.toString
    assert(!plan.contains("parquet") && !plan.contains("Aggregate"),
      s"corpus work survived the arm collect:\n$plan")
    // and the arms' internal checkpoints (the sorted-corpus block set that
    // caused the li100 spill) were freed, not left resident
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"arm blocks leaked: $leaked")
  }

  test("arms certify a corpus where the sketch is actually stressed") {
    import spark.implicits._
    // 50k distinct keys + skewed price column: HLL at 1% rsd and
    // percentile at 10k accuracy must both sit inside the gates
    val df = spark.range(50000).select(
      col("id").as("l_orderkey"),
      (pmod(col("id") * 2654435761L, lit(10000)) + lit(1)).cast("double").as("l_extendedprice"))
    val r = SketchCertify.sketchAccuracy(df, 32, sequentialArms = true).collect().head
    assert(r.getLong(0) == 50000L)
    assert(r.getBoolean(1) && r.getBoolean(2))
  }
}
