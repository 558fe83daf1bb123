package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** t80's plan contract: the fact scan must carry a dynamicpruning
  * PartitionFilter (runtime pruning from the dim-side filter), not just a
  * correct result — at 100 TB the pruning IS the point.
  */
class DppSpec extends SparkTestBase {

  test("t80 plants a dynamic partition pruning filter on the fact scan") {
    val q = SparkEntry.registry.find(_.name == "t80_dpp_join").get
    val df = q.build(spark, "/root/testdata/sf0.001")
    val executed = df.queryExecution.executedPlan
    val root = executed match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }
    val scans = root.collect { case s: FileSourceScanExec => s }
    assert(scans.nonEmpty, "expected parquet scans in the plan")
    val dppScans = scans.filter(_.partitionFilters.exists(
      _.toString.toLowerCase.contains("dynamicpruning")))
    assert(
      dppScans.nonEmpty,
      s"no scan carries a dynamicpruning PartitionFilter:\n$root")
    // and the pruning must actually narrow the read: after execution the
    // fact scan reads only the 2 'late' years of the 7 written
    df.collect()
    val years = df.select("cal_year").collect().map(_.getInt(0)).sorted
    assert(years.toSeq == Seq(1997, 1998))
  }
}
