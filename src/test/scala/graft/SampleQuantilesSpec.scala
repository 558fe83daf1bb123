package graft

import org.apache.spark.sql.functions._

/** The accuracy half of t134 that the (sample-reproducing) oracle cannot
  * certify: the 256-row bottom-k-by-hash sample's quantile estimates must
  * land near the TRUE quantiles of the full column. For a uniform 256-row
  * sample the standard error of an order statistic is
  * sqrt(q(1-q)/256) ≈ 0.03 rank units, so the ±0.1 gate is ~3σ slack
  * without being vacuous. Plus the operational contract: the sample is
  * exactly k rows and rerun-stable (the reason to hash instead of
  * reservoir-sample in the first place).
  */
class SampleQuantilesSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private lazy val est: Seq[(Double, Double, Long)] =
    SparkEntry.queries("t134_sample_quantiles")(spark, sf)
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getLong(2))).toSeq

  test("estimates land within ±0.1 rank error of the true quantiles") {
    val vals = Tables.events(spark, sf)
      .select(round(col("value") * 100).cast("long").as("c"))
      .collect().map(_.getLong(0)).sorted
    assert(vals.length > 256, "fixture too small to distinguish sample from population")
    est.foreach { case (q, e, _) =>
      val cents = math.round(e * 100)
      val rank = vals.count(_ <= cents).toDouble / vals.length
      assert(math.abs(rank - q) <= 0.1, s"q=$q est=$e true-rank=$rank")
    }
  }

  test("the sample is exactly k=256 rows and the estimates are rerun-stable") {
    est.foreach { case (_, _, n) => assert(n === 256L) }
    val again = SparkEntry.queries("t134_sample_quantiles")(spark, sf)
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(again === est)
  }
}
