package graft

import org.apache.spark.sql.DataFrame

/** The ArmScheduler contract: sequential run-and-free scheduling changes
  * WHEN each certification arm's corpus-wide stages execute (and what
  * memory they co-occupy), never WHAT the query returns. Pinned for every
  * certification query that took the knob in round 14 (t92/t108/t150 —
  * t57's twin proof lives in SketchCertifySpec). */
class ArmSchedulerSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  test("t92: sequential arms are row-identical to the concurrent plan") {
    assert(rows(graft.queries.Similarity.t92Build(spark, dir, sequentialArms = true)) ==
      rows(graft.queries.Similarity.t92Build(spark, dir, sequentialArms = false)))
  }

  test("t108: sequential arms are row-identical to the concurrent plan") {
    assert(rows(graft.queries.Similarity.t108Build(spark, dir, sequentialArms = true)) ==
      rows(graft.queries.Similarity.t108Build(spark, dir, sequentialArms = false)))
  }

  test("t150: sequential arms are row-identical to the concurrent plan") {
    assert(rows(graft.queries.Similarity.t150Build(spark, dir, sequentialArms = true)) ==
      rows(graft.queries.Similarity.t150Build(spark, dir, sequentialArms = false)))
  }

  // NOTE: no leaked-block assertion here — suites share one session and
  // run in parallel, so a global getPersistentRDDs snapshot races other
  // suites' legitimate checkpoints; the unpersist discipline itself is
  // exercised by every sequential run above (a leak would accumulate
  // storage and fail the suite-wide memory budget long before close).
}
