package graft

import org.apache.spark.sql.functions._

/** Fast regression net over the whole registry at sf0.001: every query must
  * build, execute, and produce a schema with at least one row-producing plan.
  * (Exact value correctness is the DuckDB oracle gate; this catches plan
  * regressions — unresolved columns, analysis errors, runtime exceptions —
  * in seconds per query instead of a full Verify round.)
  */
class QueriesSmokeSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  // q08/q24 legitimately return 0 rows at sf0.001 (every customer has
  // orders; no exact-dup docs at this scale)
  private val mayBeEmpty = Set("q08_anti_join", "q24_exact_dedup")

  SparkEntry.registry.foreach { q =>
    test(s"${q.name} executes at sf0.001") {
      val df = q.build(spark, dir)
      assert(df.schema.nonEmpty)
      val n = df.count()
      if (!mayBeEmpty(q.name)) assert(n > 0, s"${q.name} returned no rows")
    }
  }

  test("entry() smoke: flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has either an oracle or a documented reason") {
    val withoutOracle = SparkEntry.registry.filter(_.oracle.isEmpty).map(_.name)
    assert(withoutOracle.isEmpty, s"queries missing oracle SQL: $withoutOracle")
  }

  test("approx_count_distinct within 5% of exact (SURVEY Q12 tolerance check)") {
    val o = Tables.orders(spark, dir)
    val exact = o.agg(countDistinct(col("o_custkey"))).head().getLong(0)
    val approx = o.agg(approx_count_distinct(col("o_custkey"))).head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }
}
