package graft

import org.apache.spark.sql.functions._

import graft.operators.GroupedQuantiles

/** The fully distributed exact grouped-quantile operator behind t41's
  * past-budget route: zero driver state, rank selection via per-partition
  * lookup delivery (zipPartitions), quantile_cont interpolation. Checked
  * against Spark's own exact `percentile` aggregate (which buffers every
  * group value — fine as a test oracle, wrong at scale) on adversarial
  * group-size mixes, including a group count that dwarfs t41's budget
  * shape.
  */
class GroupedQuantilesSpec extends SparkTestBase {

  private def referenceFor(df: org.apache.spark.sql.DataFrame) = df
    .groupBy(col("g"))
    .agg(
      count(lit(1)).as("cnt"),
      expr("percentile(v, 0.5D)").as("p50"),
      expr("percentile(v, 0.9D)").as("p90"),
      min(col("v")).as("lo"),
      max(col("v")).as("hi"))

  private def check(df: org.apache.spark.sql.DataFrame, parts: Int): Unit = {
    val got = GroupedQuantiles.exact(df, "g", "v", Seq(0.5, 0.9), parts)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    val want = referenceFor(df)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (g, (n, p50, p90, lo, hi)) =>
      val (gn, gp50, gp90, glo, ghi) = got(g)
      assert(gn == n, s"cnt for $g")
      // Spark's percentile interpolates lo+(hi-lo)·f; ours (quantile_cont's
      // form) is lo·(1-f)+hi·f — equal in ℝ, last-ulp apart in doubles
      def close(a: Double, b: Double) = math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(b))
      assert(close(gp50, p50), s"p50 for $g: $gp50 vs $p50")
      assert(close(gp90, p90), s"p90 for $g: $gp90 vs $p90")
      assert(glo == lo && ghi == hi, s"extremes for $g")
    }
  }

  test("matches Spark's exact percentile on adversarial group-size mixes") {
    import spark.implicits._
    // deterministic LCG; group sizes 1..~60 including singletons, dup values
    var x = 12345L
    def nxt(): Long = { x = (x * 1103515245L + 12345L) % 2147483647L; x }
    val rows = (0 until 400).flatMap { gi =>
      val size = (nxt() % 60 + 1).toInt
      (0 until size).map { _ => (f"g$gi%04d", (nxt() % 1000).toDouble / 8.0) }
    }
    check(rows.toDF("g", "v"), parts = 16)
  }

  test("group count far past the driver budget shape still answers exactly") {
    import spark.implicits._
    // 20k groups of size 1..3: the regime where t41's driver fold would hold
    // every group on the driver — here nothing ever leaves the executors
    val rows = (0 until 20000).flatMap { gi =>
      (0 to gi % 3).map(j => (f"g$gi%05d", (gi * 7 + j * 13).toDouble))
    }
    val df = rows.toDF("g", "v")
    val got = GroupedQuantiles.exact(df, "g", "v", Seq(0.5, 0.9), parts = 32)
    assert(got.count() == 20000)
    // spot-check a size-3 group exactly: values (g*7, g*7+13, g*7+26)
    val r = got.filter(col("g") === "g00005").collect().head
    assert(r.getLong(1) == 3L)
    assert(r.getDouble(2) == 35.0 + 13.0) // p50 of 3 values = middle
    // pos = 0.9·2 = 1.8 → v_lo·(2−pos) + v_hi·(pos−1), the operator's form
    assert(r.getDouble(3) == 48.0 * (2.0 - 1.8) + 61.0 * (1.8 - 1.0))
    assert(r.getDouble(4) == 35.0 && r.getDouble(5) == 61.0)
  }

  test("single partition and single group degenerate cases") {
    import spark.implicits._
    check(Seq(("only", 1.0)).toDF("g", "v"), parts = 4)
    check(Seq(("a", 2.0), ("a", 1.0), ("a", 3.0), ("b", 5.0)).toDF("g", "v"), parts = 1)
  }
}
