package graft

import org.apache.spark.sql.functions._

import graft.operators.GapFill

/** graft.operators.GapFill: densification correctness, fill semantics, and
  * the fail-fast span ceiling. */
class GapFillSpec extends SparkTestBase {

  private def sample = {
    import spark.implicits._
    Seq(
      ("a", 10L, 2L, 5.0),
      ("a", 13L, 1L, 1.5),
      ("b", 100L, 4L, 2.0),
      ("b", 101L, 1L, 0.5)
    ).toDF("k", "bucket", "n", "v")
  }

  test("fills every hole in each key's span; observed rows survive unchanged") {
    val out = GapFill.gapFill(sample, Seq("k"), "bucket", Map("n" -> lit(0L)))
      .orderBy("k", "bucket").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("a", 10L), ("a", 11L), ("a", 12L), ("a", 13L), ("b", 100L), ("b", 101L)))
    val byKey = out.map(r => (r.getString(0), r.getLong(1)) -> r).toMap
    assert(byKey(("a", 10L)).getLong(2) == 2L && byKey(("a", 10L)).getDouble(3) == 5.0)
    // gap rows: filled column takes the fill, unlisted column stays null
    assert(byKey(("a", 11L)).getLong(2) == 0L && byKey(("a", 11L)).isNullAt(3))
    // aggregate totals are preserved by densification
    assert(out.map(_.getLong(2)).sum == 8L)
  }

  test("per-key spans are independent: no key sees another key's buckets") {
    val out = GapFill.gapFill(sample, Seq("k"), "bucket", Map.empty)
    assert(out.filter(col("k") === "a").count() == 4)
    assert(out.filter(col("k") === "b").count() == 2)
  }

  test("multi-key grouping densifies per composite key") {
    import spark.implicits._
    val df = Seq(("x", 1, 5L), ("x", 1, 8L), ("x", 2, 5L))
      .toDF("k1", "k2", "bucket").withColumn("n", lit(1L))
    val out = GapFill.gapFill(df, Seq("k1", "k2"), "bucket", Map("n" -> lit(0L)))
    assert(out.count() == 5) // (x,1): 5..8 dense = 4 rows; (x,2): 1 row
  }

  test("span past maxBucketsPerKey fails fast instead of materializing the grid") {
    import spark.implicits._
    val wide = Seq(("a", 0L, 1L), ("a", 1000L, 1L)).toDF("k", "bucket", "n")
    val e = intercept[Exception] {
      GapFill.gapFill(wide, Seq("k"), "bucket", Map.empty, maxBucketsPerKey = 100L)
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("span exceeds")), s"got $e")
  }

  test("unknown fill column is rejected up front") {
    val e = intercept[IllegalArgumentException] {
      GapFill.gapFill(sample, Seq("k"), "bucket", Map("nope" -> lit(0)))
    }
    assert(e.getMessage.contains("nope"))
  }
}
