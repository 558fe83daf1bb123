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

  test("a NULL grouping key is a real group: observed rows survive, holes fill") {
    import spark.implicits._
    val df = Seq((Some("a"), 1L, 7L), (None, 5L, 9L), (None, 7L, 3L))
      .toDF("k", "bucket", "n")
    val out = GapFill.gapFill(df, Seq("k"), "bucket", Map("n" -> lit(0L)))
      .orderBy(col("k").asc_nulls_first, col("bucket")).collect()
    assert(out.length == 4) // null-key span 5..7 = 3 rows + ("a",1)
    val nullRows = out.filter(_.isNullAt(0)).map(r => (r.getLong(1), r.getLong(2))).toSeq
    // observed values kept (9, 3), hole at 6 filled with 0 — not overwritten
    assert(nullRows == Seq((5L, 9L), (6L, 0L), (7L, 3L)))
  }

  test("an observed row's genuine NULL value is kept, not mistaken for a gap") {
    import spark.implicits._
    val df = Seq((1L, 10L, Some(5L)), (1L, 12L, None)).toDF("k", "bucket", "n")
    val out = GapFill.gapFill(df, Seq("k"), "bucket", Map("n" -> lit(0L)))
      .orderBy("bucket").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(10L, 11L, 12L))
    assert(out(0).getLong(2) == 5L)
    assert(out(1).getLong(2) == 0L) // the real gap takes the fill
    assert(out(2).isNullAt(2), "observed NULL must survive") // bucket 12
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

  test("column names containing dots resolve (backtick-quoted references)") {
    import spark.implicits._
    val df = Seq(("a", 1L, 2L), ("a", 4L, 5L))
      .toDF("the.key", "time.bucket", "the.value")
    val out = GapFill.gapFill(df, Seq("the.key"), "time.bucket",
        Map("the.value" -> lit(0L)))
      .orderBy(col("`time.bucket`")).collect()
    assert(out.map(r => (r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 2L), (2L, 0L), (3L, 0L), (4L, 5L)))
  }

  test("a span wider than one grid chunk densifies exactly (chunked explode)") {
    import spark.implicits._
    // 65536 is the per-row chunk width: 0..80000 spans two chunks; the
    // boundary rows 65535/65536 must appear exactly once each
    val df = Seq(("a", 0L, 1L), ("a", 80000L, 1L)).toDF("k", "bucket", "n")
    val out = GapFill.gapFill(df, Seq("k"), "bucket", Map("n" -> lit(0L)))
    assert(out.count() == 80001L)
    assert(out.select(count_distinct(col("bucket"))).head().getLong(0) == 80001L)
    assert(out.filter(col("bucket").isin(65535L, 65536L)).count() == 2)
    assert(out.select(sum(col("n"))).head().getLong(0) == 2L)
  }

  test("an IntegerType bucket keeps its type and survives int-wrapping spans") {
    import spark.implicits._
    // type preservation: the chunked long arithmetic must not widen the
    // output schema (a union or write-back against the source would break)
    val intDf = Seq(("a", 5, 1L), ("a", 8, 1L)).toDF("k", "bucket", "n")
    val out = GapFill.gapFill(intDf, Seq("k"), "bucket", Map("n" -> lit(0L)))
    assert(out.schema("bucket").dataType == org.apache.spark.sql.types.IntegerType)
    assert(out.orderBy("bucket").collect().map(_.getInt(1)).toSeq == Seq(5, 6, 7, 8))
    // an int span that would wrap Int arithmetic (≈4e9) must hit the
    // ceiling error loudly, not silently truncate the grid
    val wide = Seq(("a", Int.MinValue + 10, 1L), ("a", Int.MaxValue - 10, 1L))
      .toDF("k", "bucket", "n")
    val ex = intercept[Exception](
      GapFill.gapFill(wide, Seq("k"), "bucket", Map.empty).count())
    assert(ex.getMessage != null && ex.getMessage.contains("span exceeds"),
      s"wrapping span must fail the ceiling check, got: $ex")
  }
}
