package graft

import org.apache.spark.sql.functions._

import graft.functions.ArrayFns

class SortedIntersectCountSpec extends SparkTestBase {

  private def run(a: Seq[Long], b: Seq[Long]): Int = {
    import spark.implicits._
    Seq((a, b)).toDF("a", "b")
      .select(ArrayFns.sortedIntersectCount(col("a"), col("b")).as("c"))
      .head().getInt(0)
  }

  test("two-pointer intersect count on sorted distinct arrays") {
    assert(run(Seq(1L, 3L, 5L), Seq(2L, 3L, 5L, 9L)) == 2)
    assert(run(Nil, Seq(1L)) == 0)
    assert(run(Seq(1L), Nil) == 0)
    assert(run(Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)) == 3)
    assert(run(Seq(-5L, 0L, 7L), Seq(-5L, 7L)) == 2)
  }

  test("matches size(array_intersect) on random sorted sets (codegen path)") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val rows = (1 to 2000).map { _ =>
      def set() = rnd.shuffle((0L to 60L).toList).take(rnd.nextInt(30)).sorted.distinct
      (set(), set())
    }
    val df = rows.toDF("a", "b")
    val diff = df.select(
      ArrayFns.sortedIntersectCount(col("a"), col("b")).as("fast"),
      size(array_intersect(col("a"), col("b"))).as("ref"))
      .filter(col("fast") =!= col("ref"))
      .count()
    assert(diff == 0)
  }

  test("null input yields null (nullIntolerant)") {
    import spark.implicits._
    val df = Seq((Some(Seq(1L, 2L)), Option.empty[Seq[Long]])).toDF("a", "b")
    val r = df.select(ArrayFns.sortedIntersectCount(col("a"), col("b")).as("c")).head()
    assert(r.isNullAt(0))
  }
}
