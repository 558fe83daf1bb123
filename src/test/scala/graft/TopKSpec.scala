package graft

import scala.util.Random

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.TopK

/** plans.TopKPerKey: window-equivalence (randomized), plan shape (no sort,
  * no window, one clustered exchange), and edge cases. */
class TopKSpec extends SparkTestBase {

  private def windowTopK(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy(col("k")).orderBy(col("v").desc, col("id"))
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k).drop("rn")
  }

  test("matches window row_number top-k on randomized skewed data") {
    import spark.implicits._
    val rnd = new Random(42)
    // skewed keys (half the rows on key 0), duplicate values to stress ties
    val rows = (0 until 5000).map { i =>
      val key = if (rnd.nextBoolean()) 0L else rnd.nextInt(50).toLong
      (key, rnd.nextInt(40).toLong, i.toLong)
    }
    val df = rows.toDF("k", "v", "id").repartition(7)
    for (k <- Seq(1, 3, 16)) {
      val got = TopK.perKey(df, Seq("k"), Seq(col("v").desc, col("id")), k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = windowTopK(df, k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == want, s"k=$k: ${got.diff(want)} extra, ${want.diff(got)} missing")
    }
  }

  test("keys with fewer than k rows keep all their rows") {
    import spark.implicits._
    val df = Seq((1L, 10L, 1L), (1L, 20L, 2L), (2L, 5L, 3L)).toDF("k", "v", "id")
    val got = TopK.perKey(df, Seq("k"), Seq(col("v").desc, col("id")), 5).count()
    assert(got == 3)
  }

  test("plan: TopKPerKey exec, clustered exchange, and NO sort or window") {
    import spark.implicits._
    val df = spark.range(0, 1000)
      .select((col("id") % 13).as("k"), col("id").as("v"), col("id").as("id2"))
    val topk = TopK.perKey(df, Seq("k"), Seq(col("v").desc, col("id2")), 2)
    topk.collect()
    val plan = topk.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
    assert(plan.contains("TopKPerKey"), s"custom exec missing:\n$plan")
    assert(plan.contains("Exchange hashpartitioning"), s"clustered exchange missing:\n$plan")
    assert(!plan.contains("Window"), s"window must not appear:\n$plan")
    assert(!plan.contains("Sort "), s"sort must not appear:\n$plan")
  }

  test("registers through GraftExtensions for SQL-configured sessions") {
    // builder-path coverage: the strategy builder must at least construct
    val ext = new GraftExtensions
    val se = new org.apache.spark.sql.SparkSessionExtensions
    ext(se) // throws if any injection is malformed
  }

  test("-0.0 and 0.0 double keys group as ONE key, like the window formulation") {
    // UnsafeRow grouping is byte-wise and NormalizeFloatingNumbers never
    // rewrites a custom node's keys; without the exec's own normalization
    // the SQL-equal zeros split into two heaps and emit up to 2k rows
    import spark.implicits._
    val df = Seq((0.0, 1L), (-0.0, 2L), (0.0, 3L), (-0.0, 4L)).toDF("key", "v")
    val got = TopK.perKey(df, Seq("key"), Seq(col("v")), 2)
      .select("v").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L), s"one merged zero-key must keep exactly k=2 rows: $got")
  }

  test("k must be positive and ordering non-empty") {
    import spark.implicits._
    val df = Seq((1L, 1L)).toDF("k", "v")
    intercept[IllegalArgumentException] {
      TopK.perKey(df, Seq("k"), Seq(col("v")), 0).collect()
    }
    intercept[IllegalArgumentException] {
      TopK.perKey(df, Seq("k"), Seq.empty, 3).collect()
    }
  }
}
