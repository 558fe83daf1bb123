package graft

import org.apache.spark.sql.functions._

import graft.operators.SaltedJoin

/** SaltedJoin must be row-for-row identical to the plain join it replaces,
  * on skewed data (one hot key carrying most rows), for inner and
  * left_outer, at salt counts that do and don't divide the row count.
  */
class SaltedJoinSpec extends SparkTestBase {

  import spark.implicits._

  // hot key 1 (200 rows), cold keys 2..20 (1 row each), key 99 unmatched
  private lazy val left = (
    (1 to 200).map(i => (1, s"h$i")) ++ (2 to 20).map(k => (k, s"c$k")) :+ (99, "orphan")
  ).toDF("k", "lv")

  private lazy val right = (
    (1 to 20).map(k => (k, k * 10)) :+ (21, 210)
  ).toDF("k", "rv")

  private def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).sorted.toSeq

  test("inner salted join equals plain inner join on skewed keys") {
    for (salts <- Seq(1, 3, 8)) {
      val salted = SaltedJoin.join(left, right, Seq("k"), salts)
      val plain = left.join(right, Seq("k"))
      assert(sortedRows(salted) === sortedRows(plain), s"salts=$salts")
    }
  }

  test("left_outer salted join keeps unmatched left rows exactly once") {
    val salted = SaltedJoin.join(left, right, Seq("k"), 4, "left_outer")
    val plain = left.join(right, Seq("k"), "left_outer")
    assert(sortedRows(salted) === sortedRows(plain))
    assert(salted.where(col("lv") === "orphan").count() === 1)
  }

  test("right/full outer are rejected") {
    intercept[IllegalArgumentException] {
      SaltedJoin.join(left, right, Seq("k"), 4, "full_outer")
    }
  }

  test("salt column does not leak into the output") {
    assert(SaltedJoin.join(left, right, Seq("k"), 4).columns.toSeq === Seq("k", "lv", "rv"))
  }

  test("inputs already carrying the salt column are rejected") {
    val poisoned = left.withColumn("__graft_salt", lit(0))
    intercept[IllegalArgumentException] {
      SaltedJoin.join(poisoned, right, Seq("k"), 4)
    }
  }

  test("salting spreads a hot key across reducers (AQE off, shuffle join pinned)") {
    // the reason the operator exists: a genuinely hot key (50k of 50.8k rows
    // on k=1) lands on ONE reducer in a plain shuffled join; salting splits
    // it `salts` ways. Post-join partition row counts stand in for per-task
    // shuffle read: the shuffled hash join's output partitioning IS the
    // reducer assignment (AQE off so nothing re-coalesces or skew-splits it,
    // both plans pinned to shuffle_hash so neither broadcasts).
    withConf(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.shuffle.partitions" -> "16") {
      val hot = ((1 to 50000).map(i => (1, i.toLong)) ++
        (2 to 9).flatMap(k => (1 to 100).map(i => (k, i.toLong)))).toDF("k", "lv")
      val dim = (1 to 9).map(k => (k, k * 10)).toDF("k", "rv")
      def maxPartRows(df: org.apache.spark.sql.DataFrame): Int =
        df.rdd.mapPartitions(it => Iterator(it.length)).collect().max
      val salts = 8
      val plain = hot.join(dim.hint("shuffle_hash"), Seq("k"))
      val salted = SaltedJoin.join(hot, dim, Seq("k"), salts)
      val mp = maxPartRows(plain)
      val ms = maxPartRows(salted)
      assert(mp >= 50000, s"plain join should funnel the hot key to one reducer, max=$mp")
      assert(ms < mp / 2, s"salting must spread the hot reducer: salted max=$ms vs plain max=$mp")
      // and the spread output is still the same relation
      assert(salted.count() === plain.count())
    }
  }
}
