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
}
