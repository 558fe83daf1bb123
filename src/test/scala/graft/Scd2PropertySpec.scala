package graft

import scala.util.Random

import graft.operators.Scd2

/** Randomized equivalence: Scd2.history vs a driver-side reference fold,
  * on keyed attribute streams with null attributes, repeated values, and
  * tie-broken equal timestamps. Seeded, so failures reproduce.
  */
class Scd2PropertySpec extends SparkTestBase {

  import spark.implicits._

  private final case class Row(k: Int, a: Option[String], t: Long, tb: Long)
  private final case class Ver(k: Int, ver: Long, a: Option[String],
      from: Long, to: Option[Long], current: Boolean, n: Long)

  /** Plain sequential fold: sort each key's rows, open a version on every
    * attribute change (null-safe), close it at the next change's time. */
  private def reference(rows: Seq[Row]): Set[Ver] =
    rows.groupBy(_.k).flatMap { case (k, rs) =>
      val sorted = rs.sortBy(r => (r.t, r.tb))
      val runs = scala.collection.mutable.ArrayBuffer.empty[(Option[String], Long, Long)]
      sorted.foreach { r =>
        if (runs.nonEmpty && runs.last._1 == r.a) {
          val (a, from, n) = runs.remove(runs.length - 1)
          runs += ((a, from, n + 1))
        } else runs += ((r.a, r.t, 1L))
      }
      runs.zipWithIndex.map { case ((a, from, n), i) =>
        val to = if (i + 1 < runs.length) Some(runs(i + 1)._2) else None
        Ver(k, i + 1L, a, from, to, to.isEmpty, n)
      }
    }.toSet

  test("an attr column named like a history output column is rejected, not shadowed") {
    // "ver"/"valid_from"/... as the tracked attribute would re-emit under
    // its own name NEXT TO the history column of the same name — two
    // identically-named output columns. The guard must catch attr too,
    // not just keys/tieBreak.
    import spark.implicits._
    val df = Seq((1L, "a", 10L)).toDF("k", "ver", "t")
    val e = intercept[IllegalArgumentException] {
      Scd2.history(df, Seq("k"), "ver", "t")
    }
    assert(e.getMessage.contains("ver"))
    // attr == key collides the same way: keys keep their names in the
    // output and attr re-emits under its own
    val e2 = intercept[IllegalArgumentException] {
      Scd2.history(Seq((1L, 10L)).toDF("k", "t"), Seq("k"), "k", "t")
    }
    assert(e2.getMessage.contains("k"))
  }

  test("Scd2.history matches the sequential reference on random keyed streams") {
    val rnd = new Random(20260814L)
    for (trial <- 1 to 5) {
      val attrs = Vector(Some("a"), Some("b"), Some("c"), None)
      val rows = (0 until 200).map { i =>
        Row(rnd.nextInt(6), attrs(rnd.nextInt(attrs.length)),
          rnd.nextInt(40).toLong, i.toLong) // repeated times; tb makes order total
      }
      val df = rows.map(r => (r.k, r.a.orNull, r.t, r.tb)).toDF("k", "a", "t", "tb")
      val got = Scd2.history(df, Seq("k"), "a", "t", tieBreak = Seq("tb"))
        .collect().map(r => Ver(
          r.getInt(0), r.getLong(1), Option(r.getString(2)),
          r.getLong(3), if (r.isNullAt(4)) None else Some(r.getLong(4)),
          r.getBoolean(5), r.getLong(6))).toSet
      val want = reference(rows)
      assert(got == want,
        s"trial $trial diverged: extra=${(got -- want).take(3)} missing=${(want -- got).take(3)}")
    }
  }
}
