package graft

import org.apache.spark.sql.Row

import graft.operators.AsofJoin

/** Crafted-data semantics for the distributed as-of join: inclusive vs
  * strict tie handling, latest-at-or-before selection, no-match null, and
  * key isolation. (The oracle gate t55_asof_join covers scale + DuckDB ASOF
  * equivalence; this pins the corner cases a degenerate dataset could miss.)
  */
class AsofJoinSpec extends SparkTestBase {

  import spark.implicits._

  private lazy val quotes = Seq(
    // k, t, px
    (1, 3L, 30.0),
    (1, 7L, 70.0),
    (2, 5L, 500.0)
  ).toDF("k", "t", "px")

  private lazy val trades = Seq(
    // k, t, id
    (1, 2L, "a"), // before any quote  -> null
    (1, 3L, "b"), // tie               -> 30 inclusive, null strict
    (1, 5L, "c"), // between           -> 30
    (1, 7L, "d"), // tie               -> 70 inclusive, 30 strict
    (1, 9L, "e"), // after last        -> 70
    (3, 9L, "f")  // key with no quotes -> null
  ).toDF("k", "t", "id")

  private def run(strict: Boolean): Map[String, Option[Double]] =
    AsofJoin.asof(trades, quotes, keys = Seq("k"), probeTime = "t", buildTime = "t", strict = strict)
      .collect()
      .map(r => r.getAs[String]("id") -> Option(r.getAs[Any]("px")).map(_.asInstanceOf[Double]))
      .toMap

  test("inclusive: latest quote at-or-before each trade") {
    assert(run(strict = false) === Map(
      "a" -> None, "b" -> Some(30.0), "c" -> Some(30.0),
      "d" -> Some(70.0), "e" -> Some(70.0), "f" -> None))
  }

  test("strict: equal timestamps do not match") {
    assert(run(strict = true) === Map(
      "a" -> None, "b" -> None, "c" -> Some(30.0),
      "d" -> Some(30.0), "e" -> Some(70.0), "f" -> None))
  }

  test("all probe columns survive and multi-column payload attaches") {
    val build = Seq((1, 3L, 30.0, "mm")).toDF("k", "t", "px", "venue")
    val out = AsofJoin.asof(trades.where($"k" === 1), build, Seq("k"), "t", "t")
    assert(out.columns.toSeq === Seq("k", "t", "id", "px", "venue"))
    val byId = out.collect().map(r => r.getAs[String]("id") -> r).toMap
    assert(byId("e").getAs[String]("venue") === "mm")
    assert(byId("a").isNullAt(byId("a").fieldIndex("venue")))
  }

  private def runFwd(strict: Boolean): Map[String, Option[Double]] =
    AsofJoin.asof(trades, quotes, keys = Seq("k"), probeTime = "t", buildTime = "t",
        strict = strict, forward = true)
      .collect()
      .map(r => r.getAs[String]("id") -> Option(r.getAs[Any]("px")).map(_.asInstanceOf[Double]))
      .toMap

  test("forward inclusive: earliest quote at-or-after each trade") {
    assert(runFwd(strict = false) === Map(
      "a" -> Some(30.0), "b" -> Some(30.0), "c" -> Some(70.0),
      "d" -> Some(70.0), "e" -> None, "f" -> None))
  }

  test("forward strict: equal timestamps do not match") {
    assert(runFwd(strict = true) === Map(
      "a" -> Some(30.0), "b" -> Some(70.0), "c" -> Some(70.0),
      "d" -> None, "e" -> None, "f" -> None))
  }

  test("null build times never match; null probe times match nothing") {
    val quotesWithNull = Seq(
      (1, Option(3L), 30.0),
      (1, Option.empty[Long], 999.0) // must not seed any probe's match
    ).toDF("k", "t", "px")
    val tradesWithNull = Seq(
      (1, Option(2L), "early"), // before the only timed quote -> null
      (1, Option(5L), "after"), // -> 30
      (1, Option.empty[Long], "no_time") // null probe time -> null
    ).toDF("k", "t", "id")
    for (fwd <- Seq(false, true)) {
      val out = AsofJoin.asof(tradesWithNull, quotesWithNull, Seq("k"), "t", "t", forward = fwd)
        .collect().map(r => r.getAs[String]("id") -> Option(r.getAs[Any]("px"))).toMap
      assert(out("no_time") === None, s"forward=$fwd")
      assert(!out.values.flatten.exists(_ == 999.0), s"forward=$fwd null-time quote matched")
    }
    val backward = AsofJoin.asof(tradesWithNull, quotesWithNull, Seq("k"), "t", "t")
      .collect().map(r => r.getAs[String]("id") -> Option(r.getAs[Any]("px"))).toMap
    assert(backward("early") === None && backward("after") === Some(30.0))
  }

  test("payload column colliding with a probe column is rejected") {
    val build = Seq((1, 3L, 30.0, "mm")).toDF("k", "t", "id", "venue") // id collides
    intercept[IllegalArgumentException] {
      AsofJoin.asof(trades, build, Seq("k"), "t", "t")
    }
  }

  test("tolerance discards matches farther than the bound") {
    // backward, tolerance 2: trade e at t=9 matched quote at t=7 (dist 2,
    // kept); trade c at t=5 matched quote at t=3 (dist 2, kept); with
    // tolerance 1 both drop but b (dist 0) survives.
    val tol2 = AsofJoin.asof(trades, quotes, Seq("k"), "t", "t",
      tolerance = Some(org.apache.spark.sql.functions.lit(2L)))
      .collect().map(r => r.getAs[String]("id") -> Option(r.getAs[Any]("px"))).toMap
    assert(tol2("e") === Some(70.0) && tol2("c") === Some(30.0))
    val tol1 = AsofJoin.asof(trades, quotes, Seq("k"), "t", "t",
      tolerance = Some(org.apache.spark.sql.functions.lit(1L)))
      .collect().map(r => r.getAs[String]("id") -> Option(r.getAs[Any]("px"))).toMap
    assert(tol1("e") === None && tol1("c") === None && tol1("b") === Some(30.0))
  }

  test("null join keys never match — equi-join semantics, not null-grouping") {
    // a null-key quote and a null-key trade share a window partition; the
    // join must NOT pair them (SQL equi-joins and DuckDB ASOF never match
    // NULL keys). The null-key trade survives with a null payload.
    val q = Seq((Option(1), 3L, 30.0), (Option.empty[Int], 1L, 999.0))
      .toDF("k", "t", "px")
    val t = Seq((Option(1), 5L, "x"), (Option.empty[Int], 5L, "y"))
      .toDF("k", "t", "id")
    val got = AsofJoin.asof(t, q, Seq("k"), "t", "t")
      .collect().map(r => r.getAs[String]("id") -> Option(r.getAs[Any]("px"))).toMap
    assert(got === Map("x" -> Some(30.0), "y" -> None),
      s"null keys must not cross-match: $got")
  }
}
