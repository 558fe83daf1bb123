package graft

import scala.util.Random

import org.apache.spark.sql.functions.lit

import graft.operators.AsofJoin

/** Randomized equivalence: AsofJoin vs a driver-side brute-force reference,
  * across backward/forward × inclusive/strict × tolerance, on data with
  * duplicate probe times, sparse keys, and collisions. Seeded, so failures
  * reproduce.
  */
class AsofJoinPropertySpec extends SparkTestBase {

  import spark.implicits._

  private def bruteForce(
      probes: Seq[(Int, Long, Int)], // k, t, id
      builds: Seq[(Int, Long, Double)], // k, t, px
      strict: Boolean,
      forward: Boolean,
      tolerance: Option[Long]): Map[Int, Option[Double]] =
    probes.map { case (k, t, id) =>
      val admissible = builds.filter { case (bk, bt, _) =>
        bk == k && (
          if (forward) { if (strict) bt > t else bt >= t }
          else { if (strict) bt < t else bt <= t }
        ) && tolerance.forall(tol => math.abs(bt - t) <= tol)
      }
      val best =
        if (admissible.isEmpty) None
        else if (forward) Some(admissible.minBy(_._2)._3)
        else Some(admissible.maxBy(_._2)._3)
      id -> best
    }.toMap

  test("asof join matches brute force on random data across all modes") {
    val rnd = new Random(20260813L)
    for (trial <- 1 to 5) {
      val nKeys = 4
      // unique (k, t) build rows — the operator's documented contract
      val builds = rnd.shuffle(
        (for (k <- 0 until nKeys; t <- 0 until 40 if rnd.nextDouble() < 0.3)
          yield (k, t.toLong, (k * 1000 + t).toDouble)).toSeq)
      val probes = (0 until 120).map { i =>
        (rnd.nextInt(nKeys + 1), rnd.nextInt(45).toLong, i) // +1: a key with no builds
      }
      val pdf = probes.toDF("k", "t", "id")
      val bdf = builds.toDF("k", "t", "px")
      for {
        strict <- Seq(false, true)
        forward <- Seq(false, true)
        tol <- Seq(None, Some(5L))
      } {
        val got = AsofJoin
          .asof(pdf, bdf, Seq("k"), "t", "t", strict = strict, forward = forward,
            tolerance = tol.map(v => lit(v)))
          .collect()
          .map(r => r.getAs[Int]("id") -> Option(r.getAs[Any]("px")).map(_.asInstanceOf[Double]))
          .toMap
        val want = bruteForce(probes, builds, strict, forward, tol)
        assert(got === want,
          s"trial=$trial strict=$strict forward=$forward tol=$tol")
      }
    }
  }
}
