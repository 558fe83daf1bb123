package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.operators.SetSimJoin

/** PPJoin prefix-filtering set-similarity join: the completeness guarantee
  * (no qualifying pair can be missed) randomized-tested against brute
  * force, plus threshold-boundary exactness and plan hygiene.
  */
class SetSimJoinSpec extends SparkTestBase {

  import spark.implicits._

  private def bruteJaccard(sets: Map[Long, Set[Long]], tauPct: Int): Set[(Long, Long)] = {
    val ids = sets.keys.toSeq.sorted
    (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      a = sets(ids(i)); b = sets(ids(j))
      inter = a.intersect(b).size.toLong
      union = a.size.toLong + b.size.toLong - inter
      if union > 0 && inter * 100 >= tauPct * union
    } yield (ids(i), ids(j))).toSet
  }

  private def run(sets: Map[Long, Set[Long]], tauPct: Int): Set[(Long, Long)] = {
    val df = sets.toSeq
      .map { case (id, s) => (id, s.toSeq.sorted.toArray) }
      .toDF("id", "t")
    SetSimJoin.join(df, "id", "t", tauPct)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("completeness: randomized equivalence with brute-force all-pairs") {
    val rnd = new Random(2024)
    (1 to 15).foreach { round =>
      // small universe forces heavy overlap; duplicated base sets force
      // exact and near matches at every size relation
      val universe = (1L to 30L).toVector
      val base = Vector.fill(6)(universe.filter(_ => rnd.nextBoolean()).toSet)
      val sets = (0 until 24).map { i =>
        val b = base(rnd.nextInt(base.length))
        val mutated = b ++ Seq.fill(rnd.nextInt(3))(universe(rnd.nextInt(30))) --
          Seq.fill(rnd.nextInt(3))(universe(rnd.nextInt(30)))
        i.toLong -> (if (mutated.isEmpty) Set(universe(rnd.nextInt(30))) else mutated)
      }.toMap
      (Seq(50, 80, 90)).foreach { tau =>
        assert(run(sets, tau) == bruteJaccard(sets, tau),
          s"round $round tau $tau")
      }
    }
  }

  test("threshold boundary is exact: jac == tau passes, one token less fails") {
    // |A|=4, |B|=4, inter=4 ⇒ jac=1; inter 8/10 = 0.8 exactly: A={1..9}\{9}? build:
    // A = {1,2,3,4,5,6,7,8}, B = {1,...,8,9,10} ⇒ inter=8, union=10, jac=0.8
    val a = (1L to 8L).toSet
    val b = (1L to 10L).toSet
    val pass = run(Map(1L -> a, 2L -> b), 80)
    assert(pass == Set((1L, 2L)), "jac == τ exactly must pass")
    val fail = run(Map(1L -> a, 2L -> (b + 11L)), 80) // union 11, jac 8/11 < 0.8
    assert(fail.isEmpty, "jac just under τ must fail")
  }

  test("identical sets and id ordering") {
    val s = Set(1L, 2L, 3L)
    val got = SetSimJoin.join(
      Seq((7L, s.toSeq.sorted.toArray), (3L, s.toSeq.sorted.toArray)).toDF("id", "t"),
      "id", "t", 80)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((3L, 7L, 1.0)), "pairs must be (smaller id, larger id)")
  }

  test("candidate joins carry no broadcast hint (AQE owns the choice)") {
    val df = Seq((1L, Array(1L, 2L)), (2L, Array(1L, 2L, 3L))).toDF("id", "t")
    val plan = SetSimJoin.join(df, "id", "t", 80)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("ResolvedHint"), s"unexpected join hint:\n$plan")
  }
}
