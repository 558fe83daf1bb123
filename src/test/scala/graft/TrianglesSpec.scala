package graft

import scala.util.Random

import graft.operators.Triangles

/** Degree-ordered triangle counting: closed-form fixtures (cliques,
  * chains) plus randomized equivalence against a brute-force enumeration,
  * including duplicate/reversed/self-loop edge folding.
  */
class TrianglesSpec extends SparkTestBase {

  import spark.implicits._

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Triangles.perNode(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def brute(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val es = edges.collect { case (a, b) if a != b =>
      (math.min(a, b), math.max(a, b))
    }.toSet
    val nodes = es.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val counts = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for {
      i <- nodes.indices; j <- (i + 1) until nodes.length; k <- (j + 1) until nodes.length
      x = nodes(i); y = nodes(j); z = nodes(k)
      if es((x, y)) && es((y, z)) && es((x, z))
    } {
      counts(x) += 1; counts(y) += 1; counts(z) += 1
    }
    counts.toMap
  }

  test("K5 clique: every node sits in C(4,2)=6 triangles") {
    val k5 = for (a <- 1L to 5L; b <- (a + 1) to 5L) yield (a, b)
    assert(run(k5) == (1L to 5L).map(_ -> 6L).toMap)
  }

  test("a chain has no triangles (the near-dup false-merge shape)") {
    assert(run(Seq((1L, 2L), (2L, 3L), (3L, 4L))).isEmpty)
  }

  test("duplicate, reversed, and self-loop edges fold away") {
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (1L, 3L), (3L, 3L))
    assert(run(messy) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("randomized equivalence with brute-force enumeration") {
    val rnd = new Random(77)
    (1 to 10).foreach { round =>
      val n = 15
      val edges = for {
        a <- 1L to n; b <- (a + 1) to n if rnd.nextDouble() < 0.35
      } yield (a, b)
      assert(run(edges) == brute(edges), s"round $round: ${edges.toList}")
    }
  }
}
