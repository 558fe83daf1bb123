package graft

import scala.util.Random

import graft.operators.DupSpans

/** Randomized equivalence for the exact duplicated-span operator: find and
  * strip vs a driver-side brute force over every k-gram, on corpora drawn
  * from a tiny vocabulary so cross-document repeats, overlapping runs, and
  * fully-duplicated docs arise naturally. Seeded, so failures reproduce.
  */
class DupSpansPropertySpec extends SparkTestBase {

  import spark.implicits._

  private def bruteSpans(
      docs: Seq[(Long, Array[String])], k: Int): Map[Long, Seq[(Long, Long)]] = {
    val grams: Seq[(Long, Int, String)] = docs.flatMap { case (id, t) =>
      (0 to t.length - k).map(p => (id, p, t.slice(p, p + k).mkString(" ")))
    }
    val dup = grams.groupBy(_._3).filter(_._2.map(_._1).distinct.size >= 2).keySet
    docs.map { case (id, t) =>
      val sites = (0 to t.length - k).filter(p => dup(t.slice(p, p + k).mkString(" ")))
      // merge consecutive duplicated sites into maximal [start, end] spans
      val spans = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      sites.foreach { p =>
        if (spans.nonEmpty && p <= spans.last._2 - k + 1) {
          val (s, _) = spans.remove(spans.length - 1)
          spans += ((s, p + k.toLong))
        } else spans += ((p + 1L, p + k.toLong))
      }
      id -> spans.toSeq
    }.toMap
  }

  test("find and strip match brute force on random small-vocabulary corpora") {
    val rnd = new Random(20260815L)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    var sawSpans = false
    for (trial <- 1 to 5) {
      val k = 3
      val docs: Seq[(Long, Array[String])] = (0 until 8).map { i =>
        val n = rnd.nextInt(30) + 1
        (i.toLong, Array.fill(n)(vocab(rnd.nextInt(vocab.length))))
      }
      val df = docs.map { case (id, t) => (id, t.mkString(" ")) }.toDF("doc_id", "text")
      val want = bruteSpans(docs, k).filter(_._2.nonEmpty)
      sawSpans ||= want.nonEmpty

      val got = DupSpans.find(df, "doc_id", "text", k)
        .collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
        .groupBy(_._1).map { case (id, xs) => id -> xs.map(_._2).sortBy(_._1).toSeq }
      assert(got == want, s"trial $trial spans diverged: got=$got want=$want")

      val stripped = DupSpans.strip(df, "doc_id", "text", k)
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
      docs.foreach { case (id, t) =>
        val covered = want.getOrElse(id, Nil)
          .flatMap { case (s, e) => (s to e) }.toSet
        val kept = t.zipWithIndex.collect { case (w, i) if !covered(i + 1L) => w }
        val (cleanText, nBefore, nKept) = stripped(id)
        assert(cleanText == kept.mkString(" "), s"trial $trial doc $id text diverged")
        assert(nBefore == t.length.toLong && nKept == kept.length.toLong)
      }
    }
    assert(sawSpans, "vacuous run: no trial produced any duplicated span")
  }
}
