package graft

import graft.operators.Containment

/** Planted-fixture semantics for asymmetric containment (t125): the
  * short-doc-embedded-in-long-doc case that symmetric Jaccard
  * structurally misses, the df cap's stopword suppression, and the
  * direction asymmetry of the score itself.
  */
class ContainmentSpec extends SparkTestBase {

  import spark.implicits._

  private def toks(n: Int, tag: String): String =
    (0 until n).map(i => s"$tag$i").mkString(" ")

  test("containment flags a quoted subset doc that Jaccard misses") {
    // A = a 12-token phrase; B = A verbatim inside 60 tokens of unique
    // filler; C = unrelated. G(A) has 5 distinct 8-grams, all shared with
    // B → C(A→B) = 1.0, while Jaccard(A,B) ≈ 5/65 ≈ 0.08.
    val phrase = toks(12, "p")
    val docs = Seq(
      (1L, phrase),
      (2L, toks(30, "x") + " " + phrase + " " + toks(30, "y")),
      (3L, toks(40, "z"))).toDF("doc_id", "text")
    val got = Containment.pairs(docs, "doc_id", "text", k = 8, dfCap = 50, tau = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(4))).toSet
    assert(got == Set((1L, 2L, 1.0)),
      s"expected exactly the A-contained-in-B pair at 1.0, got $got")
    // the reverse direction must NOT clear tau: B is mostly NOT in A
    assert(!got.exists(p => p._1 == 2L),
      s"containment must be asymmetric — B→A scored: $got")
  }

  test("df cap suppresses template grams so boilerplate alone forms no pair") {
    // The same 8-token banner prefixes every doc (template boilerplate);
    // bodies are disjoint. With dfCap below the corpus df, banner grams
    // leave the universe and no pair survives; with the cap lifted, every
    // doc is "contained" in every other through the banner alone.
    val banner = toks(8, "b")
    val docs = (1L to 5L).map(i => (i, banner + " " + toks(20, s"u$i"))).toDF("doc_id", "text")
    val capped = Containment.pairs(docs, "doc_id", "text", k = 8, dfCap = 4, tau = 0.05)
    assert(capped.count() == 0, "df-capped run must drop the template gram")
    val uncapped = Containment.pairs(docs, "doc_id", "text", k = 8, dfCap = 50, tau = 0.01)
    assert(uncapped.count() > 0, "sanity: without the cap the banner links docs")
  }

  test("exact duplicates score 1.0 in both directions") {
    val body = toks(25, "d")
    val docs = Seq((1L, body), (2L, body)).toDF("doc_id", "text")
    val got = Containment.pairs(docs, "doc_id", "text", k = 8, dfCap = 50, tau = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(4))).toSet
    assert(got == Set((1L, 2L, 1.0), (2L, 1L, 1.0)), s"got $got")
  }
}
