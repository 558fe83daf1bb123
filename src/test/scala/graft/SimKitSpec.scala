package graft

import org.apache.spark.sql.functions._

import graft.functions.ArrayFns

/** Pins the CosineSim edge contract (VERDICT r3 item 8): well-formed vectors
  * score normally, NULL arrays yield NULL (nullIntolerant), but RAGGED inputs
  * and NULL elements RAISE — the earlier min-length/null-as-0.0 behavior
  * silently produced a plausible score for malformed embeddings where the
  * oracle formulation would diverge.
  */
class SimKitSpec extends SparkTestBase {

  private def cosF(a: Seq[Option[Float]], b: Seq[Option[Float]]): Double = {
    import spark.implicits._
    Seq((a, b)).toDF("a", "b")
      .select(ArrayFns.cosineSim(col("a"), col("b")).as("c"))
      .head().getDouble(0)
  }

  private def rootMessage(t: Throwable): String = {
    var cur = t
    while (cur.getCause != null) cur = cur.getCause
    Option(cur.getMessage).getOrElse("")
  }

  test("cosine of well-formed float vectors (codegen path)") {
    val v = cosF(Seq(Some(1f), Some(2f), Some(3f)), Seq(Some(1f), Some(2f), Some(3f)))
    assert(math.abs(v - 1.0) < 1e-12)
    val o = cosF(Seq(Some(1f), Some(0f)), Seq(Some(0f), Some(1f)))
    assert(o == 0.0)
  }

  test("cosine of double vectors matches the sequential-fold formulation") {
    import spark.implicits._
    val a = Seq(0.5, -1.25, 2.0)
    val b = Seq(1.5, 0.25, -0.75)
    val got = Seq((a, b)).toDF("a", "b")
      .select(ArrayFns.cosineSim(col("a"), col("b")).as("c"))
      .head().getDouble(0)
    val dot = a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + x * y }
    val na = a.foldLeft(0.0)((s, x) => s + x * x)
    val nb = b.foldLeft(0.0)((s, x) => s + x * x)
    assert(got == dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  test("dot product matches the sequential fold in both element widths") {
    import spark.implicits._
    val a = Seq(0.5, -1.25, 2.0)
    val b = Seq(1.5, 0.25, -0.75)
    val gotD = Seq((a, b)).toDF("a", "b")
      .select(ArrayFns.dotProduct(col("a"), col("b")).as("d"))
      .head().getDouble(0)
    assert(gotD == a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + x * y })
    val af = a.map(_.toFloat)
    val bf = b.map(_.toFloat)
    val gotF = Seq((af, bf)).toDF("a", "b")
      .select(ArrayFns.dotProduct(col("a"), col("b")).as("d"))
      .head().getDouble(0)
    assert(gotF == af.zip(bf).foldLeft(0.0) {
      case (s, (x, y)) => s + x.toDouble * y.toDouble })
    val e = intercept[Throwable] {
      Seq((a, Seq(1.0, 2.0))).toDF("a", "b")
        .select(ArrayFns.dotProduct(col("a"), col("b"))).head()
    }
    assert(rootMessage(e).contains("ragged"))
  }

  test("zero-norm vector yields NaN (0/0), matching both engines") {
    assert(cosF(Seq(Some(0f), Some(0f)), Seq(Some(1f), Some(2f))).isNaN)
  }

  test("NULL array input yields NULL (nullIntolerant)") {
    import spark.implicits._
    val df = Seq((Some(Seq(1.0f, 2.0f)), Option.empty[Seq[Float]])).toDF("a", "b")
    val r = df.select(ArrayFns.cosineSim(col("a"), col("b")).as("c")).head()
    assert(r.isNullAt(0))
  }

  test("ragged vectors raise instead of scoring over min length") {
    val e = intercept[Throwable] {
      cosF(Seq(Some(1f), Some(2f), Some(3f)), Seq(Some(1f), Some(2f)))
    }
    assert(rootMessage(e).contains("ragged"))
  }

  test("null element raises instead of reading 0.0") {
    val e = intercept[Throwable] {
      cosF(Seq(Some(1f), None, Some(3f)), Seq(Some(1f), Some(2f), Some(3f)))
    }
    assert(rootMessage(e).contains("null element"))
  }

  test("l2Norm: value on well-formed, NULL on null vector or null element") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(Seq(Some(3.0f), Some(4.0f)))),
      (2L, Some(Seq(Some(1.0f), None))),
      (3L, Option.empty[Seq[Option[Float]]])
    ).toDF("id", "v")
    val rows = df.select(col("id"), ArrayFns.l2Norm(col("v")).as("n")).orderBy("id").collect()
    assert(math.abs(rows(0).getDouble(1) - 5.0) < 1e-12)
    assert(rows(1).isNullAt(1) && rows(2).isNullAt(1))
  }

  test("word n-gram hashes: distinct sorted, empty under n tokens") {
    import spark.implicits._
    def grams(s: String, n: Int): Seq[Long] =
      Seq(s).toDF("t")
        .select(ArrayFns.wordNgramHashes(col("t"), n).as("g"))
        .head().getSeq[Long](0)
    assert(grams("one two", 3).isEmpty)
    assert(grams("", 3).isEmpty)
    val g = grams("a b c d", 3) // "a b c", "b c d"
    assert(g.length == 2 && g == g.sorted && g.distinct == g)
    // repeated n-grams collapse
    assert(grams("x y x y x y", 2).length == 2) // "x y" and "y x"
    // whitespace runs and leading/trailing space don't change tokenization
    assert(grams("  a   b  c ", 3) == grams("a b c", 3))
  }

  test("kgramHashes: positional fingerprints agree with string-window equality") {
    import spark.implicits._
    // the contract the DupSpans/TemplateGrams rewire relies on: two window
    // positions share a fingerprint iff their token windows are equal
    // (collisions are 2^-64-class; a planted corpus cannot hit one), the
    // positional array has exactly n-k+1 entries, and the distinct variant
    // is the sorted unique set of the positional one
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "bb", "ccc", "word", "xyz", "dup", "héllo")
    val cases = Seq(
      Seq("a", "b", "c", "a", "b", "c", "a", "b"),
      Seq("x"), Seq("x", "x", "x", "x"),
      Seq("a b", "c", "a", "b c")) ++ // delimiter-bearing tokens stay distinct
      (1 to 40).map(_ => (0 to rnd.nextInt(25)).map(_ => vocab(rnd.nextInt(vocab.length))))
    for (k <- Seq(2, 3, 8); toks <- cases) {
      val row = Seq(Tuple1(toks)).toDF("t")
        .select(
          ArrayFns.kgramHashesAt(col("t"), k).as("at"),
          ArrayFns.kgramHashes(col("t"), k, distinct = true).as("d"))
        .head()
      val at = row.getSeq[Long](0)
      val d = row.getSeq[Long](1)
      val windows = toks.sliding(k).filter(_.length == k).toVector
      assert(at.length == math.max(toks.length - k + 1, 0))
      // fingerprint equality structure == window equality structure
      val byFp = at.zipWithIndex.groupBy(_._1).values.map(_.map(_._2).toSet).toSet
      val byWin = windows.indices.groupBy(windows(_)).values.map(_.toSet).toSet
      assert(byFp == byWin, s"fingerprint/window partition drift on $toks k=$k")
      assert(d == at.distinct.sorted, s"distinct variant drift on $toks k=$k")
    }
  }

  test("intraDupCounts matches a string-gram reference on random corpora") {
    import spark.implicits._
    // reference: regex tokenization + literal gram-string distinct counts
    def ref(s: String): Seq[Long] = {
      val toks = "[a-z]+".r.findAllIn(s.toLowerCase).toSeq
      (2 to 4).flatMap { n =>
        val g = toks.sliding(n).filter(_.length == n).map(_.mkString(" ")).toSeq
        Seq(g.length.toLong, g.distinct.length.toLong)
      }
    }
    val rnd = new scala.util.Random(42)
    val vocab = Vector("a", "bb", "ccc", "word", "xyz")
    val cases = Seq("", "word", "1234 !!!", "a b a b a b",
      "héllo wörld mixed CASE tokens") ++
      (1 to 60).map(_ => (1 to rnd.nextInt(30)).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" "))
    val got = cases.toDF("t")
      .select(ArrayFns.intraDupCounts(lower(col("t"))).as("c"))
      .collect().map(_.getSeq[Long](0))
    cases.zip(got).foreach { case (s, c) =>
      assert(c == ref(s), s"intraDupCounts drift on '$s': got $c want ${ref(s)}")
    }
  }
}
