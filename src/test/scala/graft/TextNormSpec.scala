package graft

import org.apache.spark.sql.functions._

import graft.functions.TextNorm

/** Unicode canonicalization kernels (functions/TextNorm.scala): the shipped
  * corpus is ASCII, so the REAL normalization behavior is pinned here on
  * composed/decomposed/ligature/width/Hangul fixtures, plus the properties
  * a canonicalization must satisfy (idempotence, NFC-equivalence folding,
  * hash-key stability). The composed/decomposed fixtures are genuinely
  * distinct codepoint sequences (U+00E9 vs e+U+0301 etc.) — the first
  * test's distinct-md5-input premise would fail loudly if an editor ever
  * re-normalized this file.
  */
class TextNormSpec extends SparkTestBase {

  import spark.implicits._

  private val composed = "café"         // é as one codepoint
  private val decomposed = "café"      // e + combining acute

  test("NFC folds composed and decomposed encodings to one fingerprint") {
    val out = Seq(composed, decomposed).toDF("t")
      .select(md5(TextNorm.nfc(col("t")).cast("binary")).as("fp"),
        TextNorm.nfc(col("t")).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(out.map(_._1).distinct.length == 1, "same visible text must share one md5")
    assert(out.map(_._2).forall(_ == composed), "NFC must compose to U+00E9")
  }

  test("NFC is idempotent and identity on ASCII") {
    val hangulJamo = "한"    // decomposed 한
    val df = Seq("plain ascii text", composed, decomposed, hangulJamo).toDF("t")
      .select(col("t"), TextNorm.nfc(col("t")).as("n1"),
        TextNorm.nfc(TextNorm.nfc(col("t"))).as("n2"))
    df.collect().foreach { r =>
      assert(r.getString(1) == r.getString(2), "nfc(nfc(x)) must equal nfc(x)")
    }
    assert(df.filter(col("t") === "plain ascii text")
      .head().getString(1) == "plain ascii text")
    assert(df.filter(col("t") === hangulJamo).head().getString(1) == "한",
      "NFC must compose decomposed Hangul jamo")
  }

  test("NFKC folds compatibility forms (ligature, full-width)") {
    val out = Seq("ﬁle", "ａｂｃ").toDF("t") // ﬁle, ａｂｃ
      .select(TextNorm.nfkc(col("t")).as("n"))
      .collect().map(_.getString(0))
    assert(out(0) == "file")
    assert(out(1) == "abc")
  }

  test("strip_accents drops marks from both encodings, leaves Hangul intact") {
    val hangul = "한글" // 한글 — decomposes to jamo, not marks
    val out = Seq(composed, decomposed, "résumé", hangul)
      .toDF("t").select(TextNorm.stripAccents(col("t")).as("s"))
      .collect().map(_.getString(0))
    assert(out(0) == "cafe" && out(1) == "cafe")
    assert(out(2) == "resume")
    assert(out(3) == hangul, "Hangul recomposes unchanged — jamo are not marks")
  }

  test("SQL surface: graft_nfc/graft_nfkc/graft_strip_accents are registered") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      s"SELECT graft_nfc('$decomposed') = graft_nfc('$composed') AS same, " +
        "graft_nfkc('ﬁ') AS lig, " +
        s"graft_strip_accents('$composed') AS sa")
      .head()
    assert(r.getBoolean(0) && r.getString(1) == "fi" && r.getString(2) == "cafe")
  }

  test("null flows through as null (nullIntolerant)") {
    val out = Seq((1, Option.empty[String]), (2, Some(composed)))
      .toDF("id", "t").select(TextNorm.nfc(col("t"))).collect()
    assert(out(0).isNullAt(0) && !out(1).isNullAt(0))
  }
}
