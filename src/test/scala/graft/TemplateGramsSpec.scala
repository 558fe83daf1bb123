package graft

import org.apache.spark.sql.functions._

import graft.operators.TemplateGrams

/** Edge contracts of the template family's shared gram arm (t164/t165/
  * DocStreams.templateDfStream). The oracle gates prove the corpus-level
  * reports; these pin the row-level semantics a gate aggregate could
  * mask. */
class TemplateGramsSpec extends SparkTestBase {
  import spark.implicits._

  test("short rows are dropped, grams are distinct per row, passthrough columns survive") {
    val docs = Seq(
      (1L, "srcA", "a b c d e"),        // 2 distinct 4-grams
      (2L, "srcA", "x y z"),            // < 4 tokens: no gram rows at all
      (3L, "srcB", "a b a b a b a b"))  // repeated gram must collapse to distinct
      .toDF("doc_id", "source", "text")
    val g = TemplateGrams.grams(docs, "text", 4)
    assert(g.columns.toSeq == Seq("doc_id", "source", "h"))
    val byDoc = g.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byDoc == Map(1L -> 2L, 3L -> 2L), s"got $byDoc")
    // doc 3's token stream has 5 gram positions but only 2 distinct grams
    // (abab/baba); a non-distinct arm would count 5
    assert(!byDoc.contains(2L))
    // tokenization is the oracle's: lower-cased [a-z]+ runs — digits and
    // punctuation split tokens identically in both engines
    val mixed = Seq((9L, "A b...C d4e")).toDF("doc_id", "text")
    // tokens: a, b, c, d, e → two 4-grams
    assert(TemplateGrams.grams(mixed, "text", 4).count() == 2)
  }

  test("partial df is additive across disjoint batches (the t165/stream invariant)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val whole = m(TemplateGrams.partialDf(docs, "doc_id", "text", 4)
      .select(col("h"), col("df_part")))
    val a = m(TemplateGrams.partialDf(docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", 4)
      .select(col("h"), col("df_part")))
    val b = m(TemplateGrams.partialDf(docs.filter(col("doc_id") % 2 =!= 0), "doc_id", "text", 4)
      .select(col("h"), col("df_part")))
    val summed = (a.keySet ++ b.keySet).iterator
      .map(h => h -> (a.getOrElse(h, 0L) + b.getOrElse(h, 0L))).toMap
    assert(summed == whole, "partials from a disjoint split must sum to the full-corpus df")
    assert(whole.nonEmpty)
  }

  test("mergedDf collapses literal replay duplicates exactly, and only those") {
    val store = Seq(
      (10L, 2L, 0L), (10L, 2L, 0L), // replayed append: same (h, df_part, batch)
      (10L, 1L, 1L),                // later batch, same gram: must still add
      (11L, 3L, 0L))
      .toDF("h", "df_part", "batch_id")
    val got = TemplateGrams.mergedDf(store).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(10L -> 3L, 11L -> 3L), s"got $got")
  }

  test("k < 1 is rejected; a backtick-hostile text column name is handled") {
    intercept[IllegalArgumentException](TemplateGrams.grams(Seq((1L, "a b")).toDF("doc_id", "text"), "text", 0))
    val weird = Seq((1L, "a b c d e")).toDF("doc_id", "odd`name")
    assert(TemplateGrams.grams(weird, "odd`name", 4).count() == 2)
  }
}
