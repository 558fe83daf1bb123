package graft

import org.apache.spark.sql.functions._

import graft.functions.ArrayFns

/** The SQL function surface must evaluate identically to the DataFrame-API
  * wrappers over the same codegen'd expressions, and misuse must fail at
  * analysis time.
  */
class GraftExtensionsSpec extends SparkTestBase {

  import spark.implicits._

  override def beforeAll(): Unit = {
    super.beforeAll()
    GraftExtensions.register(spark)
  }

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumped over a lazy dog"),
    (3L, "pack my box with five dozen liquor jugs")
  ).toDF("id", "text")

  test("simhash64 over token hashes matches the DataFrame API") {
    docs.createOrReplaceTempView("ext_docs")
    val viaSql = spark.sql(
      "SELECT id, graft_simhash64(graft_token_hashes64(text)) AS sh FROM ext_docs ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val viaApi = docs
      .select(col("id"), ArrayFns.simhash64(ArrayFns.tokenHashes64(col("text"))).as("sh"))
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(viaSql.toSeq === viaApi.toSeq)
  }

  test("cosine_sim and srp_bucket match the DataFrame API") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 2.0f), Array(0.5f, 1.0f, 1.0f)),
      (2L, Array(0.0f, 3.0f, 4.0f), Array(0.0f, 3.0f, 4.0f))
    ).toDF("id", "a", "b")
    vecs.createOrReplaceTempView("ext_vecs")
    val viaSql = spark.sql(
      "SELECT id, graft_cosine_sim(a, b) AS cs FROM ext_vecs ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val viaApi = vecs.select(col("id"), ArrayFns.cosineSim(col("a"), col("b")).as("cs"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(viaSql.toSeq === viaApi.toSeq)
  }

  test("minhash/shingles/ngram/intersect round-trip through SQL") {
    docs.createOrReplaceTempView("ext_docs")
    val n = spark.sql(
      """SELECT graft_sorted_intersect_count(
        |  graft_minhash_sig(graft_char_shingle_hashes(d1.text)),
        |  graft_minhash_sig(graft_char_shingle_hashes(d2.text))) AS c
        |FROM ext_docs d1 JOIN ext_docs d2 ON d1.id = 1 AND d2.id = 2""".stripMargin)
      .collect().head.getInt(0)
    assert(n > 0) // near-dup docs share minhash components
    val ng = spark.sql(
      "SELECT size(graft_word_ngram_hashes(text, 3)) AS n FROM ext_docs WHERE id = 3")
      .collect().head.getInt(0)
    assert(ng === 6) // 8 words -> 6 distinct 3-grams
  }

  test("wrong arity and non-literal plane count fail at analysis time") {
    docs.createOrReplaceTempView("ext_docs")
    intercept[Exception] {
      spark.sql("SELECT graft_simhash64(text, 2) FROM ext_docs").collect()
    }
    intercept[Exception] {
      spark.sql("SELECT graft_srp_bucket(CAST(array(1.0) AS ARRAY<FLOAT>), id) FROM ext_docs")
        .collect()
    }
  }

  test("editdist_within matches the builtin levenshtein threshold contract in SQL") {
    val pairs = Seq((1L, "kitten", "sitting"), (2L, "same", "same"), (3L, "abc", "xyzabcdef"))
      .toDF("id", "a", "b")
    pairs.createOrReplaceTempView("ext_ed")
    val viaSql = spark.sql(
      "SELECT id, graft_editdist_within(a, b, 3) AS d FROM ext_ed ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    val expected = pairs
      .select(col("id"), levenshtein(col("a"), col("b")).as("full"))
      .orderBy("id")
      .collect().map(r => (r.getLong(0), { val f = r.getInt(1); if (f <= 3) f else -1 }))
    assert(viaSql.toSeq === expected.toSeq)
    // per-row INT thresholds are part of the SQL surface (t130's per-pair
    // band): id 1 → t=1 rejects lev 3; id 2 → t=2 accepts 0; id 3 → t=3
    // rejects lev 6
    val dyn = spark.sql(
      "SELECT id, graft_editdist_within(a, b, CAST(id AS INT)) AS d FROM ext_ed ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(dyn.toSeq === Seq((1L, -1), (2L, 0), (3L, -1)))
    intercept[Exception] { // non-INT threshold type still fails at analysis time
      spark.sql("SELECT graft_editdist_within(a, b, id) FROM ext_ed").collect()
    }
  }

  test("blocklist_hits and cdc_chunk_ends round-trip through SQL") {
    docs.createOrReplaceTempView("ext_docs2")
    val viaSql = spark.sql(
      "SELECT id, graft_blocklist_hits(text, array('the', 'he', 'lazy dog')) AS n " +
        "FROM ext_docs2 ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val viaApi = docs
      .select(col("id"),
        graft.functions.Blocklist.hits(col("text"), Seq("the", "he", "lazy dog")).as("n"))
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(viaSql.toSeq === viaApi.toSeq)
    assert(viaSql.head._2 == 5L, "doc 1: 'the'x2 + 'he'x2 + 'lazy dog'") // overlap counts

    val ends = spark.sql(
      "SELECT graft_cdc_chunk_ends(graft_cdc_fixture) AS e FROM (" +
        "SELECT cast(concat('GRFTxxxxxxxxxx', 'abcdefghij') as binary) AS graft_cdc_fixture)")
      .head().getSeq[Long](0)
    assert(ends.nonEmpty && ends.last == 10L, s"body of 10 bytes must end at 10: $ends")

    intercept[Exception] { // non-literal pattern array fails at analysis time
      spark.sql("SELECT graft_blocklist_hits(text, array(text)) FROM ext_docs2").collect()
    }
    // a NULL element inside a pre-folded literal array must raise the same
    // clean analysis-time error, not an NPE from the optimizer's
    // constant-folded ArrayData branch
    val nullElem = intercept[Exception] {
      spark.sql(
        "SELECT graft_blocklist_hits(text, array('a', CAST(NULL AS STRING), 'b')) " +
          "FROM ext_docs2").collect()
    }
    assert(nullElem.getMessage.contains("ARRAY<STRING>"),
      s"expected the literal-array analysis error, got: ${nullElem.getMessage}")
    // and the PRE-FOLDED ArrayData branch (what the optimizer hands a
    // builder after constant folding) with a null element: same clean
    // IllegalArgumentException, not an NPE from mapping toString over nulls
    val builder = GraftExtensions.functions
      .find(_._1.funcName == "graft_blocklist_hits").get._3
    val arr = org.apache.spark.sql.catalyst.expressions.Literal.create(
      Seq("a", null, "b"),
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType))
    val folded = intercept[IllegalArgumentException] {
      builder(Seq(org.apache.spark.sql.catalyst.expressions.Literal("x"), arr))
    }
    assert(folded.getMessage.contains("ARRAY<STRING>"),
      s"expected the literal-array analysis error, got: ${folded.getMessage}")
  }
}
