package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The edge-case gate's six round-13/14 contracts as an ALWAYS-ON suite.
  *
  * The full differential gate (tools/gen_edge.py → graft.Verify →
  * tools/selfcheck.py against DuckDB, EDGE.md) certifies cross-engine
  * equality at session close; it is manual and cannot run inside `sbt test`
  * (the oracle engine is driver-side only). This suite pins the SPARK-side
  * half of each edge contract on a self-contained mini corpus written here
  * with Spark itself, so a silent regression of any fix is caught between
  * closes:
  *
  *   1. corrupt/zero-norm vector quarantine (EDGE.md #1 + round-14 V6):
  *      scoring/PQ/training queries exclude NULL-element, NaN-element, and
  *      zero-norm embeddings up front — no crash, no NaN in any ranking;
  *   2. the t54 health check REPORTS corrupt vectors in n_bad instead of
  *      dying on them or absorbing them into the norm stats;
  *   3. spec-strict JSON props (t39): leniently-malformed props (single
  *      quotes, raw control chars, leading zeros, NaN literals) quarantine
  *      to NULL instead of parsing (Jackson leniency off) or crashing;
  *   4. the letter-run keyword contract (EDGE.md #4, extended to t128 in
  *      round 14): CJK/accent-adjacent keywords count as hits, combining
  *      marks split runs, both by the "maximal ASCII-letter run ∈ word
  *      set" rule — asserted against hand-counted values;
  *   5. byte-exact multimodal decode (EDGE.md #3): m36's checksum over a
  *      CJK doc equals an independent UTF-8 byte-sum computed here with
  *      java.nio — codepoint-based counting would diverge;
  *   6. C4 batched-BPE soundness (EDGE.md #5) is pinned separately in
  *      BpeSpec (planted + randomized same-letter-run vocabularies).
  *
  * What this suite deliberately does NOT cover: oracle-SQL drift. Only the
  * cross-engine gate can see that; run it at close per EDGE.md.
  */
class EdgeGateSpec extends SparkTestBase {

  private val zalgo = "zͦaͦlͦgͦoͦ combining stack text"
  private val cjkKw = "哈希hash表 data join查询 merge合并 éhashé plus plain hash join merge"
  private val cjk = "汉字文本处理测试 词元统计"

  private lazy val dir: String = {
    val out = java.nio.file.Files.createTempDirectory("graft_edge_spec").toString
    val s = spark
    import s.implicits._

    val docTexts = Seq(
      0L -> "", 1L -> "   ", 2L -> zalgo, 3L -> cjkKw, 4L -> cjk,
      5L -> "the quick hash join of a merge table and the sort window",
      6L -> "plain filler words value part batch spark line sort window",
      7L -> "hash hash hash merge", 8L -> "a", 9L -> "!!! ??? 12345")
    docTexts.map { case (id, t) => (id, t, "en", s"src${id % 3}", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$out/documents.parquet")

    // 48 benign deterministic vectors + zero (48) + NaN-component (49) +
    // NULL-component (50); dim 64 (the PQ/SRP queries assume it)
    def benign(i: Int): Array[java.lang.Float] =
      Array.tabulate[java.lang.Float](64)(j =>
        Float.box((((i * 31 + j * 7) % 13) - 6) / 10.0f + 0.05f))
    val nanVec = benign(49); nanVec(13) = Float.box(Float.NaN)
    val nullVec = benign(50); nullVec(27) = null
    val embRows = (0 until 48).map(i => Row(i.toLong, benign(i).toSeq, i % 10)) ++
      Seq(Row(48L, Array.fill[java.lang.Float](64)(0.0f).toSeq, 8),
        Row(49L, nanVec.toSeq, 9), Row(50L, nullVec.toSeq, 7))
    val embSchema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType, containsNull = true)),
      StructField("label", IntegerType)))
    spark.createDataFrame(spark.sparkContext.parallelize(embRows.toSeq, 1), embSchema)
      .coalesce(1).write.parquet(s"$out/embeddings.parquet")

    // events: props planted per the T6b/T6c families; k is valid on rows
    // 0..3 only (k = 10, 20, 30, 40)
    val props = Seq(
      """{"k": 10}""", """{"k": 20}""", """{"k": 30}""", """{"k": 40}""",
      "{}", "not json at all", """{"k": """, """{"k": "str"}""",
      "{'k': 5}", "{\"k\": 3, \"s\": \"a\u0001b\"}", """{"k": 05}""", """{"k": NaN}""")
    props.zipWithIndex.map { case (p, i) =>
      (i.toLong, java.sql.Timestamp.valueOf(s"2024-01-01 00:0${i % 10}:00"),
        (i % 3).toLong, "view", 1.5, p)
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$out/events.parquet")
    out
  }

  private def run(name: String): DataFrame = SparkEntry.queries(name)(spark, dir)
  private val corrupt = Set(48L, 49L, 50L)

  test("scoring/PQ/training queries quarantine corrupt + zero-norm vectors") {
    // every one of these either crashed or silently diverged on the edge
    // corpus before the finiteVec/scorableVec contracts (EDGE.md #1, V6)
    // scoring queries exclude zero-norm AND corrupt; PQ (L2, zero norm is
    // a legitimate encodable point) excludes only the corrupt pair
    val idCols = Map(
      "t33_ann_topk" -> (Seq("query_id", "neighbor_id"), corrupt),
      "t37_ann_lsh" -> (Seq("query_id", "neighbor_id"), corrupt),
      "t38_embedding_dedup" -> (Seq("keep_id", "dup_id"), corrupt),
      "t104_pq_encode" -> (Seq("vec_id"), Set(49L, 50L)))
    for ((name, (cols, banned)) <- idCols) {
      val rows = run(name).collect() // must not throw
      for (r <- rows; c <- cols if !r.isNullAt(r.fieldIndex(c)))
        assert(!banned.contains(r.getLong(r.fieldIndex(c))),
          s"$name scored corrupt vector in $c: $r")
      for (r <- rows; i <- r.schema.indices
           if r.schema(i).dataType == DoubleType && !r.isNullAt(i))
        assert(!r.getDouble(i).isNaN, s"$name emitted NaN: $r")
    }
    // training-side quarantine: these build centroids/iterates over the
    // corpus — a NaN component poisons every mean — and must still run
    run("t84_kmeans_assign").collect()
    run("t126_pca_power").collect().foreach(r =>
      assert(!r.getDouble(1).isNaN, s"t126 NaN loading: $r"))
  }

  test("t54 health check REPORTS corrupt vectors (NaN and NULL) in n_bad") {
    val byLabel = run("t54_embedding_norms").collect()
      .map(r => r.getInt(0) -> r).toMap
    // label 9 holds the NaN vector, label 7 the NULL-element vector
    assert(byLabel(9).getLong(byLabel(9).fieldIndex("n_bad")) == 1L)
    assert(byLabel(7).getLong(byLabel(7).fieldIndex("n_bad")) == 1L)
    // the zero vector is NOT corrupt for a norm profile: reportable 0.0
    assert(byLabel(8).getLong(byLabel(8).fieldIndex("n_bad")) == 0L)
    assert(byLabel(8).getDouble(byLabel(8).fieldIndex("min_norm")) == 0.0)
    // corrupt rows stay out of the stats (no NaN, no ANSI cast crash)
    for (r <- byLabel.values; c <- Seq("avg_norm", "min_norm", "max_norm"))
      assert(r.isNullAt(r.fieldIndex(c)) || !r.getDouble(r.fieldIndex(c)).isNaN,
        s"t54 NaN stat: $r")
  }

  test("t39 props parse is spec-strict: lenient-but-invalid JSON → NULL k") {
    val r = run("t39_json_props").collect()
    assert(r.length == 1)
    val row = r.head
    // 12 events; k is non-NULL on exactly the four spec-VALID rows.
    // {'k': 5} / ctrl-char / {"k": 05} / {"k": NaN} parse under Jackson
    // leniency flags (the get_json_object behavior) — sum_k would be 58
    // higher if any of them leaked through; {"k": 3, "s": "a\x01b"}'s
    // k=3 must not survive its sibling field's raw control char either.
    assert(row.getLong(row.fieldIndex("n_events")) == 12L)
    assert(row.getLong(row.fieldIndex("sum_k")) == 100L)
    assert(row.getLong(row.fieldIndex("min_k")) == 10L)
    assert(row.getLong(row.fieldIndex("max_k")) == 40L)
  }

  test("t128 keyword hits follow the letter-run contract on CJK/accent adjacency") {
    val byId = run("t128_bm25_topk").collect()
      .map(r => r.getLong(r.fieldIndex("doc_id")) -> r).toMap
    val r3 = byId(3L) // the CJK-adjacent keyword doc
    // hand count: 哈希hash表→hash, éhashé→hash, plain hash = 3;
    // join查询 + plain join = 2; merge合并 + plain merge = 2; dl = 10
    // maximal-ASCII-letter-runs. A \b-based count would read differently
    // on exactly these adjacencies (Java Unicode \b vs RE2 ASCII \b).
    assert(r3.getLong(r3.fieldIndex("tf_hash")) == 3L)
    assert(r3.getLong(r3.fieldIndex("tf_join")) == 2L)
    assert(r3.getLong(r3.fieldIndex("tf_merge")) == 2L)
    assert(r3.getLong(r3.fieldIndex("dl")) == 10L)
  }

  test("t27 stopword/word counts treat combining marks as run breaks (zalgo)") {
    val byId = run("t27_quality_score").collect()
      .map(r => r.getLong(r.fieldIndex("doc_id")) -> r).toMap
    val r2 = byId(2L)
    // zalgo: runs are z,a,l,g,o,combining,stack,text → n_words 8; the
    // embedded 'a' IS a maximal run equal to a stopword → n_stop 1 —
    // the CONTRACT value (identical cross-engine), asserted via score:
    // min(8/100,1)*0.5 + (1/8)*0.3 + (1-0)*0.2 = 0.2775
    assert(r2.getLong(r2.fieldIndex("n_words")) == 8L)
    assert(r2.getDouble(r2.fieldIndex("score")) == 0.2775)
  }

  test("m36 decode features are byte-exact on CJK text (UTF-8 bytes, not codepoints)") {
    val byId = run("m36_decode_features").collect()
      .map(r => r.getLong(r.fieldIndex("doc_id")) -> r).toMap
    for (id <- Seq(3L, 4L)) {
      val bytes = docText(id).getBytes(UTF_8)
      val r = byId(id)
      assert(r.getLong(r.fieldIndex("body_len")) == bytes.length.toLong,
        s"doc $id body_len is not the UTF-8 byte count")
      val bytesum = bytes.foldLeft(0L)((a, b) => a + (b & 0xff))
      assert(r.getLong(r.fieldIndex("checksum")) == bytesum % 65521,
        s"doc $id checksum is not over UTF-8 bytes")
    }
  }

  private def docText(id: Long): String = id match {
    case 3L => cjkKw
    case 4L => cjk
    case other => sys.error(s"no planted text for doc $other")
  }
}
