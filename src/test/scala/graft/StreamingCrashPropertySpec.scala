package graft

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.queries.{Multimodal, Similarity}
import graft.streaming.DocStreams

/** Randomized crash-point certification of the streaming twins'
  * exactly-once contracts. StreamingSpec exercises CHOSEN crash scenarios
  * (partial append, re-delivery, rebase); this sweep draws the crash point
  * at random — where the batch is split, how much of the crashed batch's
  * store append committed (none / a random subset / all), and whether the
  * verdict sink got (partially) written before the death — then replays
  * and asserts the recomputed batch equals the BATCH-truth computation
  * against exactly the pre-crash visible state. Seeded, so failures
  * reproduce.
  *
  * Crash model (the harsher cross-incarnation form StreamingSpec
  * established): the crashed batch re-delivers as batch 0 of a FRESH
  * checkpoint, so its id collides with the committed history batch's id —
  * the (batch_id, doc_id)-scoped exclusion must hide exactly the crashed
  * batch's own partial rows while keeping history rows visible. A
  * partially-written sink directory must be erased by the replay's
  * per-batch-id overwrite.
  *
  * All ten DocStreams twins are swept: the four self-maintaining /
  * store-backed ones (chunk, phash, self-maintaining admission, template
  * df — random partial STORE appends under the colliding id, plus sink
  * garbage; template df goes through the documented rebase lineage flip
  * first, since its df_before exclusion is batch_id-scoped) and the six
  * stateless-sink ones (audio trim, static admission, triage, quality,
  * blocklist, dsir — random batch draw onto a garbage-seeded sink).
  */
class StreamingCrashPropertySpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  import spark.implicits._
  implicit private lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  /** Edge-class documents (EDGE.md families E1–E3) unioned into every
    * sweep's pool: the crash/replay contracts must hold when the batch
    * that dies contains the inputs most likely to exercise kernel edge
    * paths — empty/whitespace text (zero-length GRFT bodies chunk to no
    * rows), CJK/emoji/combining marks (multi-byte UTF-8 everywhere a
    * byte offset is computed), and single-letter runs (self-pair BPE /
    * repetition paths). High ids keep them disjoint from the fixture. */
  private val edgeTexts = Seq(
    "", " ", "   \t\n  ", "a",
    "汉字文本处理测试 汉字文本处理测试 词元统计",
    "😀🚀 emoji stream 😀🚀 with words",
    "zͦaͦlͦgͦoͦ combining stack text",
    "a" * 3000,
    ("ping pong " * 200).trim)
  private def edgeDocRows: Seq[(Long, String)] =
    edgeTexts.zipWithIndex.map { case (t, i) => (900000L + i, t) }
  private def withEdgeDocs(docs: DataFrame): DataFrame =
    docs.union(edgeDocRows.toDF("doc_id", "text"))

  /** Random crash point: fraction of the crashed batch's store rows that
    * made it to disk, and whether the sink write (partially) happened. */
  private def crashPoint(rnd: Random): (Double, Boolean) = {
    val f = rnd.nextInt(3) match {
      case 0 => 0.0 // died before any append
      case 1 => rnd.nextDouble() // died mid-append
      case _ => 1.0 // append finished, checkpoint commit didn't
    }
    (f, rnd.nextBoolean())
  }

  /** Deterministic f-subset of a frame by row hash. */
  private def subset(df: DataFrame, f: Double, over: Seq[String]): DataFrame =
    if (f >= 1.0) df
    else if (f <= 0.0) df.limit(0)
    else df.filter(pmod(abs(hash(over.map(col): _*)), lit(1000)) < lit((f * 1000).toInt))

  test("chunkIndexStream survives random crash points (kill after N append rows, restart)") {
    val rnd = new Random(20260815L)
    val payloads = Multimodal.mediaPayloadOf(withEdgeDocs(
      Tables.documents(spark, dir).select(col("doc_id"), col("text")))).collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
    for (trial <- 1 to 3) {
      val table = s"ccp_chunk_$trial"
      spark.sql(s"DROP TABLE IF EXISTS $table")
      val base = java.nio.file.Files.createTempDirectory(s"graft_ccp_chunk$trial").toString
      val cut = 1 + rnd.nextInt(payloads.length - 1)
      val (h, c) = payloads.splitAt(cut)
      val (f, sinkWritten) = crashPoint(rnd)

      def drive(ckpt: String, out: String)(b: Seq[(Long, Array[Byte])]): Unit = {
        val input = MemoryStream[(Long, Array[Byte])]
        val q = DocStreams.chunkIndexStream(
          input.toDS().toDF("doc_id", "payload"), table, s"$base/store", out, ckpt)
        try { input.addData(b: _*); q.processAllAvailable() } finally q.stop()
      }
      // incarnation 1: history commits as batch 0
      drive(s"$base/ckpt1", s"$base/out1")(h.toSeq)
      // incarnation 2 crashes inside batch 0 = C: a random prefix of its
      // store rows is on disk under the SAME batch id; maybe a partial sink
      val chunksC = Multimodal.chunkFps(c.toSeq.toDF("doc_id", "payload")).localCheckpoint()
      val partial = subset(chunksC.select(col("doc_id"), col("fp")).distinct(), f,
        Seq("doc_id", "fp"))
      if (partial.count() > 0)
        partial.withColumn("batch_id", lit(0L))
          .write.mode("append").option("path", s"$base/store")
          .bucketBy(8, "fp").saveAsTable(table)
      if (sinkWritten)
        Seq((-999L, -1L, -1L, -1L)).toDF("doc_id", "n_chunks", "n_dup_chunks", "dup_bytes")
          .write.mode("overwrite").parquet(s"$base/out2/batch=0")
      // restart: C re-delivers as batch 0 of a fresh checkpoint
      drive(s"$base/ckpt2", s"$base/out2")(c.toSeq)

      def keys(df: DataFrame) = df.select("doc_id", "n_chunks", "n_dup_chunks", "dup_bytes")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val truth = keys(Multimodal.chunkDedupAgainst(
        chunksC, Multimodal.chunkFps(h.toSeq.toDF("doc_id", "payload"))))
      val got = keys(spark.read.parquet(s"$base/out2/batch=0"))
      assert(got == truth,
        s"trial $trial (cut=$cut f=$f sink=$sinkWritten): " +
          s"${got.diff(truth).take(3)} / ${truth.diff(got).take(3)}")
      assert(!got.exists(_._1 == -999L), "partial sink rows must be erased by the replay")
      spark.sql(s"DROP TABLE IF EXISTS $table")
    }
  }

  test("imagePhashStream survives random crash points") {
    val rnd = new Random(20260816L)
    val payloads = Multimodal.rasterPayloadOf(withEdgeDocs(
      Tables.documents(spark, dir).select(col("doc_id"), col("text")))).collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
    for (trial <- 1 to 3) {
      val table = s"ccp_phash_$trial"
      spark.sql(s"DROP TABLE IF EXISTS $table")
      val base = java.nio.file.Files.createTempDirectory(s"graft_ccp_phash$trial").toString
      val cut = 1 + rnd.nextInt(payloads.length - 1)
      val (h, c) = payloads.splitAt(cut)
      val (f, sinkWritten) = crashPoint(rnd)

      def drive(ckpt: String, out: String)(b: Seq[(Long, Array[Byte])]): Unit = {
        val input = MemoryStream[(Long, Array[Byte])]
        val q = DocStreams.imagePhashStream(
          input.toDS().toDF("doc_id", "payload"), table, s"$base/store", out, ckpt)
        try { input.addData(b: _*); q.processAllAvailable() } finally q.stop()
      }
      drive(s"$base/ckpt1", s"$base/out1")(h.toSeq)
      val sigsC = Multimodal.aHashBands(c.toSeq.toDF("doc_id", "payload")).localCheckpoint()
      val partial = subset(sigsC, f, Seq("doc_id"))
      if (partial.count() > 0)
        partial.withColumn("batch_id", lit(0L))
          .write.mode("append").option("path", s"$base/store")
          .bucketBy(8, "doc_id").saveAsTable(table)
      if (sinkWritten)
        Seq((-999L, -1L, true)).toDF("doc_id", "n_dups", "admitted")
          .write.mode("overwrite").parquet(s"$base/out2/batch=0")
      drive(s"$base/ckpt2", s"$base/out2")(c.toSeq)

      def keys(df: DataFrame) = df.select("doc_id", "n_dups", "admitted")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
      // history probed an empty store, so every history doc was admitted:
      // the visible store at replay is exactly history's signatures
      val sigsH = Multimodal.aHashBands(h.toSeq.toDF("doc_id", "payload"))
      val truth = keys(Multimodal.phashAdmission(sigsC, sigsH))
      val got = keys(spark.read.parquet(s"$base/out2/batch=0"))
      assert(got == truth,
        s"trial $trial (cut=$cut f=$f sink=$sinkWritten): " +
          s"${got.diff(truth).take(3)} / ${truth.diff(got).take(3)}")
      assert(!got.exists(_._1 == -999L), "partial sink rows must be erased by the replay")
      spark.sql(s"DROP TABLE IF EXISTS $table")
    }
  }

  test("audioTrimStream replays any batch onto a partially-written sink exactly once") {
    val rnd = new Random(20260817L)
    val payloads = Multimodal.mediaPayloadOf(withEdgeDocs(
      Tables.documents(spark, dir).select(col("doc_id"), col("text")))).collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
    for (trial <- 1 to 3) {
      val base = java.nio.file.Files.createTempDirectory(s"graft_ccp_audio$trial").toString
      val n = 1 + rnd.nextInt(payloads.length)
      val c = rnd.shuffle(payloads.toSeq).take(n)
      // crashed first attempt: sink dir holds garbage rows for batch 0
      Seq((-999L, -1L, -1L, -1L, -1L, -1L, -1L))
        .toDF("doc_id", "n_windows", "n_quiet", "longest_quiet",
          "lead_trim", "tail_trim", "kept_samples")
        .write.mode("overwrite").parquet(s"$base/out/batch=0")
      val input = MemoryStream[(Long, Array[Byte])]
      val q = DocStreams.audioTrimStream(
        input.toDS().toDF("doc_id", "payload"), s"$base/out", s"$base/ckpt")
      try { input.addData(c: _*); q.processAllAvailable() } finally q.stop()
      def keys(df: DataFrame) =
        df.collect().map(r => (0 to 6).map(r.getLong).toList).toSet
      val got = keys(spark.read.parquet(s"$base/out/batch=0"))
      val truth = keys(Multimodal.audioTrimReport(c.toDF("doc_id", "payload")))
      assert(got == truth, s"trial $trial (n=$n)")
      assert(!got.exists(_.head == -999L), "garbage sink rows must be erased")
    }
  }

  test("selfMaintainingAdmissionStream survives random crash points (partial index+shingle appends)") {
    val rnd = new Random(20260819L)
    val docs = withEdgeDocs(Tables.documents(spark, dir).select(col("doc_id"), col("text")))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    for (trial <- 1 to 3) {
      val (idxT, shT) = (s"ccp_sma_idx_$trial", s"ccp_sma_sh_$trial")
      spark.sql(s"DROP TABLE IF EXISTS $idxT"); spark.sql(s"DROP TABLE IF EXISTS $shT")
      val base = java.nio.file.Files.createTempDirectory(s"graft_ccp_sma$trial").toString
      val cut = 1 + rnd.nextInt(docs.length - 1)
      val (h, c) = docs.splitAt(cut)
      val (fIdx, sinkWritten) = crashPoint(rnd)
      val (fSh, _) = crashPoint(rnd)

      def drive(ckpt: String, out: String)(b: Seq[(Long, String)]): Unit = {
        val input = MemoryStream[(Long, String)]
        val q = DocStreams.selfMaintainingAdmissionStream(
          input.toDS().toDF("doc_id", "text"),
          idxT, s"$base/idx", shT, s"$base/sh", out, ckpt)
        try { input.addData(b: _*); q.processAllAvailable() } finally q.stop()
      }
      // incarnation 1: history commits as batch 0 — empty index, so ALL of
      // h admits and the persisted state is exactly h's signatures+shingles
      drive(s"$base/ckpt1", s"$base/out1")(h.toSeq)
      // batch-truth verdicts for C against the pre-crash visible state
      val shH = Similarity.shingleDocs(h.toSeq.toDF("doc_id", "text")).localCheckpoint()
      val shC = Similarity.shingleDocs(c.toSeq.toDF("doc_id", "text")).localCheckpoint()
      val truthDf = Similarity.admission(shC, Similarity.bandIndex(shH), shH)
        .localCheckpoint()
      // incarnation 2 crashes inside batch 0 = C AFTER its verdicts sank:
      // random subsets of the ADMITTED docs' index/shingle appends are on
      // disk (doc-id-scoped exclusion must hide them at replay)
      val admittedIds = truthDf.filter(col("admitted")).select(col("doc_id"))
      val shAdm = shC.join(admittedIds, Seq("doc_id"))
      val idxPart = subset(
        Similarity.bandIndex(shAdm), fIdx, Seq("band", "sig", "doc_id2"))
      if (idxPart.count() > 0)
        idxPart.write.mode("append").option("path", s"$base/idx")
          .bucketBy(8, "band", "sig").saveAsTable(idxT)
      val shPart = subset(shAdm.select(col("doc_id"), col("shingles")), fSh, Seq("doc_id"))
      if (shPart.count() > 0)
        shPart.write.mode("append").option("path", s"$base/sh")
          .bucketBy(8, "doc_id").saveAsTable(shT)
      if (sinkWritten)
        Seq((-999L, -1L, Option(0.0), true)).toDF("doc_id", "n_dups", "best_jac", "admitted")
          .write.mode("overwrite").parquet(s"$base/out2/batch=0")
      // restart: C re-delivers as batch 0 of a fresh checkpoint
      drive(s"$base/ckpt2", s"$base/out2")(c.toSeq)

      def keys(df: DataFrame) = df.select("doc_id", "n_dups", "best_jac", "admitted")
        .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)), r.getBoolean(3))).toSet
      val truth = keys(truthDf)
      val got = keys(spark.read.parquet(s"$base/out2/batch=0"))
      assert(got == truth,
        s"trial $trial (cut=$cut fIdx=$fIdx fSh=$fSh sink=$sinkWritten): " +
          s"${got.diff(truth).take(3)} / ${truth.diff(got).take(3)}")
      assert(!got.exists(_._1 == -999L), "partial sink rows must be erased by the replay")
      // store-state convergence: after the replay the dedup'd stores hold
      // exactly history ∪ C-admitted — partial rows were literal duplicates
      val wantIds = h.map(_._1).toSet ++
        truthDf.filter(col("admitted")).collect().map(_.getLong(0)).toSet
      val shIds = Similarity.loadShingleStore(spark, shT)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(shIds == wantIds, s"trial $trial: shingle store diverged from history∪admitted")
      val idxIds = spark.table(idxT).select("doc_id2").distinct()
        .collect().map(_.getLong(0)).toSet
      assert(idxIds == wantIds, s"trial $trial: band index diverged from history∪admitted")
      spark.sql(s"DROP TABLE IF EXISTS $idxT"); spark.sql(s"DROP TABLE IF EXISTS $shT")
    }
  }

  test("templateDfStream survives random crash points after a rebase lineage flip") {
    import graft.operators.TemplateGrams
    val rnd = new Random(20260820L)
    val docs = withEdgeDocs(Tables.documents(spark, dir).select(col("doc_id"), col("text")))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    for (trial <- 1 to 3) {
      val (liveT, rebT) = (s"ccp_tpl_$trial", s"ccp_tplr_$trial")
      spark.sql(s"DROP TABLE IF EXISTS $liveT"); spark.sql(s"DROP TABLE IF EXISTS $rebT")
      val base = java.nio.file.Files.createTempDirectory(s"graft_ccp_tpl$trial").toString
      val cut = 1 + rnd.nextInt(docs.length - 1)
      val (h, c) = docs.splitAt(cut)
      val (f, sinkWritten) = crashPoint(rnd)

      def drive(table: String, store: String, ckpt: String, out: String)(
          b: Seq[(Long, String)]): Unit = {
        val input = MemoryStream[(Long, String)]
        val q = DocStreams.templateDfStream(
          input.toDS().toDF("doc_id", "text"), table, store, out, ckpt)
        try { input.addData(b: _*); q.processAllAvailable() } finally q.stop()
      }
      // incarnation 1: history commits as batch 0, then the lineage flips —
      // rebase re-stamps to batch_id=-1 (the documented precondition for a
      // fresh checkpoint, since the df_before probe excludes by batch_id)
      drive(liveT, s"$base/store", s"$base/ckpt1", s"$base/out1")(h.toSeq)
      DocStreams.rebaseTemplateStore(spark, liveT, rebT, s"$base/store_r")
      // incarnation 2 crashes inside batch 0 = C: a random subset of its
      // gram partials is on disk under the colliding batch id; maybe a
      // partially-written promotions sink
      val partC = TemplateGrams.partialDf(c.toSeq.toDF("doc_id", "text"), "doc_id", "text", 4)
        .localCheckpoint()
      val partial = subset(partC, f, Seq("h"))
      if (partial.count() > 0)
        partial.withColumn("batch_id", lit(0L))
          .write.mode("append").option("path", s"$base/store_r")
          .bucketBy(8, "h").saveAsTable(rebT)
      if (sinkWritten)
        Seq((-999L, -1L, -1L)).toDF("h", "df_before", "df_after")
          .write.mode("overwrite").parquet(s"$base/out2/batch=0")
      // restart: C re-delivers as batch 0 of the fresh lineage
      drive(rebT, s"$base/store_r", s"$base/ckpt2", s"$base/out2")(c.toSeq)

      def dfOf(d: DataFrame) = d.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val pC = dfOf(partC.select(col("h"), col("df_part")))
      val pH = dfOf(
        TemplateGrams.partialDf(h.toSeq.toDF("doc_id", "text"), "doc_id", "text", 4)
          .select(col("h"), col("df_part")))
      val truth = pC.collect {
        case (g, dp) if pH.getOrElse(g, 0L) < 3 && pH.getOrElse(g, 0L) + dp >= 3 =>
          (g, pH.getOrElse(g, 0L), pH.getOrElse(g, 0L) + dp)
      }.toSet
      val got = spark.read.parquet(s"$base/out2/batch=0")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == truth,
        s"trial $trial (cut=$cut f=$f sink=$sinkWritten): " +
          s"${got.diff(truth).take(3)} / ${truth.diff(got).take(3)}")
      assert(!got.exists(_._1 == -999L), "partial sink rows must be erased by the replay")
      // the crashed partial rows are literal duplicates of the replay's
      // committed append — compaction must collapse to the full rebuild
      val rebuild = dfOf(
        TemplateGrams.partialDf(docs.toSeq.toDF("doc_id", "text"), "doc_id", "text", 4)
          .select(col("h"), col("df_part")))
      assert(dfOf(TemplateGrams.mergedDf(spark.table(rebT))) == rebuild,
        s"trial $trial: store must compact to the h∪C rebuild")
      spark.sql(s"DROP TABLE IF EXISTS $liveT"); spark.sql(s"DROP TABLE IF EXISTS $rebT")
    }
  }

  test("triageStream replays any batch onto a partially-written sink exactly once") {
    val rnd = new Random(20260821L)
    val docs = withEdgeDocs(Tables.documents(spark, dir).select(col("doc_id"), col("text")))
    val corpus = docs.filter(col("doc_id") % 3 === 0)
    val fpIndex = corpus.select(Similarity.canonicalFp(col("text")).as("fp"))
      .distinct().localCheckpoint()
    val corpusSh = Similarity.shingleDocs(corpus).localCheckpoint()
    val index = Similarity.bandIndex(corpusSh).localCheckpoint()
    val pool = docs.filter(col("doc_id") % 3 =!= 0).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    for (trial <- 1 to 3) {
      val base = java.nio.file.Files.createTempDirectory(s"graft_ccp_triage$trial").toString
      val n = 1 + rnd.nextInt(pool.length)
      val c = rnd.shuffle(pool.toSeq).take(n)
      Seq((-999L, "garbage")).toDF("doc_id", "verdict")
        .write.mode("overwrite").parquet(s"$base/out/batch=0")
      val input = MemoryStream[(Long, String)]
      val q = DocStreams.triageStream(
        input.toDS().toDF("doc_id", "text"), fpIndex, index, corpusSh,
        s"$base/out", s"$base/ckpt")
      try { input.addData(c: _*); q.processAllAvailable() } finally q.stop()
      def keys(df: DataFrame) = df.select("doc_id", "verdict")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val got = keys(spark.read.parquet(s"$base/out/batch=0"))
      val truth = keys(Similarity.triage(c.toDF("doc_id", "text"), fpIndex, index, corpusSh))
      assert(got == truth, s"trial $trial (n=$n)")
      assert(!got.exists(_._1 == -999L), "garbage sink rows must be erased")
    }
  }

  test("qualityScoreStream replays any batch onto a partially-written sink exactly once") {
    import graft.operators.LmScore
    val rnd = new Random(20260822L)
    val docs = Tables.documents(spark, dir)
    val lm = LmScore.vocab(
      LmScore.tokens(docs.filter(col("lang") === "en"), "doc_id", "text")).localCheckpoint()
    val tv = LmScore.totals(lm).localCheckpoint()
    val pool = withEdgeDocs(docs.select(col("doc_id"), col("text"))).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    for (trial <- 1 to 3) {
      val base = java.nio.file.Files.createTempDirectory(s"graft_ccp_lm$trial").toString
      val n = 1 + rnd.nextInt(pool.length)
      val c = rnd.shuffle(pool.toSeq).take(n)
      Seq((-999L, -1L, -1L)).toDF("doc_id", "n_tok", "avg_nll_micro")
        .write.mode("overwrite").parquet(s"$base/out/batch=0")
      val input = MemoryStream[(Long, String)]
      val q = DocStreams.qualityScoreStream(
        input.toDS().toDF("doc_id", "text"), lm, tv, s"$base/out", s"$base/ckpt")
      try { input.addData(c: _*); q.processAllAvailable() } finally q.stop()
      def keys(df: DataFrame) = df.select("doc_id", "n_tok", "avg_nll_micro")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val got = keys(spark.read.parquet(s"$base/out/batch=0"))
      val truth = keys(LmScore.score(c.toDF("doc_id", "text"), "doc_id", "text", lm, tv))
      assert(got == truth, s"trial $trial (n=$n)")
      assert(!got.exists(_._1 == -999L), "garbage sink rows must be erased")
    }
  }

  test("blocklistStream replays any batch onto a partially-written sink exactly once") {
    val rnd = new Random(20260823L)
    val patterns = Seq("slow", "low", "table", "merge batch")
    val pool = withEdgeDocs(Tables.documents(spark, dir).select(col("doc_id"), col("text")))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    for (trial <- 1 to 3) {
      val base = java.nio.file.Files.createTempDirectory(s"graft_ccp_bl$trial").toString
      val n = 1 + rnd.nextInt(pool.length)
      val c = rnd.shuffle(pool.toSeq).take(n)
      Seq((-999L, -1L, 1)).toDF("doc_id", "n_hits", "blocked")
        .write.mode("overwrite").parquet(s"$base/out/batch=0")
      val input = MemoryStream[(Long, String)]
      val q = DocStreams.blocklistStream(
        input.toDS().toDF("doc_id", "text"), patterns, 4L, s"$base/out", s"$base/ckpt")
      try { input.addData(c: _*); q.processAllAvailable() } finally q.stop()
      def keys(df: DataFrame) = df.select("doc_id", "n_hits", "blocked")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val got = keys(spark.read.parquet(s"$base/out/batch=0"))
      val truth = keys(c.toDF("doc_id", "text")
        .select(col("doc_id"),
          graft.functions.Blocklist.hits(lower(col("text")), patterns).as("n_hits"))
        .withColumn("blocked", (col("n_hits") >= 4L).cast("int")))
      assert(got == truth, s"trial $trial (n=$n)")
      assert(!got.exists(_._1 == -999L), "garbage sink rows must be erased")
    }
  }

  test("dsirWeightStream replays any batch onto a partially-written sink exactly once") {
    import graft.operators.Dsir
    val rnd = new Random(20260824L)
    val docs = Tables.documents(spark, dir)
    val lam = Dsir.lambdaTable(
      Dsir.bucketed(docs.filter(col("lang") === "en"), "doc_id", "text", 256),
      Dsir.bucketed(docs.filter(col("lang") =!= "en"), "doc_id", "text", 256),
      256).localCheckpoint()
    val pool = withEdgeDocs(docs.select(col("doc_id"), col("text"))).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    for (trial <- 1 to 3) {
      val base = java.nio.file.Files.createTempDirectory(s"graft_ccp_dsir$trial").toString
      val n = 1 + rnd.nextInt(pool.length)
      val c = rnd.shuffle(pool.toSeq).take(n)
      Seq((-999L, -1L, -1L)).toDF("doc_id", "n_tok", "logw_micro")
        .write.mode("overwrite").parquet(s"$base/out/batch=0")
      val input = MemoryStream[(Long, String)]
      val q = DocStreams.dsirWeightStream(
        input.toDS().toDF("doc_id", "text"), lam, 256, s"$base/out", s"$base/ckpt")
      try { input.addData(c: _*); q.processAllAvailable() } finally q.stop()
      def keys(df: DataFrame) = df.select("doc_id", "n_tok", "logw_micro")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val got = keys(spark.read.parquet(s"$base/out/batch=0"))
      val truth = keys(Dsir.score(
        Dsir.bucketed(c.toDF("doc_id", "text"), "doc_id", "text", 256), "doc_id", lam))
      assert(got == truth, s"trial $trial (n=$n)")
      assert(!got.exists(_._1 == -999L), "garbage sink rows must be erased")
    }
  }

  test("ivfIngestStream survives random crash points (partial list appends, probe-invariant)") {
    import graft.streaming.VecStreams
    val rnd = new Random(20260825L)
    val e = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val cents = e.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("embedding").as("cemb")).localCheckpoint()
    val queries = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe")).localCheckpoint()
    val vecs = e.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def probe(lists: DataFrame) =
      Similarity.ivfProbe(queries, lists, cents, nprobe = 4, k = 5)
        .collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSet
    for (trial <- 1 to 3) {
      val table = s"ccp_ivf_$trial"
      spark.sql(s"DROP TABLE IF EXISTS $table")
      val base = java.nio.file.Files.createTempDirectory(s"graft_ccp_ivf$trial").toString
      val cut = 1 + rnd.nextInt(vecs.length - 1)
      val (h, c) = vecs.splitAt(cut)
      val (f, _) = crashPoint(rnd)

      def drive(ckpt: String)(b: Seq[(Long, Array[Float])]): Unit = {
        val input = MemoryStream[(Long, Array[Float])]
        val q = VecStreams.ivfIngestStream(
          input.toDS().toDF("vec_id", "embedding"), cents, table, s"$base/store", ckpt)
        try { input.addData(b: _*); q.processAllAvailable() } finally q.stop()
      }
      // incarnation 1: history commits
      drive(s"$base/ckpt1")(h.toSeq)
      // crash inside batch 0 = C: a random f-subset of its list rows is on
      // disk (this store carries NO batch ids — replay safety is ivfProbe's
      // (cid, neighbor_id) candidate dedup, so partials must be invisible)
      val asgC = Similarity.ivfAssign(c.toSeq.toDF("vec_id", "embedding"), cents)
        .localCheckpoint()
      val partial = subset(asgC, f, Seq("cid", "neighbor_id"))
      if (partial.count() > 0)
        partial.write.mode("append").option("path", s"$base/store")
          .bucketBy(8, "cid").saveAsTable(table)
      // restart: C re-delivers as batch 0 of a fresh checkpoint
      drive(s"$base/ckpt2")(c.toSeq)
      spark.catalog.refreshTable(table)
      val got = probe(spark.table(table))
      val truth = probe(
        Similarity.ivfAssign((h ++ c).toSeq.toDF("vec_id", "embedding"), cents))
      assert(got == truth,
        s"trial $trial (cut=$cut f=$f): ${got.diff(truth).take(3)} / ${truth.diff(got).take(3)}")
      assert(got.nonEmpty)
      spark.sql(s"DROP TABLE IF EXISTS $table")
    }
  }

  test("sampleStream replays any committed slice as a no-op at random crash points") {
    import graft.streaming.EventStreams
    val rnd = new Random(20260826L)
    val evs = EventStreams.eventsDataset(spark, dir).collect()
    for (trial <- 1 to 3) {
      val base = java.nio.file.Files.createTempDirectory(s"graft_ccp_smp$trial").toString
      val path = s"$base/sample"
      val nSlices = 2 + rnd.nextInt(3)
      val slices = rnd.shuffle(evs.toSeq).grouped(
        math.max(1, evs.length / nSlices)).toSeq

      def drive(ckpt: String)(bs: Seq[EventStreams.Ev]*): Unit = {
        val input = MemoryStream[EventStreams.Ev]
        val q = EventStreams.sampleStream(input.toDS().toDF(), 64, path, ckpt)
        try bs.foreach { b => input.addData(b: _*); q.processAllAvailable() }
        finally q.stop()
      }
      drive(s"$base/ckpt1")(slices: _*)
      def sampleRows() = spark.read.parquet(path)
        .select("h", "c").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val committed = sampleRows()
      // crash window: the merged overwrite landed but the checkpoint commit
      // didn't — a fresh incarnation re-delivers a RANDOM committed slice
      // against the already-updated sample path; merge's (h, c) dedup must
      // make the replay a byte-level no-op
      val replaySlice = slices(rnd.nextInt(slices.length))
      drive(s"$base/ckpt2")(replaySlice)
      assert(sampleRows() == committed, s"trial $trial: replayed slice moved the sample")
      // and the final sample equals the one-shot batch sample of everything
      val oneShot = graft.operators.BottomKSample.sample(
          evs.toSeq.toDF("event_id", "ts_ns", "user_id", "value"),
          col("event_id"), round(col("value") * 100, 0).cast("long"), k = 64, salt = "qk:")
        .select("h", "c").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(committed == oneShot, s"trial $trial: sample diverged from one-shot batch")
    }
  }

  test("sessionCounts keyed state survives engine restarts at random split points") {
    import graft.streaming.EventStreams
    import org.apache.spark.sql.streaming.OutputMode
    // the one recovery class the foreachBatch sweeps can't exercise: OUR
    // flatMapGroupsWithState session logic restored from the engine's
    // state store across a real query restart (same checkpoint, fresh
    // query object). Slices are TIME-ordered prefixes — sessionCounts's
    // cross-batch contract — with the restart point drawn at random.
    val rnd = new Random(20260827L)
    val evs = EventStreams.eventsDataset(spark, dir).collect()
      .sortBy(e => (e.ts_ns, e.event_id))
    val truth = SparkEntry.queries("q19_sessionize")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    for (trial <- 1 to 2) {
      val base = java.nio.file.Files.createTempDirectory(s"graft_ccp_sess$trial").toString
      val nSlices = 3 + rnd.nextInt(3)
      val slices = evs.grouped(math.max(1, (evs.length + nSlices - 1) / nSlices)).toSeq
      val restartAfter = 1 + rnd.nextInt(slices.length - 1)
      val input = MemoryStream[EventStreams.Ev]
      def start() = EventStreams.sessionCounts(spark, input.toDS())
        .writeStream.format("parquet")
        .option("path", s"$base/out")
        .option("checkpointLocation", s"$base/ckpt")
        .outputMode(OutputMode.Append())
        .start()
      val q1 = start()
      try slices.take(restartAfter).foreach { s =>
        input.addData(s.toSeq: _*); q1.processAllAvailable()
      } finally q1.stop()
      // restart: the state store must hand every user's (lastTs, sessions,
      // events) back to the resumed query — a lost lastTs would split a
      // session at the restart boundary and overcount n_sessions
      val q2 = start()
      try slices.drop(restartAfter).foreach { s =>
        input.addData(s.toSeq: _*); q2.processAllAvailable()
      } finally q2.stop()
      // each emitted row is a user's CUMULATIVE totals; the final truth is
      // the row at max n_events per user (duplicates from a replayed
      // boundary batch are identical rows — distinct collapses them)
      val emitted: Set[(Long, Long, Long)] = spark.read.parquet(s"$base/out")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val finals = emitted.groupBy(_._1).map { case (_, rows) => rows.maxBy(_._3) }.toSet
      assert(finals == truth,
        s"trial $trial (slices=${slices.length} restartAfter=$restartAfter): " +
          s"${finals.diff(truth).take(3)} / ${truth.diff(finals).take(3)}")
    }
  }

  test("scd2Stream keyed state survives engine restarts at random split points") {
    import graft.streaming.EventStreams
    import org.apache.spark.sql.streaming.OutputMode
    // same recovery class as sessionCounts, different state shape: the
    // OPEN dimension version (curType, validFrom, ver, nEvents) must come
    // back from the state store intact — a lost validFrom would emit the
    // next closed version with a wrong boundary, a lost ver would renumber
    // every version after the restart
    val rnd = new Random(20260828L)
    val evs = Tables.events(spark, dir).filter(col("user_id") < 10)
      .select(col("user_id"), col("ts_ns"), col("event_id"), col("event_type"))
      .orderBy("ts_ns", "event_id")
      .as[EventStreams.TypeEv].collect()
    val truth = SparkEntry.queries("t115_scd2_history")(spark, dir)
      .filter(col("valid_to").isNotNull)
      .select("user_id", "ver", "event_type", "valid_from", "valid_to", "n_events")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toSet
    for (trial <- 1 to 2) {
      val base = java.nio.file.Files.createTempDirectory(s"graft_ccp_scd$trial").toString
      val nSlices = 3 + rnd.nextInt(3)
      val slices = evs.grouped(math.max(1, (evs.length + nSlices - 1) / nSlices)).toSeq
      val restartAfter = 1 + rnd.nextInt(slices.length - 1)
      val input = MemoryStream[EventStreams.TypeEv]
      def start() = EventStreams.scd2Stream(spark, input.toDS())
        .writeStream.format("parquet")
        .option("path", s"$base/out")
        .option("checkpointLocation", s"$base/ckpt")
        .outputMode(OutputMode.Append())
        .start()
      val q1 = start()
      try slices.take(restartAfter).foreach { s =>
        input.addData(s.toSeq: _*); q1.processAllAvailable()
      } finally q1.stop()
      val q2 = start()
      try slices.drop(restartAfter).foreach { s =>
        input.addData(s.toSeq: _*); q2.processAllAvailable()
      } finally q2.stop()
      val got = spark.read.parquet(s"$base/out")
        .select("user_id", "ver", "event_type", "valid_from", "valid_to", "n_events")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4), r.getLong(5)))
        .toSet
      assert(got == truth,
        s"trial $trial (slices=${slices.length} restartAfter=$restartAfter): " +
          s"${got.diff(truth).take(3)} / ${truth.diff(got).take(3)}")
      assert(got.nonEmpty)
    }
  }

  test("admissionStream replays any batch onto a partially-written sink exactly once") {
    val rnd = new Random(20260818L)
    val docs = withEdgeDocs(Tables.documents(spark, dir).select(col("doc_id"), col("text")))
    val corpusSh = Similarity.shingleDocs(docs.filter(col("doc_id") % 10 =!= 0))
      .localCheckpoint()
    val index = Similarity.bandIndex(corpusSh).localCheckpoint()
    val pool = docs.filter(col("doc_id") % 10 === 0).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    for (trial <- 1 to 3) {
      val base = java.nio.file.Files.createTempDirectory(s"graft_ccp_adm$trial").toString
      val n = 1 + rnd.nextInt(pool.length)
      val c = rnd.shuffle(pool.toSeq).take(n)
      Seq((-999L, -1L, Option(0.0), true)).toDF("doc_id", "n_dups", "best_jac", "admitted")
        .write.mode("overwrite").parquet(s"$base/out/batch=0")
      val input = MemoryStream[(Long, String)]
      val q = DocStreams.admissionStream(
        input.toDS().toDF("doc_id", "text"), index, corpusSh, s"$base/out", s"$base/ckpt")
      try { input.addData(c: _*); q.processAllAvailable() } finally q.stop()
      def keys(df: DataFrame) = df.select("doc_id", "n_dups", "best_jac", "admitted")
        .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)), r.getBoolean(3))).toSet
      val got = keys(spark.read.parquet(s"$base/out/batch=0"))
      val truth = keys(Similarity.admission(
        Similarity.shingleDocs(c.toDF("doc_id", "text")).localCheckpoint(), index, corpusSh))
      assert(got == truth, s"trial $trial (n=$n)")
      assert(!got.exists(_._1 == -999L), "garbage sink rows must be erased")
    }
  }
}
