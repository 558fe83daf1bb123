package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.queries.{Multimodal, Similarity}
import graft.streaming.DocStreams

/** Streaming-twin throughput rehearsal — the evidence class SCALE.md's
  * batch tables can't show: per-MICRO-BATCH wall-clock as the persisted
  * state grows. The correctness story (StreamingSpec, the crash sweep)
  * says the twins compute the right thing; this measures whether the
  * per-batch cost stays bounded by BATCH size (the production contract:
  * a probe that scales with total-state-ever-ingested would melt at
  * streaming cadence) rather than store size.
  *
  *  - `admission`: the static-index twin — corpus = 90% of documents
  *    (shingled + band index, resolved once), stream = the remaining 10%
  *    in `nBatches` equal micro-batches. Expect ~flat per-batch times.
  *  - `chunk`: the SELF-MAINTAINING chunk-dedup twin — every document's
  *    payload streams through in `nBatches` batches, each probing the
  *    store built by all earlier batches and then appending its own
  *    chunks. The store grows linearly; per-batch time must not.
  *
  * Usage: runMain graft.StreamRehearsal <sfDir> <admission|chunk> <nBatches>
  */
object StreamRehearsal {

  def main(args: Array[String]): Unit = {
    val Array(sfDir, twin, nStr) = args.take(3)
    val n = nStr.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val base = java.nio.file.Files.createTempDirectory(s"graft_streamreh_$twin").toString
    val times = scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]
    var docsPerBatch = 0
    var totalDocs = 0

    twin match {
      case "admission" =>
        val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
        val corpusSh = Similarity.shingleDocs(docs.filter(col("doc_id") % 10 =!= 0))
          .localCheckpoint()
        val index = Similarity.bandIndex(corpusSh).localCheckpoint()
        val stream = docs.filter(col("doc_id") % 10 === 0).collect()
          .map(r => (r.getLong(0), r.getString(1)))
        require(stream.nonEmpty, s"no streamable docs (doc_id % 10 == 0) under $sfDir")
        totalDocs = stream.length
        docsPerBatch = math.max(stream.length / n, 1)
        val input = MemoryStream[(Long, String)]
        val q = DocStreams.admissionStream(
          input.toDS().toDF("doc_id", "text"), index, corpusSh,
          s"$base/out", s"$base/ckpt")
        try {
          stream.grouped(docsPerBatch).zipWithIndex.foreach { case (b, i) =>
            val t0 = System.nanoTime()
            input.addData(b.toSeq: _*)
            q.processAllAvailable()
            times += ((i, (System.nanoTime() - t0) / 1e9))
          }
        } finally q.stop()

      case "chunk" =>
        val payloads = Multimodal.mediaPayload(spark, sfDir).collect()
          .map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
        require(payloads.nonEmpty, s"no media payloads under $sfDir")
        totalDocs = payloads.length
        docsPerBatch = math.max(payloads.length / n, 1)
        spark.sql("DROP TABLE IF EXISTS streamreh_chunk")
        val input = MemoryStream[(Long, Array[Byte])]
        val q = DocStreams.chunkIndexStream(
          input.toDS().toDF("doc_id", "payload"),
          "streamreh_chunk", s"$base/store", s"$base/out", s"$base/ckpt")
        try {
          payloads.grouped(docsPerBatch).zipWithIndex.foreach { case (b, i) =>
            val t0 = System.nanoTime()
            input.addData(b.toSeq: _*)
            q.processAllAvailable()
            times += ((i, (System.nanoTime() - t0) / 1e9))
          }
        } finally q.stop()
        spark.sql("DROP TABLE IF EXISTS streamreh_chunk")

      case "triage" =>
        // the full ingest decision (exact-dup fp probe + near-dup band
        // probe + Jaccard verify) against a static 90%-corpus pair of
        // indexes — the most production-like twin
        val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
        val corpus = docs.filter(col("doc_id") % 10 =!= 0)
        val corpusSh = Similarity.shingleDocs(corpus).localCheckpoint()
        val index = Similarity.bandIndex(corpusSh).localCheckpoint()
        val fpIndex = corpus
          .select(Similarity.canonicalFp(col("text")).as("fp")).distinct()
          .localCheckpoint()
        val stream = docs.filter(col("doc_id") % 10 === 0).collect()
          .map(r => (r.getLong(0), r.getString(1)))
        require(stream.nonEmpty, s"no streamable docs (doc_id % 10 == 0) under $sfDir")
        totalDocs = stream.length
        docsPerBatch = math.max(stream.length / n, 1)
        val input = MemoryStream[(Long, String)]
        val q = DocStreams.triageStream(
          input.toDS().toDF("doc_id", "text"), fpIndex, index, corpusSh,
          s"$base/out", s"$base/ckpt")
        try {
          stream.grouped(docsPerBatch).zipWithIndex.foreach { case (b, i) =>
            val t0 = System.nanoTime()
            input.addData(b.toSeq: _*)
            q.processAllAvailable()
            times += ((i, (System.nanoTime() - t0) / 1e9))
          }
        } finally q.stop()

      case "selfadmission" =>
        // the self-maintaining text twin: BOTH the band index and the
        // shingle store grow within the run (every admitted doc appends);
        // per-batch time must stay batch-scoped as state accumulates
        val stream = Tables.documents(spark, sfDir)
          .select(col("doc_id"), col("text")).collect()
          .map(r => (r.getLong(0), r.getString(1)))
        require(stream.nonEmpty, s"no documents under $sfDir")
        totalDocs = stream.length
        docsPerBatch = math.max(stream.length / n, 1)
        spark.sql("DROP TABLE IF EXISTS streamreh_idx")
        spark.sql("DROP TABLE IF EXISTS streamreh_sh")
        val input = MemoryStream[(Long, String)]
        val q = DocStreams.selfMaintainingAdmissionStream(
          input.toDS().toDF("doc_id", "text"),
          "streamreh_idx", s"$base/idx", "streamreh_sh", s"$base/sh",
          s"$base/out", s"$base/ckpt")
        try {
          stream.grouped(docsPerBatch).zipWithIndex.foreach { case (b, i) =>
            val t0 = System.nanoTime()
            input.addData(b.toSeq: _*)
            q.processAllAvailable()
            times += ((i, (System.nanoTime() - t0) / 1e9))
          }
        } finally q.stop()
        spark.sql("DROP TABLE IF EXISTS streamreh_idx")
        spark.sql("DROP TABLE IF EXISTS streamreh_sh")

      case other => sys.error(s"unknown twin: $other")
    }

    val secs = times.map(_._2).toSeq
    println(f"${"batch"}%-7s sec")
    times.foreach { case (i, s) => println(f"$i%-7d $s%6.2f") }
    val total = secs.sum
    // throughput over the ACTUAL doc count — the remainder batch is
    // smaller than docsPerBatch and must not be counted as full
    println(f"docs/batch=$docsPerBatch  total=$total%.1f s  " +
      f"throughput=${totalDocs / total}%.0f docs/s  " +
      f"first=${secs.head}%.2f  last=${secs.last}%.2f  " +
      f"last/first=${secs.last / secs.head}%.2f")
    spark.stop()
  }
}
