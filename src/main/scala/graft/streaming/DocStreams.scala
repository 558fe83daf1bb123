package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

import graft.queries.Similarity

/** Streaming incremental near-dup admission — the live twin of the batch
  * t96 query. New documents arrive as a stream; each micro-batch is signed
  * (map-only MinHash banding) and probed against the PRECOMPUTED static
  * corpus band index, and the per-doc admission verdicts are appended to a
  * parquet sink keyed by batch id (idempotent under micro-batch replay,
  * same contract as EventStreams.startIdempotentSink).
  *
  * This is the production ingestion shape at 100 TB: the corpus index is a
  * persisted, bucketed table that new batches only PROBE (and, once
  * admitted, append to out-of-band); the stream never re-signs or
  * re-pairs the corpus. Because admission verdicts are per-document
  * functions of (batch doc, static index), the union of per-micro-batch
  * outputs equals the one-shot batch admission of the union — proven in
  * StreamingSpec against Similarity.admission itself.
  *
  * Operational note: the self-maintaining loop appends a file per bucket
  * per micro-batch, so at streaming cadence the index accumulates small
  * files without bound. [[Similarity.compactBandIndex]] is the periodic
  * rewrite for exactly this — distinct surviving rows, same bucketing,
  * one file per bucket, optional retention predicate — probe-equivalent
  * by PersistedIndexSpec's compaction proofs; run it between batches (or
  * against a quiesced index snapshot) and flip table names.
  */
object DocStreams {

  /** Start the admission stream: `docs` is a streaming (doc_id, text)
    * frame; the static index/corpusShingles frames are resolved once by
    * the caller — in production the index is
    * `Similarity.loadBandIndex(spark, table)`, the (band, sig)-bucketed
    * table `Similarity.writeBandIndex` maintains by append (see
    * PersistedIndexSpec for the append==rebuild proof). Each
    * verdict batch overwrites `path/batch=<id>` — replayed micro-batches
    * land on the same path, so the sink stays exactly-once. */
  def admissionStream(
      docs: DataFrame,
      index: DataFrame,
      corpusShingles: DataFrame,
      path: String,
      ckpt: String): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // localCheckpoint: admission references the shingled batch from
        // both its probe arm (minhash banding) and its verify arm (exact
        // Jaccard), and without the barrier the per-trigram md5 shingling
        // re-executes per subtree — the dominant per-batch CPU, doubled
        val verdicts = Similarity.admission(
          Similarity.shingleDocs(batch).localCheckpoint(), index, corpusShingles)
        verdicts.write.mode("overwrite").parquet(s"$path/batch=$batchId")
      }
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append())
      .start()

  /** The SELF-MAINTAINING admission stream: like [[admissionStream]], but
    * each micro-batch's ADMITTED documents append their band signatures to
    * the persisted index table and their shingle sets to the verify store,
    * so later micro-batches dedup against everything admitted before them —
    * the complete production ingestion loop, not just a probe of a frozen
    * corpus.
    *
    * Semantics and ordering:
    *  - a batch doc is judged against the index AS OF the start of its
    *    micro-batch; docs within one micro-batch are not compared to each
    *    other (same contract as batch t96 — intra-batch dups admit
    *    together; run a periodic full near-dup pass, or shrink batches, if
    *    that window matters).
    *  - verdicts are MATERIALIZED (eager localCheckpoint + idempotent
    *    batch-id-keyed sink write) BEFORE the appends run, so a batch can
    *    never probe its own freshly appended signatures.
    *  - replay safety: the verdict sink overwrites per batch id, and a
    *    replayed batch recomputes IDENTICAL verdicts even if a previous
    *    attempt appended before crashing — admission excludes index rows
    *    carrying the batch's own doc_ids and counts bucket sizes over
    *    DISTINCT member docs, so neither self-probes nor duplicated rows
    *    from a replayed append can flip a verdict or trip the mega-bucket
    *    cap (pinned in PersistedIndexSpec).
    *  - the mega-bucket guard stays correct as the index grows because
    *    admission counts bucket sizes at probe time (PersistedIndexSpec).
    */
  def selfMaintainingAdmissionStream(
      docs: DataFrame,
      indexTable: String,
      indexPath: String,
      shingleTable: String,
      shinglePath: String,
      path: String,
      ckpt: String): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        // dedup intra-batch re-deliveries up front: one verdict row AND one
        // set of appended index/store rows per doc, no matter how many
        // times the source delivered it inside this micro-batch
        val batchSh = Similarity.shingleDocs(batch.dropDuplicates("doc_id"))
          .localCheckpoint()
        // cold start: before the first append the index/store tables don't
        // exist (writeBandIndex creates them later in this very batch), so
        // probe empty same-schema frames instead of dying on
        // TABLE_OR_VIEW_NOT_FOUND — batch 0 of an empty corpus admits
        // everything, which IS the correct verdict against an empty index
        val idx =
          if (spark.catalog.tableExists(indexTable))
            Similarity.loadBandIndex(spark, indexTable)
          else Similarity.bandIndex(batchSh).limit(0)
        val store =
          if (spark.catalog.tableExists(shingleTable))
            Similarity.loadShingleStore(spark, shingleTable)
          else batchSh.select(col("doc_id"), col("shingles")).limit(0)
        val verdicts = Similarity.admission(batchSh, idx, store)
          .localCheckpoint() // eager: pin verdicts before the index grows
        verdicts.write.mode("overwrite").parquet(s"$path/batch=$batchId")
        val admittedSh = batchSh.join(
          verdicts.filter(col("admitted")).select("doc_id"), Seq("doc_id"))
        Similarity.writeBandIndex(admittedSh, indexTable, indexPath, overwrite = false)
        Similarity.writeShingleStore(admittedSh, shingleTable, shinglePath, overwrite = false)
      }
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append())
      .start()

  /** Streaming LM-quality scoring — the live twin of batch t113: each
    * micro-batch of (doc_id, text) documents is scored against a STATIC
    * fitted unigram LM (vocab + totals, resolved once by the caller — in
    * production a persisted vocabulary table refreshed out-of-band) with
    * the exact batch computation ([[graft.operators.LmScore.score]]).
    * Because each verdict is a per-document function of (doc, static LM),
    * the union of micro-batch outputs equals the one-shot batch scoring of
    * the union — proven in StreamingSpec against the t113 builder itself.
    * Sink is batch-id-keyed parquet (idempotent under replay, same
    * contract as [[admissionStream]]). */
  def qualityScoreStream(
      docs: DataFrame,
      vocab: DataFrame,
      totals: DataFrame,
      path: String,
      ckpt: String): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.operators.LmScore.score(batch, "doc_id", "text", vocab, totals)
          .write.mode("overwrite").parquet(s"$path/batch=$batchId")
      }
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append())
      .start()

  /** Streaming audio triage — the live twin of batch m42: each
    * micro-batch of (doc_id, payload) containers runs the VAD-prep pass
    * ([[graft.queries.Multimodal.audioTrimReport]] — per-window integer
    * energy, quiet runs, head/tail trim plan, one partition-wise scan;
    * payloads never leave executors) and writes the per-doc trim reports
    * to the batch-id-keyed idempotent sink. Per-document purity ⇒
    * micro-batch union == the one-shot batch report (StreamingSpec,
    * against the m42 arm itself) — the completes-the-set twin next to
    * text admission and image phash admission. */
  def audioTrimStream(
      payloads: DataFrame,
      path: String,
      ckpt: String): StreamingQuery =
    payloads.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.queries.Multimodal.audioTrimReport(batch)
          .write.mode("overwrite").parquet(s"$path/batch=$batchId")
      }
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append())
      .start()

  /** Streaming blocklist gate — the live twin of batch t145: each
    * micro-batch runs the one-pass Aho–Corasick scan against a FIXED
    * pattern list (the automaton compiles once per plan; refreshed
    * out-of-band like the LM vocabulary) and writes per-doc
    * (n_hits, blocked) verdicts to the batch-id-keyed idempotent sink.
    * Per-document purity ⇒ micro-batch union == one-shot batch scan
    * (StreamingSpec, against the t145 builder itself). This is the
    * ingest-time kill switch: a document never reaches signing/dedup if
    * the blocklist fires. */
  def blocklistStream(
      docs: DataFrame,
      patterns: Seq[String],
      threshold: Long,
      path: String,
      ckpt: String): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch
          .select(col("doc_id"),
            graft.functions.Blocklist
              .hits(org.apache.spark.sql.functions.lower(col("text")), patterns)
              .as("n_hits"))
          .withColumn("blocked",
            (col("n_hits") >= threshold).cast("int"))
          .write.mode("overwrite").parquet(s"$path/batch=$batchId")
      }
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append())
      .start()

  /** Streaming crawl triage — the live twin of the t156 ingestion
    * decision: each micro-batch of (doc_id, text) documents is judged
    * against a STATIC corpus held as two persisted indexes — the
    * NFC-canonical fingerprint table (q24/t144 shape) for `exact_dup` and
    * the (band, sig)-bucketed admission index + shingle store (t96 shape)
    * for `near_dup` — with precedence exact > near > novel, via the exact
    * batch computation ([[Similarity.triage]]). Per-document purity of the
    * verdict ⇒ micro-batch union == one-shot batch triage of the union
    * (StreamingSpec, against Similarity.triage itself), and the
    * batch-id-keyed overwrite sink makes replays idempotent, same contract
    * as [[admissionStream]].
    *
    * This is the online half of a crawl pipeline: `exact_dup` drops
    * immediately, `near_dup` routes to dedup arbitration, `novel` admits —
    * and admitted docs append to both indexes OUT-OF-BAND (writeBandIndex /
    * the fp table's append), with [[Similarity.compactBandIndex]] as the
    * periodic small-file rewrite, exactly the self-maintaining loop
    * [[selfMaintainingAdmissionStream]] runs for the near index alone. */
  def triageStream(
      docs: DataFrame,
      fpIndex: DataFrame,
      index: DataFrame,
      corpusShingles: DataFrame,
      path: String,
      ckpt: String): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Similarity.triage(batch, fpIndex, index, corpusShingles)
          .write.mode("overwrite").parquet(s"$path/batch=$batchId")
      }
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append())
      .start()

  /** Streaming CDC chunk-level blob dedup — the live, SELF-MAINTAINING
    * twin of batch m39: each micro-batch of (doc_id, payload) GRFT1
    * containers is CDC-chunked and fingerprinted
    * ([[graft.queries.Multimodal.chunkFps]] — the same codegen'd kernel),
    * judged against the persisted chunk-fingerprint store AS OF the start
    * of the micro-batch ([[graft.queries.Multimodal.chunkDedupAgainst]]),
    * and then appends its OWN chunk fps to the store — so later
    * micro-batches dedup against every blob ingested before them. This is
    * the ingestion half of a binary store's dedup-savings accounting:
    * chunk granularity catches the re-encoded/re-crawled near-identical
    * blobs whole-payload md5 (m35 family) misses.
    *
    * Contracts, all inherited from the admission stream:
    *  - a batch's docs are judged against PRIOR state only (intra-batch
    *    chunk sharing is not counted — same window note as t96);
    *  - the report is MATERIALIZED before the append, and the probe
    *    excludes store rows carrying the batch's own (batch_id, doc_id)
    *    pairs, so a replayed batch (append-then-crash, even a PARTIAL
    *    append) recomputes IDENTICAL stats (StreamingSpec) — store rows
    *    carry (doc_id, fp, batch_id) exactly for this. Scoping the
    *    exclusion by batch_id (not doc_id alone) keeps a doc_id that is
    *    legitimately re-ingested in a LATER batch visible to the probe:
    *    its earlier chunks still count as dups instead of the blob
    *    misreporting as fully novel;
    *  - the store is an fp-bucketed table maintained by per-batch APPEND
    *    (the q24/t96 on-disk index shape at chunk granularity); compaction
    *    is the same periodic-rewrite story as the band index;
    *  - LINEAGE CONTRACT: the store's batch_id column is meaningful only
    *    within ONE checkpoint lineage — a fresh checkpoint restarts batch
    *    ids at 0, so attaching a new stream to an existing store risks a
    *    (batch_id, doc_id) collision with an old incarnation's rows (the
    *    probe would hide them and misreport a legitimately re-ingested
    *    blob as novel). Run [[rebaseChunkStore]] before attaching a fresh
    *    checkpoint: it re-stamps every committed row to batch_id = −1,
    *    which no live batch (ids ≥ 0) can ever collide with
    *    (StreamingSpec exercises the rebased re-ingestion). */
  def chunkIndexStream(
      docs: DataFrame,
      storeTable: String,
      storePath: String,
      path: String,
      ckpt: String): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        // intra-batch re-delivery dedup: duplicate doc rows would double
        // the report's n_chunks (the store append already collapses via
        // its own distinct)
        val chunks = graft.queries.Multimodal
          .chunkFps(batch.dropDuplicates("doc_id")).localCheckpoint()
        val store =
          if (spark.catalog.tableExists(storeTable))
            // exclude ONLY this batch's own prior (possibly partial) append:
            // same (batch_id, doc_id), i.e. the append-then-crash window.
            // Rows for the same doc_id written by OTHER batches stay visible.
            spark.table(storeTable).join(
              org.apache.spark.sql.functions.broadcast(
                batch.select(col("doc_id"))
                  .withColumn("batch_id", org.apache.spark.sql.functions.lit(batchId))),
              Seq("doc_id", "batch_id"), "left_anti")
          else chunks.select(col("doc_id"), col("fp")).limit(0)
        val report = graft.queries.Multimodal.chunkDedupAgainst(chunks, store)
          .localCheckpoint() // pin the report before the store grows
        report.write.mode("overwrite").parquet(s"$path/batch=$batchId")
        chunks.select(col("doc_id"), col("fp")).distinct()
          .withColumn("batch_id", org.apache.spark.sql.functions.lit(batchId))
          .write.mode("append")
          .option("path", storePath)
          .bucketBy(8, "fp")
          .saveAsTable(storeTable)
      }
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append())
      .start()

  /** Streaming image near-dup admission — the live twin of batch m41 and
    * the image-modality sibling of [[selfMaintainingAdmissionStream]].
    * Each micro-batch of (doc_id, payload) GRFT1 rasters is hashed
    * partition-wise ([[graft.queries.Multimodal.aHashBands]] — decode +
    * 8×8 average-hash, payloads never leave executors), probed against
    * the persisted signature store
    * ([[graft.queries.Multimodal.phashAdmission]] — banded candidates,
    * probe-time bucket cap, exact Hamming ≤ 6 verify), and the per-doc
    * verdicts land in a batch-id-keyed sink. ADMITTED images append their
    * signatures to the store, so later micro-batches dedup against
    * everything admitted before them — near-identical thumbnails are
    * rejected at ingest instead of at the next full m41 sweep.
    *
    * Crash/replay contract (the chunk-store rules): verdicts are pinned
    * (localCheckpoint + per-batch-id overwrite) BEFORE the append; the
    * store probe excludes rows with THIS (batch_id, doc_id) — the
    * append-then-crash window — and phashAdmission dedups store rows by
    * doc_id, so a replayed batch recomputes identical verdicts and its
    * re-append leaves only probe-invisible duplicates. batch_id is
    * meaningful within one checkpoint lineage; [[rebasePhashStore]]
    * re-stamps (and compacts) before a fresh stream attaches. Signatures
    * are 8 longs per image — the store is metadata-scale next to the
    * payload bytes, and the append is one bucketed write per batch. */
  def imagePhashStream(
      payloads: DataFrame,
      storeTable: String,
      storePath: String,
      path: String,
      ckpt: String): StreamingQuery =
    payloads.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        // dedup intra-batch re-deliveries BEFORE signing: phashAdmission
        // dedups its batch side internally for the verdicts, but the store
        // append below joins THIS frame — without the dedup a doc delivered
        // twice in one micro-batch would append two signature rows under
        // one batch_id (and, if the payloads differed, could append a
        // bands row that was never the judged one). The winner is the
        // lexicographically-largest payload, not dropDuplicates's
        // partition-order pick, so a crash replay re-signs the SAME bytes.
        val sigs = graft.queries.Multimodal
          .aHashBands(batch.groupBy(col("doc_id")).agg(
            org.apache.spark.sql.functions.max(col("payload")).as("payload")))
          .localCheckpoint()
        val store =
          if (spark.catalog.tableExists(storeTable))
            spark.table(storeTable).join(
              org.apache.spark.sql.functions.broadcast(
                batch.select(col("doc_id"))
                  .withColumn("batch_id", org.apache.spark.sql.functions.lit(batchId))),
              Seq("doc_id", "batch_id"), "left_anti")
              .select(col("doc_id"), col("bands"))
          else sigs.limit(0)
        val verdicts = graft.queries.Multimodal.phashAdmission(sigs, store)
          .localCheckpoint() // pin verdicts before the store grows
        verdicts.write.mode("overwrite").parquet(s"$path/batch=$batchId")
        sigs.join(verdicts.filter(col("admitted")).select("doc_id"), Seq("doc_id"))
          .withColumn("batch_id", org.apache.spark.sql.functions.lit(batchId))
          .write.mode("append")
          .option("path", storePath)
          .bucketBy(8, "doc_id")
          .saveAsTable(storeTable)
      }
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append())
      .start()

  /** Rebase an image-signature store onto a new checkpoint lineage:
    * rewrite the per-doc-distinct committed (doc_id, bands) rows with
    * batch_id = −1 into a NEW table+path — the [[rebaseChunkStore]]
    * pattern (−1 collides with no live id, the distinct rewrite doubles
    * as compaction, and the live store stays readable until the caller
    * flips names). */
  def rebasePhashStore(
      spark: org.apache.spark.sql.SparkSession,
      table: String,
      newTable: String,
      newPath: String): Unit =
    spark.table(table)
      .select(col("doc_id"), col("bands")).dropDuplicates("doc_id")
      .withColumn("batch_id", org.apache.spark.sql.functions.lit(-1L))
      .write.mode("overwrite")
      .option("path", newPath)
      .bucketBy(8, "doc_id")
      .saveAsTable(newTable)

  /** Rebase a chunk store onto a new checkpoint lineage: rewrite the
    * distinct committed (doc_id, fp) rows with batch_id = −1 into a NEW
    * table+path (the [[graft.queries.Similarity.compactBandIndex]]
    * crash-safety pattern — the live store stays readable until the
    * caller flips names). −1 collides with no live batch id (ids ≥ 0), so
    * after a rebase every row is permanently visible to probes and a
    * fresh checkpoint can safely restart at batch 0; being a distinct
    * rewrite, this is also the store's compaction (replay-duplicated rows
    * and small files both go away). */
  def rebaseChunkStore(
      spark: org.apache.spark.sql.SparkSession,
      table: String,
      newTable: String,
      newPath: String): Unit =
    spark.table(table)
      .select(col("doc_id"), col("fp")).distinct()
      .withColumn("batch_id", org.apache.spark.sql.functions.lit(-1L))
      .write.mode("overwrite")
      .option("path", newPath)
      .bucketBy(8, "fp")
      .saveAsTable(newTable)

  /** Streaming template-df maintenance — the live twin of batch t165.
    * Each micro-batch appends its PARTIAL per-gram document frequencies
    * (h, df_part, batch_id) to the h-bucketed log-structured store
    * ([[graft.operators.TemplateGrams.partialDf]], the exact batch arm),
    * and emits the batch's PROMOTIONS — grams whose df first crosses the
    * template threshold because of this batch — to `path/batch=<id>`
    * (batch-id-keyed overwrite, so replays land on the same path).
    *
    * Replay/crash contract (the chunk-store rules, df-shaped): the
    * df_before probe excludes rows with THIS batch_id — the
    * append-then-crash window — and collapses literal duplicate rows
    * with `distinct` (a committed batch writes exactly one row per gram,
    * so a replayed append duplicates rows verbatim; see
    * [[graft.operators.TemplateGrams.mergedDf]]). df never decreases, so
    * each gram promotes at most once across the stream's life. batch_id
    * is meaningful only within one checkpoint lineage —
    * [[rebaseTemplateStore]] re-stamps (and compacts) the store before a
    * fresh stream attaches, exactly like [[rebaseChunkStore]]. */
  def templateDfStream(
      docs: DataFrame,
      storeTable: String,
      storePath: String,
      path: String,
      ckpt: String,
      k: Int = 4,
      threshold: Long = 3L): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        import org.apache.spark.sql.functions.{broadcast, coalesce, lit}
        val spark = batch.sparkSession
        // consumed by the report join AND the store append; the barrier
        // also pins the partials before the append changes the store.
        // Intra-batch re-delivery dedup: a doc delivered twice would
        // inflate df_part (df counts DOCUMENTS, not deliveries)
        val part = graft.operators.TemplateGrams
          .partialDf(batch.dropDuplicates("doc_id"), "doc_id", "text", k)
          .withColumn("batch_id", lit(batchId))
          .localCheckpoint()
        val before =
          if (spark.catalog.tableExists(storeTable))
            // restrict the store scan to THIS batch's grams before the
            // compaction aggregate — the probe's cost tracks batch size,
            // not total distinct grams ever seen (chunkIndexStream's
            // broadcast-semi-join shape); mergedDf then applies the one
            // certified replay-collapse + sum
            graft.operators.TemplateGrams.mergedDf(
              spark.table(storeTable)
                .filter(col("batch_id") =!= batchId)
                .join(broadcast(part.select(col("h"))), Seq("h"), "left_semi"))
              .select(col("h"), col("df").as("df_before"))
          else part.select(col("h"), col("df_part").as("df_before")).limit(0)
        val report = part.join(before, Seq("h"), "left")
          .withColumn("df_before", coalesce(col("df_before"), lit(0L)))
          .withColumn("df_after", col("df_before") + col("df_part"))
          .filter(col("df_before") < threshold && col("df_after") >= threshold)
          .select(col("h"), col("df_before"), col("df_after"))
          .localCheckpoint() // pin before the append below grows the store
        report.write.mode("overwrite").parquet(s"$path/batch=$batchId")
        part.select(col("h"), col("df_part"), col("batch_id"))
          .write.mode("append")
          .option("path", storePath)
          .bucketBy(8, "h")
          .saveAsTable(storeTable)
      }
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append())
      .start()

  /** Rebase a template-df store onto a new checkpoint lineage: collapse
    * replay duplicates, sum the partials, and rewrite as single
    * batch_id = −1 rows into a NEW table+path (live ids are ≥ 0, so the
    * rebased rows stay permanently visible to every future probe). Being
    * a distinct+sum rewrite, this is also the store's LSM compaction —
    * run it between batches and flip table names. */
  def rebaseTemplateStore(
      spark: org.apache.spark.sql.SparkSession,
      table: String,
      newTable: String,
      newPath: String): Unit =
    graft.operators.TemplateGrams.mergedDf(spark.table(table))
      .select(col("h"), col("df").as("df_part"))
      .withColumn("batch_id", org.apache.spark.sql.functions.lit(-1L))
      .write.mode("overwrite")
      .option("path", newPath)
      .bucketBy(8, "h")
      .saveAsTable(newTable)

  /** Streaming DSIR weighting — [[qualityScoreStream]]'s importance-
    * resampling sibling: micro-batches score against a PRE-FITTED λ table
    * ([[graft.operators.Dsir.lambdaTable]], refreshed out-of-band like the
    * LM vocabulary) with the exact batch computation, same per-document
    * purity ⇒ micro-batch union == one-shot batch (StreamingSpec). */
  def dsirWeightStream(
      docs: DataFrame,
      lambda: DataFrame,
      buckets: Int,
      path: String,
      ckpt: String): StreamingQuery = {
    // lambdaTable emits exactly b rows by construction; a `buckets` that
    // disagrees with the fitted b would silently drop every token hashing
    // past the table (inner join) for the stream's whole lifetime — fail
    // at start instead. One count() on the static table, once.
    val fitted = lambda.count()
    require(fitted == buckets.toLong,
      s"lambda table was fitted with $fitted buckets but the stream is configured with $buckets")
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.operators.Dsir
          .score(graft.operators.Dsir.bucketed(batch, "doc_id", "text", buckets), "doc_id", lambda)
          .write.mode("overwrite").parquet(s"$path/batch=$batchId")
      }
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append())
      .start()
  }
}
