package graft.streaming

import org.apache.spark.sql.DataFrame
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
        val verdicts =
          Similarity.admission(Similarity.shingleDocs(batch), index, corpusShingles)
        verdicts.write.mode("overwrite").parquet(s"$path/batch=$batchId")
      }
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append())
      .start()
}
