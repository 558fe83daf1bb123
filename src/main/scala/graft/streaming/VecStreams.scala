package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

import graft.queries.Similarity

/** Streaming IVF index ingestion — the live twin of batch t162, and the
  * ANN-side sibling of [[DocStreams.selfMaintainingAdmissionStream]]:
  * each micro-batch of (vec_id, embedding) vectors is coarse-assigned
  * against the STATIC broadcast codebook ([[Similarity.ivfAssign]], the
  * t61/t162 arm verbatim — the codebook is trained offline at cadence, so
  * streaming appends never re-assign existing vectors) and its inverted-
  * list rows are APPENDED to the persisted cid-bucketed table
  * ([[Similarity.writeIvfIndex]]). Searches against the growing index use
  * [[Similarity.ivfProbe]] at any point between batches.
  *
  * Contracts:
  *  - assignment is a pure per-vector function of (vector, codebook), so
  *    the table after any prefix of micro-batches equals the one-shot
  *    rebuild of their union, row for row (StreamingSpec proves probe
  *    results match [[Similarity.ivfProbe]] over the in-memory rebuild
  *    after every batch);
  *  - replay (append-then-crash, full or partial) leaves DUPLICATE list
  *    rows rather than wrong ones — and probes are replay-proof because
  *    [[Similarity.ivfProbe]] deduplicates candidates by
  *    (cid, neighbor_id) before ranking (StreamingSpec replays a batch on
  *    a fresh checkpoint and the probe answers do not move);
  *  - small-file pile-up is the band index's story: the table is
  *    append-only (a file per bucket per batch), and the periodic
  *    distinct-rewrite compaction — which is also what permanently drops
  *    replay duplicates — mirrors [[Similarity.compactBandIndex]];
  *  - reader contract: appends execute in the stream's CLONED session, so
  *    a concurrent reader session's relation cache can hold a stale file
  *    listing — call `spark.catalog.refreshTable(storeTable)` before
  *    probing (StreamingSpec does exactly this between batches).
  */
object VecStreams {

  /** Start the ingest stream: `vecs` is a streaming (vec_id, embedding)
    * frame; `cents` the static (cid, cemb) codebook resolved once by the
    * caller. Each micro-batch appends its assignments to `storeTable`. */
  def ivfIngestStream(
      vecs: DataFrame,
      cents: DataFrame,
      storeTable: String,
      storePath: String,
      ckpt: String): StreamingQuery =
    vecs.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Similarity.writeIvfIndex(
          Similarity.ivfAssign(batch, cents), storeTable, storePath,
          overwrite = false)
      }
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append())
      .start()
}
