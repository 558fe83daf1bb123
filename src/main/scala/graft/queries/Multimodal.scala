package graft.queries

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Multimodal-column plumbing: media is carried as opaque `binary` payloads
  * with typed metadata, and decode/feature-extraction runs as a partition-wise
  * transformation over the binary column.
  *
  * The container has no image/audio codecs, so the decode itself is a
  * *deterministic stub* (`FakeDecode`): features derive only from payload
  * length and bytes. Everything around it — the binary column, the schema, the
  * `mapPartitions` batch shape, partitioning — is the real plumbing you'd keep
  * when swapping in a real decoder. At 100 TB the payloads dominate I/O, so
  * the op projects only (id, payload) before the partition-wise decode, keeps
  * metadata columns pruned, and never collects binaries to the driver.
  */
object Multimodal {

  /** STUB: stand-in for image/audio decode + feature extraction. Deterministic
    * pure function of the payload bytes so the DuckDB oracle can mirror it.
    * A real implementation would decode the payload and emit real features.
    */
  private object FakeDecode {
    def features(payload: Array[Byte]): (Long, Long, Long, Long) = {
      val n = payload.length.toLong
      val checksum = payload.foldLeft(0L)((acc, b) => (acc + (b & 0xffL)) % 65521L) // adler-ish, mirrored in SQL
      (n, n % 640, (n * 7) % 480, checksum)
    }
  }

  private def withPayload(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(col("doc_id"), col("text").cast("binary").as("payload"))

  val all: Seq[Q] = Seq(
    // ----- binary column + typed metadata extraction (pure column ops) -----
    Q(
      "m35_binary_meta",
      (s, d) =>
        withPayload(s, d)
          .select(
            col("doc_id"),
            length(col("payload")).cast("long").as("n_bytes"),
            (length(col("payload")).cast("long") % 640).as("width"),
            ((length(col("payload")).cast("long") * 7) % 480).as("height"),
            (length(col("payload")).cast("long") % 16 + 1).as("n_frames"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             |  CAST(octet_length(encode(text)) % 640 AS BIGINT) AS width,
             |  CAST(octet_length(encode(text)) * 7 % 480 AS BIGINT) AS height,
             |  CAST(octet_length(encode(text)) % 16 + 1 AS BIGINT) AS n_frames
             |FROM documents ORDER BY doc_id""".stripMargin),
    ),

    // ----- partition-wise decode / feature extraction over binary payloads -----
    Q(
      "m36_decode_features",
      (s, d) => {
        val src = withPayload(s, d)
        val outSchema = StructType(Seq(
          StructField("doc_id", LongType),
          StructField("n_bytes", LongType),
          StructField("width", LongType),
          StructField("height", LongType),
          StructField("checksum", LongType)))
        val decoded = src.mapPartitions { rows =>
          rows.map { r =>
            val id = r.getLong(0)
            val payload = r.getAs[Array[Byte]](1)
            val (n, w, h, c) = FakeDecode.features(payload)
            Row(id, n, w, h, c)
          }
        }(RowEncoder.encoderFor(outSchema))
        decoded.orderBy("doc_id")
      },
      // The test corpus is pure ASCII (verified), so the UTF-8 byte sum equals
      // the per-character codepoint sum — expressible in plain SQL.
      // COALESCE: list_sum over an empty list is NULL, but the Spark fold
      // over an empty payload is 0 — an empty document must hash identically.
      Some("""WITH ck AS (
             |  SELECT doc_id, octet_length(encode(text)) AS n,
             |         COALESCE(list_sum(list_transform(generate_series(1, length(text)),
             |                                          i -> unicode(substring(text, i, 1)))), 0) AS bytesum
             |  FROM documents)
             |SELECT doc_id, CAST(n AS BIGINT) AS n_bytes,
             |  CAST(n % 640 AS BIGINT) AS width,
             |  CAST(n * 7 % 480 AS BIGINT) AS height,
             |  CAST(bytesum % 65521 AS BIGINT) AS checksum
             |FROM ck ORDER BY doc_id""".stripMargin),
    ),

    // ----- partition-wise frame sampling over binary payloads -----
    // The video-style access pattern: each payload notionally holds
    // `n_bytes % 16 + 1` frames (m35's metadata convention); every 4th frame
    // is sampled and a 1-byte "feature" read at the frame's offset — a
    // deterministic stand-in for decode-and-sample (see FakeDecode note).
    // The sampler is a flatMap inside mapPartitions (one output row per
    // sampled frame, payloads never leave the executor) followed by a
    // per-doc rollup — the exact shape a real frame-dedup/filter pass has.
    Q(
      "m37_frame_sample",
      (s, d) => {
        val src = withPayload(s, d)
        val outSchema = StructType(Seq(
          StructField("doc_id", LongType),
          StructField("frame_idx", LongType),
          StructField("frame_byte", LongType)))
        val frames = src.mapPartitions { rows =>
          rows.flatMap { r =>
            val id = r.getLong(0)
            val p = r.getAs[Array[Byte]](1)
            val n = p.length
            if (n == 0) Iterator.empty
            else {
              val nFrames = n % 16 + 1
              (0 until nFrames by 4).iterator.map { fi =>
                val off = (fi * 1024) % n
                Row(id, fi.toLong, (p(off) & 0xffL))
              }
            }
          }
        }(RowEncoder.encoderFor(outSchema))
        frames.groupBy(col("doc_id"))
          .agg(
            count(lit(1)).as("n_sampled"),
            max(col("frame_idx")).as("last_frame"),
            sum(col("frame_byte")).as("byte_sum"))
          .orderBy("doc_id")
      },
      // ASCII corpus: the byte at offset i equals the codepoint of the
      // character at i+1 (1-based substring), so the oracle mirrors the
      // sampler in plain SQL.
      Some("""WITH f AS (
             |  SELECT doc_id, octet_length(encode(text)) AS n,
             |         unnest(generate_series(0, octet_length(encode(text)) % 16, 4)) AS fi,
             |         text
             |  FROM documents WHERE octet_length(encode(text)) > 0),
             |b AS (
             |  SELECT doc_id, fi,
             |         unicode(substring(text, CAST((fi * 1024) % n AS INT) + 1, 1)) AS fb
             |  FROM f)
             |SELECT doc_id, COUNT(*) AS n_sampled,
             |  CAST(MAX(fi) AS BIGINT) AS last_frame,
             |  CAST(SUM(fb) AS BIGINT) AS byte_sum
             |FROM b GROUP BY doc_id ORDER BY doc_id""".stripMargin),
    ),

    // ----- partition-wise resize planning over image-style metadata -----
    // The resize step of an image pipeline: from each payload's (width,
    // height) metadata (m35's convention), compute the target dimensions
    // that fit a 224×224 training square while preserving aspect ratio —
    // scale = 224 / max(w, h), targets rounded half-up, never upscaled
    // (scale capped at 1). The arithmetic runs in the same mapPartitions
    // decode pass a real resampler would (the pixel work is the stub; the
    // dimension plan, batch shape, and schema are the real plumbing).
    Q(
      "m38_resize_stub",
      (s, d) => {
        val src = withPayload(s, d)
        val outSchema = StructType(Seq(
          StructField("doc_id", LongType),
          StructField("width", LongType),
          StructField("height", LongType),
          StructField("target_w", LongType),
          StructField("target_h", LongType),
          StructField("scale_pm", LongType))) // scale in per-mille
        val planned = src.mapPartitions { rows =>
          rows.map { r =>
            val id = r.getLong(0)
            // single source of truth for the metadata convention: the same
            // FakeDecode width/height m35/m36 derive, floored to 1 px
            val (_, w0, h0, _) = FakeDecode.features(r.getAs[Array[Byte]](1))
            val w = math.max(w0, 1L)
            val h = math.max(h0, 1L)
            val side = math.max(w, h)
            // integer per-mille scale avoids float disagreement with the
            // oracle; capped at 1000 (never upscale)
            val scalePm = math.min(1000L, (224L * 1000L) / side)
            val tw = (w * scalePm + 500L) / 1000L
            val th = (h * scalePm + 500L) / 1000L
            Row(id, w, h, tw, th, scalePm)
          }
        }(RowEncoder.encoderFor(outSchema))
        planned.orderBy("doc_id")
      },
      Some("""WITH m AS (
             |  SELECT doc_id,
             |    GREATEST(octet_length(encode(text)) % 640, 1) AS w,
             |    GREATEST(octet_length(encode(text)) * 7 % 480, 1) AS h
             |  FROM documents),
             |p AS (
             |  SELECT doc_id, w, h,
             |    LEAST(1000, 224000 // GREATEST(w, h)) AS scale_pm
             |  FROM m)
             |SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
             |  CAST((w * scale_pm + 500) // 1000 AS BIGINT) AS target_w,
             |  CAST((h * scale_pm + 500) // 1000 AS BIGINT) AS target_h,
             |  CAST(scale_pm AS BIGINT) AS scale_pm
             |FROM p ORDER BY doc_id""".stripMargin),
    ),
  )
}
