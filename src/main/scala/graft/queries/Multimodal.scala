package graft.queries

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Multimodal-column plumbing: media is carried as opaque `binary` payloads
  * with typed metadata, and decode/feature-extraction runs as a partition-wise
  * transformation over the binary column.
  *
  * Payloads here are real parseable containers, not hashes: every payload is
  * a GRFT1 container (fixed 14-byte header + body) and every "decode" below
  * genuinely parses the header with byte arithmetic — magic check, u16/u32
  * little-endian field reads — exactly as a BMP/WAV-style reader would. The
  * only synthetic part is WHERE the bytes come from: the container has no
  * image/audio codecs and the test corpus has no media files, so the ingest
  * fixture ([[mediaPayload]]) wraps each document's UTF-8 bytes as the body
  * and derives the header fields deterministically from the body length (the
  * generator contract the DuckDB oracles mirror). Swap the fixture for real
  * files and every operator below runs unchanged.
  *
  * At 100 TB the payloads dominate I/O, so each op projects only
  * (id, payload) before the partition-wise decode, keeps metadata columns
  * pruned, and never collects binaries to the driver.
  */
object Multimodal {

  /** GRFT1 container layout (little-endian):
    * {{{
    * bytes 0-3   magic 'G' 'R' 'F' 'T'
    * byte  4     version  (1)
    * bytes 5-6   width    u16  = body_len % 640
    * bytes 7-8   height   u16  = body_len * 7 % 480
    * byte  9     channels u8   = body_len % 3 + 1
    * bytes 10-13 body_len u32
    * bytes 14-   body (document UTF-8 bytes in the test fixture)
    * }}}
    * The width/height/channels derivations are the test-data generator
    * contract that lets the SQL oracles predict the header from `text`
    * alone; the Spark side never uses them — it parses the bytes.
    */
  val HeaderLen = 14

  /** Build one GRFT1 payload. Exposed for specs. */
  def packPayload(body: Array[Byte]): Array[Byte] = {
    val n = body.length
    val width = n % 640
    val height = (n.toLong * 7 % 480).toInt
    val channels = n % 3 + 1
    val p = new Array[Byte](HeaderLen + n)
    p(0) = 'G'; p(1) = 'R'; p(2) = 'F'; p(3) = 'T'
    p(4) = 1
    p(5) = (width & 0xff).toByte; p(6) = ((width >> 8) & 0xff).toByte
    p(7) = (height & 0xff).toByte; p(8) = ((height >> 8) & 0xff).toByte
    p(9) = channels.toByte
    p(10) = (n & 0xff).toByte; p(11) = ((n >> 8) & 0xff).toByte
    p(12) = ((n >> 16) & 0xff).toByte; p(13) = ((n >> 24) & 0xff).toByte
    System.arraycopy(body, 0, p, HeaderLen, n)
    p
  }

  /** Parsed GRFT1 header. Exposed for specs and the partition-wise decoders. */
  final case class Header(width: Long, height: Long, channels: Long, bodyLen: Long)

  /** Parse + validate a GRFT1 header with plain byte arithmetic. Fails loudly
    * on corrupt input — a media pipeline quarantines, it never guesses. */
  def parseHeader(p: Array[Byte]): Header = {
    def u8(i: Int): Long = p(i) & 0xffL
    require(p.length >= HeaderLen &&
      p(0) == 'G' && p(1) == 'R' && p(2) == 'F' && p(3) == 'T',
      s"not a GRFT1 payload (magic mismatch, len=${p.length})")
    require(p(4) == 1, s"unsupported GRFT version ${p(4)}")
    val bodyLen = u8(10) | (u8(11) << 8) | (u8(12) << 16) | (u8(13) << 24)
    require(bodyLen == p.length - HeaderLen,
      s"body length field $bodyLen != actual ${p.length - HeaderLen}")
    Header(u8(5) | (u8(6) << 8), u8(7) | (u8(8) << 8), u8(9), bodyLen)
  }

  /** Ingest fixture: each document's UTF-8 bytes wrapped in a GRFT1
    * container, built partition-wise — payloads originate as bytes on
    * executors (as they would reading real media files) and never visit
    * the driver. */
  /** (doc_id, fp, clen) CDC chunk fingerprints of a (doc_id, payload)
    * frame — the shared kernel of m39 and the streaming chunk-index twin
    * ([[graft.streaming.DocStreams.chunkIndexStream]]). Boundaries come
    * from the codegen'd CdcKit scan; fps are md5 over the HEX of the
    * payload slice (not the raw bytes: DuckDB's md5 takes VARCHAR only,
    * and a CDC boundary can split a multi-byte UTF-8 char, so no
    * text-substring md5 can reproduce a raw byte-slice hash — md5∘hex is
    * the same fingerprint-grade id both engines can compute over ANY
    * bytes; see EDGE.md). Zero-length bodies chunk to NO rows (the pinned
    * CdcSpec choice), which also keeps `slice(ends, 1, size-1)` off the
    * size=0 negative-length edge. */
  def chunkFps(payloads: DataFrame): DataFrame =
    payloads
      .withColumn("ends", graft.functions.Cdc.chunkEnds(col("payload")))
      .filter(size(col("ends")) > 0)
      .withColumn("starts",
        concat(array(lit(1L)),
          transform(expr("slice(ends, 1, size(ends) - 1)"), _ + 1L)))
      .select(col("doc_id"), col("payload"),
        explode(arrays_zip(col("starts"), col("ends"))).as("z"))
      .select(col("doc_id"),
        md5(expr("hex(substring(payload, cast(z.starts + 14 as int), cast(z.ends - z.starts + 1 as int)))"))
          .as("fp"),
        (col("z.ends") - col("z.starts") + 1L).as("clen"))

  /** Per-doc chunk-dedup report of a batch against a STATIC chunk store:
    * (doc_id, n_chunks, n_dup_chunks, dup_bytes) where a chunk is "dup"
    * iff its fingerprint exists in the store. A pure per-document
    * function of (doc chunks, store) — which is what makes the streaming
    * twin's micro-batch outputs equal the per-batch batch computation
    * (StreamingSpec). Store rows carry (doc_id, fp) so a replayed
    * micro-batch can exclude its OWN previously-appended chunks — the
    * admission stream's replay-idempotence contract, at chunk
    * granularity. */
  def chunkDedupAgainst(batchChunks: DataFrame, store: DataFrame): DataFrame = {
    val hits = store.select(col("fp")).distinct().withColumn("__hit", lit(1))
    batchChunks
      .join(hits, Seq("fp"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("__hit") === 1, 1L).otherwise(0L)).as("n_dup_chunks"),
        sum(when(col("__hit") === 1, col("clen")).otherwise(0L)).as("dup_bytes"))
  }

  /** P6 PPM header: "P6", then width/height/maxval as ASCII decimal tokens
    * separated by whitespace runs, then exactly ONE whitespace byte before
    * the binary RGB triplets — the public netpbm layout. */
  final case class Ppm(width: Int, height: Int, maxval: Int, pixOff: Int)

  /** Parse a P6 PPM header starting at `off`, with real tokenizer semantics
    * (arbitrary whitespace runs, `#` comment lines — the netpbm spec), and
    * validate that exactly width*height*3 pixel bytes follow. Fails loudly
    * on anything else: quarantine, never guess. */
  def parsePpm(p: Array[Byte], off: Int): Ppm = {
    require(p.length >= off + 2 && p(off) == 'P' && p(off + 1) == '6',
      s"not a P6 raster at offset $off")
    var i = off + 2
    def isWs(b: Byte) = b == ' ' || b == '\n' || b == '\r' || b == '\t'
    def nextInt(): Int = {
      while (i < p.length && (isWs(p(i)) || p(i) == '#')) {
        if (p(i) == '#') { while (i < p.length && p(i) != '\n') i += 1 }
        else i += 1
      }
      require(i < p.length && p(i) >= '0' && p(i) <= '9', s"PPM: expected digit at $i")
      var v = 0
      while (i < p.length && p(i) >= '0' && p(i) <= '9') { v = v * 10 + (p(i) - '0'); i += 1 }
      v
    }
    val w = nextInt(); val h = nextInt(); val mv = nextInt()
    require(i < p.length && isWs(p(i)), "PPM: missing whitespace after maxval")
    i += 1 // exactly one whitespace byte, per spec
    require(mv == 255, s"unsupported PPM maxval $mv")
    // zero-pixel rasters would "validate" the byte count below and then
    // blow up downstream as a division by zero — quarantine here instead
    require(w >= 1 && h >= 1, s"PPM: degenerate dimensions ${w}x$h")
    require(p.length - i == w * h * 3,
      s"PPM: ${p.length - i} pixel bytes for ${w}x$h x3")
    Ppm(w, h, mv, i)
  }

  /** Raster fixture for the decode→resize path (m38): each document becomes
    * a GRFT1 container whose BODY is a real P6 PPM — ASCII header plus
    * w*h*3 binary RGB bytes, dims w = n%48+1, h = n*7%32+1 (n = text byte
    * count), pixel byte k = the text byte at k % n. The generator contract
    * lets the SQL oracle predict every pixel from `text`, while the Spark
    * side parses and resamples the ACTUAL bytes. Built partition-wise like
    * [[mediaPayload]]; payloads never visit the driver. */
  private[graft] def rasterPayload(s: SparkSession, d: String): DataFrame =
    rasterPayloadOf(Tables.documents(s, d))

  /** [[rasterPayload]] over ANY (…, doc_id, text, …) frame — the injection
    * point the crash-sweep spec uses to feed edge-class documents through
    * the raster twins. */
  private[graft] def rasterPayloadOf(docs: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("payload", BinaryType)))
    docs.select(col("doc_id"), col("text"))
      .filter(length(col("text")) > 0)
      .mapPartitions { rows =>
        rows.map { r =>
          val t = r.getString(1).getBytes(StandardCharsets.UTF_8)
          val n = t.length
          val w = n % 48 + 1
          val h = n * 7 % 32 + 1
          val hdr = s"P6\n$w $h\n255\n".getBytes(StandardCharsets.UTF_8)
          val body = new Array[Byte](hdr.length + w * h * 3)
          System.arraycopy(hdr, 0, body, 0, hdr.length)
          var k = 0
          while (k < w * h * 3) { body(hdr.length + k) = t(k % n); k += 1 }
          Row(r.getLong(0), packPayload(body))
        }
      }(RowEncoder.encoderFor(outSchema))
  }

  private[graft] def mediaPayload(s: SparkSession, d: String): DataFrame =
    mediaPayloadOf(Tables.documents(s, d))

  /** [[mediaPayload]] over ANY (…, doc_id, text, …) frame (see
    * [[rasterPayloadOf]]). */
  private[graft] def mediaPayloadOf(docs: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("payload", BinaryType)))
    docs.select(col("doc_id"), col("text"))
      .mapPartitions { rows =>
        rows.map { r =>
          Row(r.getLong(0), packPayload(r.getString(1).getBytes(StandardCharsets.UTF_8)))
        }
      }(RowEncoder.encoderFor(outSchema))
  }

  /** One header byte as a long, 1-based position — pure column ops
    * (substring on binary → hex → conv), codegen-friendly, no UDF. */
  private def u8(pos: Int): Column =
    conv(hex(expr(s"substring(payload, $pos, 1)")), 16, 10).cast("long")

  /** REAL file ingest: GRFT1 containers as files on storage, read with
    * Spark's `binaryFile` source — the production entry point the
    * [[mediaPayload]] fixture stands in for. Each file becomes one
    * (doc_id, payload) row: doc_id from the file name, payload = the raw
    * bytes (`content`). The source prunes columns like any other
    * (selecting only `path` skips the byte read entirely), pathGlobFilter
    * prunes foreign files at listing time, and files stream through
    * executors without visiting the driver — so every m35–m38 operator
    * runs UNCHANGED on this frame (proven in MultimodalSpec).
    * spark.sql.files.maxPartitionBytes governs file-to-task packing at
    * scale exactly as for parquet. */
  def binaryFileIngest(s: SparkSession, dir: String): DataFrame =
    s.read.format("binaryFile")
      .option("pathGlobFilter", "*.grft")
      .load(dir)
      .select(
        regexp_extract(col("path"), "doc_(\\d+)\\.grft$", 1).as("__digits"),
        col("path"), col("content"))
      .select(
        // a .grft file outside the doc_<id>.grft naming contract fails
        // LOUDLY by path (quarantine semantics, same as a corrupt header)
        // instead of yielding a null id that NPEs namelessly downstream.
        // try_cast, not cast: a digit run overflowing Long would satisfy
        // the regexp but null out under a plain cast (ANSI off), slipping
        // the exact nameless-null this guard exists to stop — try_cast
        // nulls deterministically in BOTH ANSI modes and the null lands in
        // the raise_error arm with the path in the message
        when(col("__digits") === "" || expr("try_cast(__digits AS BIGINT)").isNull,
          raise_error(concat(
            lit("not a doc_<id>.grft file (rename or exclude it): "), col("path")))
            .cast("long"))
          .otherwise(expr("try_cast(__digits AS BIGINT)"))
          .as("doc_id"),
        col("content").as("payload"))

  /** Per-doc 8×8 average-hash over a decoded raster frame (m41): parse the
    * GRFT1 container and the P6 PPM body, nearest-neighbor-sample an 8×8
    * grayscale grid (gray = r+g+b, exact integers — no luma weights, so the
    * SQL oracle stays integer-exact), threshold each cell against the grid
    * mean with the strict integer rule 64·g > Σg, and pack the 64 bits as
    * 8 one-byte band values (band k carries cells 8k..8k+7; bit j = cell
    * 8k+j). The 8-value-per-band layout is the t32 SimHash banding shape:
    * band equality is the LSH candidate key and Hamming ≤ 7 detection is
    * pigeonhole-guaranteed by 8 bands before the bucket cap. Returns
    * (doc_id, bands: array<long>[8]) from ONE partition-wise pass —
    * payloads never leave executors, no shuffle to compute signatures. */
  private[graft] def aHashBands(payloads: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("bands", ArrayType(LongType, containsNull = false))))
    payloads.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val p = r.getAs[Array[Byte]](1)
        parseHeader(p) // container validation (magic/version/body_len)
        val img = parsePpm(p, HeaderLen)
        val g = new Array[Long](64)
        var total = 0L
        var k = 0
        while (k < 64) {
          val sy = k / 8 * img.height / 8
          val sx = k % 8 * img.width / 8
          val base = img.pixOff + (sy * img.width + sx) * 3
          g(k) = (p(base) & 0xffL) + (p(base + 1) & 0xffL) + (p(base + 2) & 0xffL)
          total += g(k)
          k += 1
        }
        val bands = new Array[Long](8)
        k = 0
        while (k < 64) {
          if (g(k) * 64L > total) bands(k / 8) |= 1L << (k % 8)
          k += 1
        }
        Row(id, bands.toSeq)
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** Image near-dup ADMISSION of a batch of aHash signatures against a
    * STATIC signature store — the asymmetric (batch ⋈ store) form of m41's
    * pair report, shared by the batch query's machinery and the streaming
    * ingest twin ([[graft.streaming.DocStreams.imagePhashStream]]).
    * Returns one row per batch doc: (doc_id, n_dups, admitted) where
    * n_dups counts store images within Hamming 6 and admitted = no match.
    *
    * Contracts the streaming loop relies on:
    *  - per-document purity: each verdict is a function of (batch doc,
    *    store) only — batch docs are NOT compared to each other (t96's
    *    intra-batch contract), so per-micro-batch outputs equal the batch
    *    computation at the same boundaries;
    *  - replay robustness: the store is deduped by doc_id up front, so
    *    literal duplicate rows from a crashed-and-replayed append cannot
    *    flip a verdict or inflate the bucket cap;
    *  - the mega-bucket guard (store buckets > 64 skipped) is counted at
    *    probe time over the DEDUPED store, so it stays correct as the
    *    store grows — same probe-time rule as t96's band index. */
  def phashAdmission(batchSigs: DataFrame, storeSigs: DataFrame): DataFrame = {
    // dedup with a DETERMINISTIC winner (lexicographically-largest bands
    // array), not dropDuplicates: when a re-delivery carries a DIFFERENT
    // payload for the same doc_id, dropDuplicates keeps whichever row a
    // partition scan saw first, so a crash replay could judge a different
    // signature than the crashed attempt — one-row-per-doc would hold but
    // which row would not. max over the orderable array pins the choice.
    def keepMaxBands(sigs: DataFrame): DataFrame =
      sigs.groupBy(col("doc_id")).agg(max(col("bands")).as("bands"))
    val store = keepMaxBands(storeSigs)
    // the batch is deduped for the same replay-robustness reason as the
    // store: a source that re-delivers a doc inside one micro-batch would
    // otherwise produce duplicate verdict rows (and imagePhashStream would
    // append duplicate admitted signatures under one batch_id), breaking
    // the one-row-per-batch-doc contract
    val batch = keepMaxBands(batchSigs)
    val sb = store.select(col("doc_id").as("s_id"),
      posexplode(col("bands")).as(Seq("band_idx", "band_val")))
    val caps = sb.groupBy(col("band_idx"), col("band_val"))
      .agg(count(lit(1)).as("bsize"))
      .filter(col("bsize") <= 64)
      .select("band_idx", "band_val")
    val bb = batch.select(col("doc_id").as("b_id"),
      posexplode(col("bands")).as(Seq("band_idx", "band_val")))
    val cand = bb
      .join(sb.join(caps, Seq("band_idx", "band_val")), Seq("band_idx", "band_val"))
      .select("b_id", "s_id").distinct()
    val dups = cand
      .join(batch.select(col("doc_id").as("b_id"), col("bands").as("ab")), "b_id")
      .join(store.select(col("doc_id").as("s_id"), col("bands").as("sb2")), "s_id")
      .withColumn("hamming", expr(
        "aggregate(zip_with(ab, sb2, (x, y) -> bit_count(x ^ y)), 0L, (acc, v) -> acc + CAST(v AS BIGINT))"))
      .filter(col("hamming") <= 6)
      .groupBy(col("b_id")).agg(count(lit(1)).as("nd"))
    batch.select(col("doc_id"))
      .join(dups.withColumnRenamed("b_id", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("nd"), lit(0L)).as("n_dups"))
      .withColumn("admitted", col("n_dups") === 0L)
  }

  /** m41's pair machinery over a corpus dir: decode + aHash signatures
    * ([[aHashBands]]), t32-shaped banded candidates with the [2, 64]
    * bucket cap, exact Hamming ≤ 6 verify — (a_id, b_id, hamming) with
    * a_id < b_id. Shared by the pair report (m41) and the cluster/keep-one
    * arm (m43). */
  private[graft] def phashPairs(s: SparkSession, d: String): DataFrame = {
    val sigs = aHashBands(rasterPayload(s, d)).localCheckpoint()
    val bandRows = sigs.select(col("doc_id"),
      posexplode(col("bands")).as(Seq("band_idx", "band_val")))
    val capped = bandRows.groupBy(col("band_idx"), col("band_val"))
      .agg(count(lit(1)).as("bsize"))
      .filter(col("bsize") >= 2 && col("bsize") <= 64)
      .select("band_idx", "band_val")
    val kept = bandRows.join(capped, Seq("band_idx", "band_val"))
    val cand = kept.select(col("band_idx"), col("band_val"), col("doc_id").as("a_id"))
      .join(kept.select(col("band_idx"), col("band_val"), col("doc_id").as("b_id")),
        Seq("band_idx", "band_val"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
    cand
      .join(sigs.select(col("doc_id").as("a_id"), col("bands").as("ab")), "a_id")
      .join(sigs.select(col("doc_id").as("b_id"), col("bands").as("bb")), "b_id")
      // 8 fixed-width elements per candidate — the interpreted-HOF cost
      // is bounded by the candidate ceiling, not the corpus
      .withColumn("hamming", expr(
        "aggregate(zip_with(ab, bb, (x, y) -> bit_count(x ^ y)), 0L, (acc, v) -> acc + CAST(v AS BIGINT))"))
      .filter(col("hamming") <= 6)
      .select(col("a_id"), col("b_id"), col("hamming"))
  }

  /** The m41 oracle's shared CTE chain (through `ham`): every sampled
    * pixel rebuilt from the raster generator contract, integer NN
    * sampling, strict 64·g > Σg threshold, byte-band packing, [2, 64]
    * cap, Hamming verify. Interpolated by the m41, m43, and m44 oracles
    * so the pair arithmetic cannot drift between them (the
    * minhashPairsSqlCtes pattern). `docFilter` restricts the corpus
    * BEFORE hashing/banding — m44's bounded certification slice. */
  private def phashPairsSqlCtes(docFilter: String = ""): String =
    s"""m AS (
      |  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n,
      |    octet_length(encode(text)) % 48 + 1 AS w,
      |    octet_length(encode(text)) * 7 % 32 + 1 AS h
      |  FROM documents WHERE octet_length(encode(text)) > 0$docFilter),
      |cells AS (
      |  SELECT doc_id, n, w, h, hx, unnest(generate_series(0, 63)) AS k FROM m),
      |g AS (
      |  SELECT doc_id, k,
      |      CAST('0x' || substring(hx, 2 * CAST(((((k // 8) * h // 8) * w + ((k % 8) * w // 8)) * 3 + 0) % n AS INT) + 1, 2) AS BIGINT)
      |    + CAST('0x' || substring(hx, 2 * CAST(((((k // 8) * h // 8) * w + ((k % 8) * w // 8)) * 3 + 1) % n AS INT) + 1, 2) AS BIGINT)
      |    + CAST('0x' || substring(hx, 2 * CAST(((((k // 8) * h // 8) * w + ((k % 8) * w // 8)) * 3 + 2) % n AS INT) + 1, 2) AS BIGINT)
      |      AS gray
      |  FROM cells),
      |tot AS (SELECT doc_id, SUM(gray) AS total FROM g GROUP BY doc_id),
      |bits AS (
      |  SELECT g.doc_id, g.k, CASE WHEN 64 * g.gray > t.total THEN 1 ELSE 0 END AS bit
      |  FROM g JOIN tot t ON g.doc_id = t.doc_id),
      |bands AS (
      |  SELECT doc_id, k // 8 AS band_idx, CAST(SUM(bit << (k % 8)) AS BIGINT) AS band_val
      |  FROM bits GROUP BY doc_id, k // 8),
      |capped AS (
      |  SELECT band_idx, band_val FROM (
      |    SELECT band_idx, band_val, COUNT(*) AS cnt FROM bands GROUP BY 1, 2)
      |  WHERE cnt BETWEEN 2 AND 64),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
      |  FROM bands a JOIN capped c USING (band_idx, band_val)
      |               JOIN bands b USING (band_idx, band_val)
      |  WHERE a.doc_id < b.doc_id),
      |hsh AS (
      |  SELECT doc_id, list(band_val ORDER BY band_idx) AS bv FROM bands GROUP BY doc_id),
      |ham AS (
      |  SELECT a_id, b_id,
      |    CAST(list_sum(list_transform(generate_series(1, 8), i ->
      |      bit_count(xor(CAST(xa.bv[i] AS BIGINT), CAST(xb.bv[i] AS BIGINT))))) AS BIGINT)
      |      AS hamming
      |  FROM cand JOIN hsh xa ON xa.doc_id = a_id JOIN hsh xb ON xb.doc_id = b_id)""".stripMargin

  /** m42's audio VAD-prep pass over ANY (doc_id, payload) frame — per-doc
    * window energies, quiet runs, and the head/tail trim plan, all in one
    * partition-wise sequential scan (a pure per-document function, which
    * is what makes the streaming twin's micro-batch union equal the
    * one-shot batch report —
    * [[graft.streaming.DocStreams.audioTrimStream]]). */
  private[graft] def audioTrimReport(payloads: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("n_windows", LongType),
      StructField("n_quiet", LongType),
      StructField("longest_quiet", LongType),
      StructField("lead_trim", LongType),
      StructField("tail_trim", LongType),
      StructField("kept_samples", LongType)))
    payloads.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val p = r.getAs[Array[Byte]](1)
        parseHeader(p)
        val n = p.length - HeaderLen
        val nw = n / 64
        var quiet = 0L
        var longest = 0L
        var run = 0L
        var firstLoud = -1L
        var lastLoud = -1L
        var w = 0
        while (w < nw) {
          var e = 0L
          var i = 0
          while (i < 64) {
            val v = (p(HeaderLen + w * 64 + i) & 0xff) - 128
            e += (v * v).toLong
            i += 1
          }
          if (e < 125000L) {
            quiet += 1; run += 1
            if (run > longest) longest = run
          } else {
            run = 0
            if (firstLoud < 0) firstLoud = w
            lastLoud = w
          }
          w += 1
        }
        val lead = if (firstLoud < 0) nw.toLong else firstLoud
        val tail = if (lastLoud < 0) 0L else nw - 1L - lastLoud
        val kept = math.max(nw - lead - tail, 0L) * 64L
        Row(id, nw.toLong, quiet, longest, lead, tail, kept)
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** m36's decode pass over ANY (doc_id, payload) frame — shared by the
    * fixture-driven query and the binaryFile ingest path. */
  private[graft] def decodeFeatures(payloads: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("width", LongType),
      StructField("height", LongType),
      StructField("channels", LongType),
      StructField("body_len", LongType),
      StructField("checksum", LongType)))
    payloads.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val p = r.getAs[Array[Byte]](1)
        val h = parseHeader(p)
        var acc = 0L
        var i = HeaderLen
        while (i < p.length) { acc = (acc + (p(i) & 0xffL)) % 65521L; i += 1 }
        Row(id, h.width, h.height, h.channels, h.bodyLen, acc)
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  val all: Seq[Q] = Seq(
    // ----- m35: header parse with pure column ops (no partition-wise pass) -----
    // Typed-metadata extraction straight off the binary column: magic and
    // version are checked as a filter (a real reader drops foreign blobs),
    // and width/height/channels/body_len are little-endian byte reads
    // composed from substring+hex+conv — all codegen'd, zero UDFs, so the
    // scan stays inside whole-stage codegen and prunes to (doc_id, payload).
    Q(
      "m35_binary_meta",
      (s, d) => {
        val bodyLen = u8(11) + u8(12) * 256 + u8(13) * 65536 + u8(14) * 16777216
        mediaPayload(s, d)
          .filter(u8(1) === 71 && u8(2) === 82 && u8(3) === 70 && u8(4) === 84 &&
            u8(5) === 1) // 'G','R','F','T', version 1
          .select(
            col("doc_id"),
            length(col("payload")).cast("long").as("n_bytes"),
            (u8(6) + u8(7) * 256).as("width"),
            (u8(8) + u8(9) * 256).as("height"),
            u8(10).as("channels"),
            bodyLen.as("body_len"),
            (bodyLen % 16 + 1).as("n_frames"))
          .orderBy("doc_id")
      },
      // The oracle predicts the header from the generator contract (it sees
      // only `text`); the Spark side parses the actual bytes. ASCII corpus:
      // octet_length(encode(text)) is the body length.
      Some("""SELECT doc_id,
             |  CAST(octet_length(encode(text)) + 14 AS BIGINT) AS n_bytes,
             |  CAST(octet_length(encode(text)) % 640 AS BIGINT) AS width,
             |  CAST(octet_length(encode(text)) * 7 % 480 AS BIGINT) AS height,
             |  CAST(octet_length(encode(text)) % 3 + 1 AS BIGINT) AS channels,
             |  CAST(octet_length(encode(text)) AS BIGINT) AS body_len,
             |  CAST(octet_length(encode(text)) % 16 + 1 AS BIGINT) AS n_frames
             |FROM documents ORDER BY doc_id""".stripMargin),
    ),

    // ----- m36: partition-wise decode / feature extraction -----
    // The real decode shape: project (id, payload), then one mapPartitions
    // pass that parses the header (magic/version/length validation included)
    // and folds a checksum over the body bytes — the stand-in for the pixel
    // work a codec would do, computed from the same parsed byte ranges a
    // codec would read. Payloads never leave the executor.
    Q(
      "m36_decode_features",
      (s, d) => decodeFeatures(mediaPayload(s, d)).orderBy("doc_id"),
      // Byte-exact oracle: the body is the text's UTF-8 BYTES, so the sum
      // runs over hex(encode(text)) byte pairs — NOT per-character
      // codepoints, which only coincide with bytes on an ASCII corpus (the
      // edge corpus's CJK/emoji docs diverged under the old codepoint
      // approximation; see EDGE.md). COALESCE: list_sum over an empty list
      // is NULL, but the fold over an empty body is 0.
      Some("""WITH ck AS (
             |  SELECT doc_id, octet_length(encode(text)) AS n, hex(encode(text)) AS hx
             |  FROM documents),
             |s AS (
             |  SELECT doc_id, n,
             |         COALESCE(list_sum(list_transform(generate_series(1, n),
             |           i -> CAST('0x' || substring(hx, 2*i - 1, 2) AS BIGINT))), 0) AS bytesum
             |  FROM ck)
             |SELECT doc_id,
             |  CAST(n % 640 AS BIGINT) AS width,
             |  CAST(n * 7 % 480 AS BIGINT) AS height,
             |  CAST(n % 3 + 1 AS BIGINT) AS channels,
             |  CAST(n AS BIGINT) AS body_len,
             |  CAST(bytesum % 65521 AS BIGINT) AS checksum
             |FROM s ORDER BY doc_id""".stripMargin),
    ),

    // ----- m37: partition-wise frame sampling over binary payloads -----
    // The video-style access pattern: each container notionally holds
    // `body_len % 16 + 1` frames; every 4th frame is sampled and a 1-byte
    // "feature" read at the frame's body offset — the decode-and-sample
    // shape with the header genuinely parsed per payload. The sampler is a
    // flatMap inside mapPartitions (one output row per sampled frame,
    // payloads never leave the executor) followed by a per-doc rollup —
    // the exact shape a real frame-dedup/filter pass has.
    Q(
      "m37_frame_sample",
      (s, d) => {
        val outSchema = StructType(Seq(
          StructField("doc_id", LongType),
          StructField("frame_idx", LongType),
          StructField("frame_byte", LongType)))
        val frames = mediaPayload(s, d).mapPartitions { rows =>
          rows.flatMap { r =>
            val id = r.getLong(0)
            val p = r.getAs[Array[Byte]](1)
            val h = parseHeader(p)
            val n = h.bodyLen.toInt
            if (n == 0) Iterator.empty
            else {
              val nFrames = n % 16 + 1
              (0 until nFrames by 4).iterator.map { fi =>
                val off = (fi * 1024) % n
                Row(id, fi.toLong, (p(HeaderLen + off) & 0xffL))
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
      // Byte-exact oracle: the sampled "feature" is the body BYTE at a byte
      // offset, read from hex(encode(text)) — a codepoint-at-char-index
      // read only matches on ASCII (see m36 / EDGE.md).
      Some("""WITH f AS (
             |  SELECT doc_id, octet_length(encode(text)) AS n, hex(encode(text)) AS hx,
             |         unnest(generate_series(0, octet_length(encode(text)) % 16, 4)) AS fi
             |  FROM documents WHERE octet_length(encode(text)) > 0),
             |b AS (
             |  SELECT doc_id, fi,
             |         CAST('0x' || substring(hx, 2 * CAST((fi * 1024) % n AS INT) + 1, 2) AS BIGINT) AS fb
             |  FROM f)
             |SELECT doc_id, COUNT(*) AS n_sampled,
             |  CAST(MAX(fi) AS BIGINT) AS last_frame,
             |  CAST(SUM(fb) AS BIGINT) AS byte_sum
             |FROM b GROUP BY doc_id ORDER BY doc_id""".stripMargin),
    ),

    // ----- m38: decode → resize-plan → ACTUAL nearest-neighbor resample -----
    // The full resize step of an image pipeline, end to end on real bytes:
    // each payload's body is a genuine P6 PPM raster ([[rasterPayload]] —
    // ASCII header + binary RGB triplets, the public netpbm layout); one
    // mapPartitions pass parses the GRFT1 container, parses the P6 header
    // with real tokenizer semantics ([[parsePpm]]), plans the aspect-
    // preserving fit into a 16×16 thumbnail square (integer per-mille
    // scale, rounded half-up, never upscaled — the same arithmetic as a
    // 224-square training plan; the fixture rasters are ≤48×32 so a 224
    // target would never downscale), and then EXECUTES the resample:
    // nearest-neighbor source mapping sx = ⌊tx·w/tw⌋ over the actual pixel
    // bytes, all integer, so the SQL oracle (which predicts the pixels
    // from the generator contract) is exact. Output per doc: the parsed
    // dims, the plan, and the resampled-byte count/sum — the checksum a
    // thumbnail-generation stage would verify. Payloads never leave the
    // executor; the pass is projection-pruned to (doc_id, payload).
    Q(
      "m38_resize",
      (s, d) => {
        val outSchema = StructType(Seq(
          StructField("doc_id", LongType),
          StructField("width", LongType),
          StructField("height", LongType),
          StructField("target_w", LongType),
          StructField("target_h", LongType),
          StructField("scale_pm", LongType), // scale in per-mille
          StructField("n_px", LongType),
          StructField("px_sum", LongType)))
        rasterPayload(s, d).mapPartitions { rows =>
          rows.map { r =>
            val id = r.getLong(0)
            val p = r.getAs[Array[Byte]](1)
            parseHeader(p) // container validation (magic/version/body_len)
            val img = parsePpm(p, HeaderLen)
            val w = img.width.toLong
            val h = img.height.toLong
            val scalePm = math.min(1000L, 16000L / math.max(w, h))
            val tw = math.max(1L, (w * scalePm + 500L) / 1000L)
            val th = math.max(1L, (h * scalePm + 500L) / 1000L)
            var sum = 0L
            var ty = 0L
            while (ty < th) {
              val sy = ty * h / th
              var tx = 0L
              while (tx < tw) {
                val sx = tx * w / tw
                val base = img.pixOff + ((sy * w + sx) * 3L).toInt
                sum += (p(base) & 0xffL) + (p(base + 1) & 0xffL) + (p(base + 2) & 0xffL)
                tx += 1
              }
              ty += 1
            }
            Row(id, w, h, tw, th, scalePm, tw * th * 3L, sum)
          }
        }(RowEncoder.encoderFor(outSchema)).orderBy("doc_id")
      },
      // The oracle reconstructs every sampled pixel from the generator
      // contract (pixel byte k = text byte at k % n, n = UTF-8 BYTE count),
      // mirrors the integer plan and NN mapping, and sums — byte-exact on
      // any corpus via hex(encode(text)) (the old length(text)/codepoint
      // form was ASCII-only; see EDGE.md).
      Some("""WITH m AS (
             |  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n,
             |    octet_length(encode(text)) % 48 + 1 AS w,
             |    octet_length(encode(text)) * 7 % 32 + 1 AS h
             |  FROM documents WHERE octet_length(encode(text)) > 0),
             |p AS (
             |  SELECT *, LEAST(1000, 16000 // GREATEST(w, h)) AS spm FROM m),
             |p2 AS (
             |  SELECT *, GREATEST(1, (w * spm + 500) // 1000) AS tw,
             |            GREATEST(1, (h * spm + 500) // 1000) AS th
             |  FROM p),
             |ys AS (SELECT *, unnest(generate_series(0, th - 1)) AS ty FROM p2),
             |xs AS (SELECT *, unnest(generate_series(0, tw - 1)) AS tx FROM ys),
             |cs AS (SELECT *, unnest([0, 1, 2]) AS c FROM xs),
             |v AS (
             |  SELECT doc_id, w, h, tw, th, spm,
             |    CAST('0x' || substring(hx,
             |      2 * CAST((((ty * h // th) * w + (tx * w // tw)) * 3 + c) % n AS INT) + 1,
             |      2) AS BIGINT) AS b
             |  FROM cs)
             |SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
             |  CAST(tw AS BIGINT) AS target_w, CAST(th AS BIGINT) AS target_h,
             |  CAST(spm AS BIGINT) AS scale_pm,
             |  CAST(COUNT(*) AS BIGINT) AS n_px,
             |  CAST(SUM(b) AS BIGINT) AS px_sum
             |FROM v GROUP BY doc_id, w, h, tw, th, spm ORDER BY doc_id""".stripMargin),
    ),

    // ----- m39: content-defined chunk dedup over binary payloads -----
    // The blob-level dedup arm: CDC boundaries (functions/Cdc.scala — LBFS
    // rolling-hash chunking) re-synchronize after edits, so near-identical
    // payloads share most chunks where whole-blob md5 (m35-family) shares
    // none. Per doc: chunk count, chunks also present in ≥2 docs, and the
    // bytes those shared chunks cover — the dedup-savings report a binary
    // store runs. The per-byte scan is one codegen'd kernel pass; chunk
    // ids are md5 over the payload SLICE (ASCII fixture ⇒ the oracle's
    // text-substring md5 is byte-identical). The chunk table is
    // corpus-byte-scale and consumed twice (fp stats + join back), hence
    // one localCheckpoint; both the stats agg and the join shuffle on the
    // 16-byte fp — at 100 TB exactly the dedup-index shape of q24/t34,
    // with chunk granularity instead of doc granularity.
    Q(
      "m39_cdc_chunks",
      (s, d) => {
        val ch = chunkFps(mediaPayload(s, d)).localCheckpoint()
        val df = ch.groupBy(col("fp"))
          .agg(count_distinct(col("doc_id")).as("n_docs"))
        ch.join(df, Seq("fp"))
          .groupBy(col("doc_id"))
          .agg(
            count(lit(1)).as("n_chunks"),
            sum(when(col("n_docs") >= 2, 1L).otherwise(0L)).as("n_dup_chunks"),
            sum(when(col("n_docs") >= 2, col("clen")).otherwise(0L)).as("dup_bytes"))
          .orderBy("doc_id")
      },
      // Byte-exact oracle: the rolling hash runs over UTF-8 BYTE values
      // (hex(encode(text)) pairs) and the chunk fp is md5 over the HEX of
      // the byte slice — matching chunkFps exactly on any corpus; the old
      // text-substring form was ASCII-only (see EDGE.md).
      Some("""WITH d AS (SELECT doc_id, hex(encode(text)) AS hx,
             |                 octet_length(encode(text)) AS n FROM documents
             |          WHERE octet_length(encode(text)) > 0),
             |bl AS (
             |  SELECT doc_id, hx, n,
             |    list_transform(generate_series(1, n),
             |      i -> CAST('0x' || substring(hx, 2*i - 1, 2) AS BIGINT)) AS bs
             |  FROM d),
             |b AS (
             |  SELECT doc_id, hx, n,
             |    list_sort(list_distinct(list_append(
             |      list_filter(generate_series(8, n), i ->
             |        (list_sum(list_transform(generate_series(0, 7), j ->
             |           bs[i - j]
             |             * [1,31,961,29791,923521,28629151,887503681,27512614111][j+1]))
             |         % 2147483647) % 16 = 0),
             |      n))) AS ends
             |  FROM bl),
             |c AS (
             |  SELECT doc_id, hx, unnest(generate_series(1, len(ends))) AS ord, ends
             |  FROM b),
             |c2 AS (
             |  SELECT doc_id, hx, ends[ord] AS e,
             |    CASE WHEN ord = 1 THEN 1 ELSE ends[ord - 1] + 1 END AS s
             |  FROM c),
             |ch AS (
             |  SELECT doc_id, md5(substring(hx, 2*s - 1, 2*(e - s + 1))) AS fp,
             |         e - s + 1 AS clen
             |  FROM c2),
             |df AS (SELECT fp, COUNT(DISTINCT doc_id) AS n_docs FROM ch GROUP BY fp)
             |SELECT ch.doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
             |  CAST(SUM(CASE WHEN df.n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
             |  CAST(SUM(CASE WHEN df.n_docs >= 2 THEN ch.clen ELSE 0 END) AS BIGINT) AS dup_bytes
             |FROM ch JOIN df ON ch.fp = df.fp
             |GROUP BY ch.doc_id ORDER BY ch.doc_id""".stripMargin),
    ),

    // ----- m40: incremental blob ingest vs a persisted chunk store -----
    // The batch form of the chunk-index ingestion decision
    // (DocStreams.chunkIndexStream is its live twin, same
    // [[chunkFps]]/[[chunkDedupAgainst]] arms): the existing blob store is
    // the doc_id % 3 = 0 slice's chunk fingerprints; each INCOMING blob
    // reports how many of its chunks (and how many bytes) the store
    // already holds — the dedup-savings number a binary store quotes
    // before admitting an upload. Scale shape: the store probe is a
    // hash semi-ish left join on 16-byte fps (the q24 index shape at
    // chunk granularity, fp-bucketed on disk in the streaming form), the
    // report agg is doc-keyed; nothing is corpus×corpus.
    Q(
      "m40_chunk_ingest",
      (s, d) => {
        val all = chunkFps(mediaPayload(s, d)).localCheckpoint()
        val store = all.filter(col("doc_id") % 3 === 0)
        val incoming = all.filter(col("doc_id") % 3 =!= 0)
        chunkDedupAgainst(incoming, store).orderBy("doc_id")
      },
      // Byte-exact oracle: the rolling hash runs over UTF-8 BYTE values
      // (hex(encode(text)) pairs) and the chunk fp is md5 over the HEX of
      // the byte slice — matching chunkFps exactly on any corpus; the old
      // text-substring form was ASCII-only (see EDGE.md).
      Some("""WITH d AS (SELECT doc_id, hex(encode(text)) AS hx,
             |                 octet_length(encode(text)) AS n FROM documents
             |          WHERE octet_length(encode(text)) > 0),
             |bl AS (
             |  SELECT doc_id, hx, n,
             |    list_transform(generate_series(1, n),
             |      i -> CAST('0x' || substring(hx, 2*i - 1, 2) AS BIGINT)) AS bs
             |  FROM d),
             |b AS (
             |  SELECT doc_id, hx, n,
             |    list_sort(list_distinct(list_append(
             |      list_filter(generate_series(8, n), i ->
             |        (list_sum(list_transform(generate_series(0, 7), j ->
             |           bs[i - j]
             |             * [1,31,961,29791,923521,28629151,887503681,27512614111][j+1]))
             |         % 2147483647) % 16 = 0),
             |      n))) AS ends
             |  FROM bl),
             |c AS (
             |  SELECT doc_id, hx, unnest(generate_series(1, len(ends))) AS ord, ends
             |  FROM b),
             |c2 AS (
             |  SELECT doc_id, hx, ends[ord] AS e,
             |    CASE WHEN ord = 1 THEN 1 ELSE ends[ord - 1] + 1 END AS s
             |  FROM c),
             |ch AS (
             |  SELECT doc_id, md5(substring(hx, 2*s - 1, 2*(e - s + 1))) AS fp,
             |         e - s + 1 AS clen
             |  FROM c2),
             |store AS (SELECT DISTINCT fp FROM ch WHERE doc_id % 3 = 0),
             |inc AS (SELECT * FROM ch WHERE doc_id % 3 <> 0)
             |SELECT inc.doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
             |  CAST(SUM(CASE WHEN store.fp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_dup_chunks,
             |  CAST(SUM(CASE WHEN store.fp IS NOT NULL THEN inc.clen ELSE 0 END) AS BIGINT)
             |    AS dup_bytes
             |FROM inc LEFT JOIN store ON inc.fp = store.fp
             |GROUP BY inc.doc_id ORDER BY inc.doc_id""".stripMargin),
    ),

    // ----- m41: image near-dup via perceptual hash over decoded pixels -----
    // The image half of the dedup story, end to end on real bytes: decode
    // every raster (GRFT1 + P6 PPM, [[aHashBands]]) into an 8×8 average-hash
    // and report all pairs within Hamming 6 — the near-identical-thumbnail
    // pairs an image-dedup pass drops (crops/recompressions hash close,
    // unrelated images expect Hamming ≈ 32). Candidates come from t32's
    // SimHash banding shape on the hash's 8 one-byte bands (pigeonhole:
    // Hamming ≤ 7 pairs collide in ≥ 1 band) with the [2, 64] bucket cap
    // applied identically in both engines, then the exact Hamming verify
    // runs only on banded candidates.
    //
    // Scale: the signature pass is shuffle-free; candidate generation
    // shuffles once on (band_idx, band_val). The band universe is CLOSED
    // (8×256 buckets), so the cap turns the in-bucket quadratic into a hard
    // ~4.1M-candidate ceiling at ANY corpus size — the t32 trade-off: at
    // 100 TB the cap is the recall knob and a production deployment widens
    // the hash (256-bit pHash → 16-bit bands) exactly as t32's 64-bit
    // fingerprint widened t31's; the certification harness for that choice
    // is t112's. Verify is 8 codegen'd xor+bit_count ops per candidate.
    // Measured at sf0.1: 415k capped candidates → 967 pairs (830 exact).
    Q(
      "m41_image_phash",
      (s, d) => phashPairs(s, d).orderBy("a_id", "b_id"),
      // The oracle rebuilds every sampled pixel from the raster generator
      // contract (pixel byte k = text byte at k % n — ASCII corpus, so
      // byte == codepoint), mirrors the integer NN sampling, the strict
      // 64·g > Σg threshold, the byte-band packing, the [2, 64] cap, and
      // the Hamming verify — every step integer, so the match is exact.
      Some(s"""WITH ${phashPairsSqlCtes()}
             |SELECT a_id, b_id, hamming FROM ham WHERE hamming <= 6
             |ORDER BY a_id, b_id""".stripMargin),
    ),

    // ----- m42: audio-style energy scan + silence-trim plan -----
    // The audio leg of the modality triple (image = m38/m41, video-ish
    // frame access = m37): treat each container's body as 8-bit unsigned
    // PCM samples and run the standard VAD-prep pass — per 64-sample
    // window the exact integer energy Σ(s−128)², a quiet threshold, the
    // longest quiet run, and the head/tail trim plan (leading/trailing
    // quiet windows) with the post-trim sample count. One partition-wise
    // pass computes ALL of it per doc (the gaps-and-islands logic is a
    // sequential scan over that doc's windows — no window functions, no
    // shuffle; payloads never leave executors). The trailing partial
    // window is deliberately ignored (floor(n/64) windows) so both
    // engines see identical window sets.
    Q(
      "m42_audio_energy",
      (s, d) => audioTrimReport(mediaPayload(s, d)).orderBy("doc_id"),
      // Byte-exact oracle: samples are the body's UTF-8 BYTES read from
      // hex(encode(text)) — the codepoint-at-char-index form was
      // ASCII-only (see m36 / EDGE.md) — and the oracle rebuilds every
      // sample, mirrors the integer energy and threshold, and derives the
      // runs with the classic w − ROW_NUMBER() islands trick.
      Some("""WITH d AS (
             |  SELECT doc_id, hex(encode(text)) AS hx,
             |         octet_length(encode(text)) AS n FROM documents),
             |w AS (
             |  SELECT doc_id, hx, unnest(generate_series(0, n // 64 - 1)) AS w
             |  FROM d WHERE n >= 64),
             |smp AS (
             |  SELECT doc_id, w, hx, unnest(generate_series(1, 64)) AS i FROM w),
             |en AS (
             |  SELECT doc_id, w,
             |    SUM((CAST('0x' || substring(hx, 2 * CAST(w * 64 + i AS INT) - 1, 2) AS BIGINT) - 128)
             |      * (CAST('0x' || substring(hx, 2 * CAST(w * 64 + i AS INT) - 1, 2) AS BIGINT) - 128)) AS energy
             |  FROM smp GROUP BY doc_id, w),
             |q AS (
             |  SELECT doc_id, w, CASE WHEN energy < 125000 THEN 1 ELSE 0 END AS quiet
             |  FROM en),
             |runs AS (
             |  SELECT doc_id, w, quiet,
             |    w - ROW_NUMBER() OVER (PARTITION BY doc_id, quiet ORDER BY w) AS grp
             |  FROM q),
             |qruns AS (
             |  SELECT doc_id, COUNT(*) AS len FROM runs WHERE quiet = 1
             |  GROUP BY doc_id, grp),
             |lr AS (SELECT doc_id, MAX(len) AS longest FROM qruns GROUP BY doc_id),
             |agg AS (
             |  SELECT doc_id, COUNT(*) AS nw, SUM(quiet) AS n_quiet,
             |    MIN(CASE WHEN quiet = 0 THEN w END) AS first_loud,
             |    MAX(CASE WHEN quiet = 0 THEN w END) AS last_loud
             |  FROM q GROUP BY doc_id),
             |f AS (
             |  SELECT d.doc_id,
             |    COALESCE(agg.nw, 0) AS n_windows,
             |    COALESCE(agg.n_quiet, 0) AS n_quiet,
             |    COALESCE(lr.longest, 0) AS longest_quiet,
             |    CASE WHEN agg.nw IS NULL THEN 0
             |         WHEN agg.first_loud IS NULL THEN agg.nw
             |         ELSE agg.first_loud END AS lead_trim,
             |    CASE WHEN agg.nw IS NULL OR agg.last_loud IS NULL THEN 0
             |         ELSE agg.nw - 1 - agg.last_loud END AS tail_trim
             |  FROM d LEFT JOIN agg ON d.doc_id = agg.doc_id
             |         LEFT JOIN lr ON d.doc_id = lr.doc_id)
             |SELECT CAST(doc_id AS BIGINT) AS doc_id,
             |  CAST(n_windows AS BIGINT) AS n_windows,
             |  CAST(n_quiet AS BIGINT) AS n_quiet,
             |  CAST(longest_quiet AS BIGINT) AS longest_quiet,
             |  CAST(lead_trim AS BIGINT) AS lead_trim,
             |  CAST(tail_trim AS BIGINT) AS tail_trim,
             |  CAST(GREATEST(n_windows - lead_trim - tail_trim, 0) * 64 AS BIGINT)
             |    AS kept_samples
             |FROM f ORDER BY doc_id""".stripMargin),
    ),

    // ----- m43: image dedup selection (clusters + keep-one) -----
    // The step after m41's pair report, mirroring what t49/t87 do for
    // text: group the verified Hamming ≤ 6 pairs into connected
    // components (operators.ConnectedComponents.largeSmallStar — O(log n)
    // rounds, hot-star collapse) and report each near-identical image
    // cluster with its canonical survivor (min doc_id = the component
    // label) and how many copies a keep-one pass drops. Only docs that
    // appear in a pair show up — singletons are implicitly kept.
    Q(
      "m43_image_dedup_select",
      (s, d) => {
        // checkpoint: largeSmallStar unions the edge list with its flip,
        // and both branches would otherwise re-run the whole decode +
        // banding + verify subtree
        val pairs = phashPairs(s, d).select("a_id", "b_id").localCheckpoint()
        graft.operators.ConnectedComponents
          .largeSmallStar(pairs, "a_id", "b_id")
          .groupBy(col("component").as("keep_id"))
          .agg(count(lit(1)).as("n_members"))
          .withColumn("n_dropped", col("n_members") - 1L)
          .orderBy("keep_id")
      },
      // Oracle: m41's shared pair CTEs + the t49 recursive-closure
      // pattern (transitive reach over the tiny verified pair set, min
      // reachable id = component), rolled up per component.
      Some(s"""WITH RECURSIVE ${phashPairsSqlCtes()},
             |p AS (SELECT a_id, b_id FROM ham WHERE hamming <= 6),
             |e AS (SELECT a_id AS a, b_id AS b2 FROM p
             |      UNION ALL SELECT b_id, a_id FROM p),
             |reach(id, r) AS (
             |  SELECT a, a FROM e
             |  UNION
             |  SELECT reach.id, e.b2 FROM reach JOIN e ON reach.r = e.a),
             |comp AS (SELECT id, MIN(r) AS keep_id FROM reach GROUP BY id)
             |SELECT keep_id, CAST(COUNT(*) AS BIGINT) AS n_members,
             |  CAST(COUNT(*) - 1 AS BIGINT) AS n_dropped
             |FROM comp GROUP BY keep_id ORDER BY keep_id""".stripMargin),
    ),

    // ----- m44: image-banding recall certification -----
    // Completes the certification pattern for the image modality — every
    // probabilistic candidate stage in the engine carries an oracle-gated
    // recall contract (IVF t92, MinHash-LSH t102/t161, SimHash t112; now
    // aHash banding): exact Hamming ≤ 6 truth from a BOUNDED all-pairs arm
    // (doc_id < 500 — the t102 slice contract; the production path never
    // runs this) against m41's banded candidates with the [2, 64] bucket
    // cap priced inside the measured arm, both restricted to the slice.
    // Recall/precision in basis points. Unlike MinHash banding (a
    // per-band probabilistic hash), the 8-band pigeonhole is EXHAUSTIVE at
    // Hamming ≤ 7 (t112's argument), so the only possible loss is the
    // bucket cap — exactly what this certifies.
    Q(
      "m44_image_recall",
      (s, d) => {
        val sigs = aHashBands(rasterPayload(s, d))
          .filter(col("doc_id") < 500).localCheckpoint()
        def hamming = expr(
          "aggregate(zip_with(ab, bb, (x, y) -> bit_count(x ^ y)), 0L, (acc, v) -> acc + CAST(v AS BIGINT))")
        // truth arm: bounded all-pairs (BroadcastNestedLoop by contract)
        val truth = sigs.select(col("doc_id").as("a_id"), col("bands").as("ab"))
          .join(sigs.select(col("doc_id").as("b_id"), col("bands").as("bb")),
            col("a_id") < col("b_id"))
          .withColumn("hamming", hamming)
          .filter(col("hamming") <= 6)
          .select("a_id", "b_id")
          .localCheckpoint()
        // measured arm: m41's banding + cap verbatim, on the same slice
        val bandRows = sigs.select(col("doc_id"),
          posexplode(col("bands")).as(Seq("band_idx", "band_val")))
        val capped = bandRows.groupBy(col("band_idx"), col("band_val"))
          .agg(count(lit(1)).as("bsize"))
          .filter(col("bsize") >= 2 && col("bsize") <= 64)
          .select("band_idx", "band_val")
        val kept = bandRows.join(capped, Seq("band_idx", "band_val"))
        // candidate set BEFORE the exact verify — its size against the
        // verified-hit count is the precision the bucket cap actually
        // moves (post-verify precision is identically 10000 bp: the
        // measured arm exact-verifies Hamming ≤ 6 on the same slice, so
        // lsh ⊆ truth by construction)
        val cand = kept.select(col("band_idx"), col("band_val"), col("doc_id").as("a_id"))
          .join(kept.select(col("band_idx"), col("band_val"), col("doc_id").as("b_id")),
            Seq("band_idx", "band_val"))
          .filter(col("a_id") < col("b_id"))
          .select("a_id", "b_id").distinct()
          .localCheckpoint()
        val lsh = cand
          .join(sigs.select(col("doc_id").as("a_id"), col("bands").as("ab")), "a_id")
          .join(sigs.select(col("doc_id").as("b_id"), col("bands").as("bb")), "b_id")
          .withColumn("hamming", hamming)
          .filter(col("hamming") <= 6)
          .select("a_id", "b_id")
          .localCheckpoint()
        val hit = truth.join(lsh, Seq("a_id", "b_id"))
        truth.agg(count(lit(1)).as("n_true"))
          .crossJoin(cand.agg(count(lit(1)).as("n_cand")))
          .crossJoin(lsh.agg(count(lit(1)).as("n_lsh")))
          .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
          .select(
            col("n_true"), col("n_cand"), col("n_lsh"), col("n_hit"),
            expr("n_hit * 10000 div greatest(n_true, 1L)").as("recall_bp"),
            expr("n_hit * 10000 div greatest(n_cand, 1L)").as("cand_precision_bp"))
      },
      Some(s"""WITH ${phashPairsSqlCtes(" AND doc_id < 500")},
             |truth AS (
             |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
             |  FROM hsh a JOIN hsh b ON a.doc_id < b.doc_id
             |  WHERE CAST(list_sum(list_transform(generate_series(1, 8), i ->
             |    bit_count(xor(CAST(a.bv[i] AS BIGINT), CAST(b.bv[i] AS BIGINT))))) AS BIGINT) <= 6),
             |lsh AS (SELECT a_id, b_id FROM ham WHERE hamming <= 6),
             |hit AS (
             |  SELECT t.a_id, t.b_id
             |  FROM truth t JOIN lsh c ON t.a_id = c.a_id AND t.b_id = c.b_id)
             |SELECT
             |  CAST((SELECT COUNT(*) FROM truth) AS BIGINT) AS n_true,
             |  CAST((SELECT COUNT(*) FROM cand) AS BIGINT) AS n_cand,
             |  CAST((SELECT COUNT(*) FROM lsh) AS BIGINT) AS n_lsh,
             |  CAST((SELECT COUNT(*) FROM hit) AS BIGINT) AS n_hit,
             |  CAST(((SELECT COUNT(*) FROM hit) * 10000)
             |       // GREATEST((SELECT COUNT(*) FROM truth), 1) AS BIGINT) AS recall_bp,
             |  CAST(((SELECT COUNT(*) FROM hit) * 10000)
             |       // GREATEST((SELECT COUNT(*) FROM cand), 1) AS BIGINT) AS cand_precision_bp""".stripMargin),
    ),
  )
}
