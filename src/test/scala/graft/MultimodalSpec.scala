package graft

import java.nio.charset.StandardCharsets

import graft.queries.Multimodal

/** The GRFT1 container contract behind m35–m38: pack/parse round-trip,
  * generator-contract header fields, and loud rejection of corrupt bytes.
  * The queries' decode passes all go through [[Multimodal.parseHeader]],
  * so this is the byte-level truth the DuckDB oracles predict from `text`.
  */
class MultimodalSpec extends SparkTestBase {

  private def pack(s: String): Array[Byte] =
    Multimodal.packPayload(s.getBytes(StandardCharsets.UTF_8))

  test("pack/parse round-trips the header for bodies of many sizes") {
    // sizes straddling every field's arithmetic: empty, u16 width wrap
    // (640), height cycle (480·k/7 neighborhoods), multi-byte body_len
    val sizes = Seq(0, 1, 2, 3, 15, 16, 17, 639, 640, 641, 479, 480,
      65535, 65536, 70000)
    sizes.foreach { n =>
      val body = Array.fill[Byte](n)(('a' + n % 26).toByte)
      val p = Multimodal.packPayload(body)
      assert(p.length == Multimodal.HeaderLen + n)
      val h = Multimodal.parseHeader(p)
      assert(h.bodyLen == n.toLong, s"bodyLen for n=$n")
      assert(h.width == n % 640, s"width for n=$n")
      assert(h.height == n.toLong * 7 % 480, s"height for n=$n")
      assert(h.channels == n % 3 + 1, s"channels for n=$n")
      // body preserved byte-for-byte after the header
      assert(p.drop(Multimodal.HeaderLen).sameElements(body))
    }
  }

  test("parseHeader rejects corrupt payloads loudly") {
    val good = pack("hello world")
    // wrong magic
    val badMagic = good.clone(); badMagic(0) = 'X'
    intercept[IllegalArgumentException](Multimodal.parseHeader(badMagic))
    // unsupported version
    val badVer = good.clone(); badVer(4) = 9
    intercept[IllegalArgumentException](Multimodal.parseHeader(badVer))
    // truncated body (length field no longer matches)
    intercept[IllegalArgumentException](Multimodal.parseHeader(good.dropRight(1)))
    // shorter than a header at all
    intercept[IllegalArgumentException](Multimodal.parseHeader(Array[Byte](1, 2, 3)))
  }

  test("little-endian field encoding is genuinely positional") {
    // body_len = 0x12345 → bytes 10..13 = 45 23 01 00; width/height/channels
    // checked at exact offsets so a layout drift can't hide behind parseHeader
    val n = 0x12345
    val p = Multimodal.packPayload(new Array[Byte](n))
    assert((p(10) & 0xff) == 0x45 && (p(11) & 0xff) == 0x23 &&
      (p(12) & 0xff) == 0x01 && (p(13) & 0xff) == 0x00)
    val w = n % 640
    assert((p(5) & 0xff) == (w & 0xff) && (p(6) & 0xff) == (w >> 8))
    val h = n.toLong * 7 % 480
    assert((p(7) & 0xff) == (h & 0xff).toInt && (p(8) & 0xff) == (h >> 8).toInt)
    assert((p(9) & 0xff) == n % 3 + 1)
  }

  test("binaryFile ingest: real .grft files decode identically to the fixture") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("grft_ingest")
    try {
      // land a real media directory: 40 docs as one .grft file each, plus a
      // foreign file the glob must prune at listing time
      val docs = Tables.documents(spark, "/root/testdata/sf0.001")
        .filter(col("doc_id") < 40).select("doc_id", "text").collect()
      docs.foreach { r =>
        java.nio.file.Files.write(
          dir.resolve(s"doc_${r.getLong(0)}.grft"),
          Multimodal.packPayload(r.getString(1).getBytes(StandardCharsets.UTF_8)))
      }
      java.nio.file.Files.write(dir.resolve("README.txt"), "not media".getBytes)

      val fromFiles = Multimodal.decodeFeatures(
          Multimodal.binaryFileIngest(spark, dir.toString))
        .orderBy("doc_id").collect().toSeq
      assert(fromFiles.size == docs.length, "glob must keep exactly the .grft files")
      // the m36 query's own decode over the in-query fixture, same subset
      val fromFixture = SparkEntry.queries("m36_decode_features")(
          spark, "/root/testdata/sf0.001")
        .filter(col("doc_id") < 40).orderBy("doc_id").collect().toSeq
      assert(fromFiles == fromFixture,
        "file-based ingest must be indistinguishable from the fixture downstream")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.list(dir).iterator().asScala.foreach(java.nio.file.Files.delete)
      java.nio.file.Files.delete(dir)
    }
  }

  test("binaryFile ingest quarantines corrupt files loudly, not silently") {
    val dir = java.nio.file.Files.createTempDirectory("grft_corrupt")
    try {
      java.nio.file.Files.write(dir.resolve("doc_1.grft"),
        Multimodal.packPayload("fine".getBytes(StandardCharsets.UTF_8)))
      java.nio.file.Files.write(dir.resolve("doc_2.grft"), "XRFT garbage".getBytes)
      val ex = intercept[Exception] {
        Multimodal.decodeFeatures(
          Multimodal.binaryFileIngest(spark, dir.toString)).collect()
      }
      def causes(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: causes(t.getCause)
      assert(causes(ex).exists(_.getMessage != null) &&
        causes(ex).flatMap(c => Option(c.getMessage)).exists(_.contains("magic mismatch")),
        s"expected the parse to name the corruption, got: $ex")

      // a .grft file outside the doc_<id> naming contract fails by PATH,
      // not with a nameless null-id NPE downstream
      java.nio.file.Files.write(dir.resolve("image_7.grft"),
        Multimodal.packPayload("fine too".getBytes(StandardCharsets.UTF_8)))
      val ex2 = intercept[Exception] {
        Multimodal.binaryFileIngest(spark, dir.toString).collect()
      }
      assert(causes(ex2).flatMap(c => Option(c.getMessage))
          .exists(m => m.contains("doc_<id>.grft") && m.contains("image_7.grft")),
        s"expected a loud naming-contract failure naming the file, got: $ex2")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.list(dir).iterator().asScala.foreach(java.nio.file.Files.delete)
      java.nio.file.Files.delete(dir)
    }
  }

  test("parsePpm handles real netpbm header forms and rejects malformed rasters") {
    def ppm(hdr: String, px: Int): Array[Byte] =
      hdr.getBytes(StandardCharsets.UTF_8) ++ Array.fill[Byte](px)(7)
    // canonical single-newline form
    val a = Multimodal.parsePpm(ppm("P6\n3 2\n255\n", 18), 0)
    assert((a.width, a.height, a.maxval) == ((3, 2, 255)))
    assert(a.pixOff == 11)
    // whitespace runs, tabs, CR, and a comment line — all legal netpbm
    val b = Multimodal.parsePpm(ppm("P6  \t\n# a comment\n 4\r\n1 \n255 ", 12), 0)
    assert((b.width, b.height) == ((4, 1)))
    // nonzero offset (inside a GRFT1 container)
    val inGrft = Multimodal.packPayload(ppm("P6\n2 2\n255\n", 12))
    val c = Multimodal.parsePpm(inGrft, Multimodal.HeaderLen)
    assert((c.width, c.height) == ((2, 2)))
    // rejections: wrong magic, unsupported maxval, pixel-count mismatch,
    // missing whitespace after maxval (digits run into pixel data)
    intercept[IllegalArgumentException](Multimodal.parsePpm(ppm("P5\n3 2\n255\n", 18), 0))
    intercept[IllegalArgumentException](Multimodal.parsePpm(ppm("P6\n3 2\n65535\n", 18), 0))
    intercept[IllegalArgumentException](Multimodal.parsePpm(ppm("P6\n3 2\n255\n", 17), 0))
    // zero-pixel rasters must quarantine at the parser, not divide-by-zero
    // in whatever resample plan consumes the dims
    intercept[IllegalArgumentException](Multimodal.parsePpm(ppm("P6\n0 0\n255\n", 0), 0))
    intercept[IllegalArgumentException](Multimodal.parsePpm(ppm("P6\n5 0\n255\n", 0), 0))
    intercept[IllegalArgumentException](
      Multimodal.parsePpm("P6\n1 1\n255".getBytes(StandardCharsets.UTF_8), 0))
  }

  // ---- m41: 8×8 average-hash over decoded pixels ----

  /** A GRFT1 container holding a P6 raster with pixel (x,y) = px(x,y) on
    * all three channels. */
  private def raster(w: Int, h: Int)(px: (Int, Int) => Int): Array[Byte] = {
    val hdr = s"P6\n$w $h\n255\n".getBytes(StandardCharsets.UTF_8)
    val p = new Array[Byte](hdr.length + w * h * 3)
    System.arraycopy(hdr, 0, p, 0, hdr.length)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
      p(hdr.length + (y * w + x) * 3 + c) = px(x, y).toByte
    Multimodal.packPayload(p)
  }

  private def bandsOf(payloads: (Long, Array[Byte])*): Map[Long, Seq[Long]] = {
    import spark.implicits._
    Multimodal.aHashBands(payloads.toSeq.toDF("doc_id", "payload"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
  }

  test("aHash matches a hand-computed reference and is stable under upscale") {
    // left half black, right half white: grid mean sits exactly between,
    // so the strict 64·g > Σg rule sets precisely the right-half cells —
    // every band (one per grid row) is 0b11110000 = 240
    val half8 = raster(8, 8)((x, _) => if (x < 4) 0 else 255)
    // the same image at 2×: NN sampling (sx = ⌊tx·w/8⌋) must land on the
    // same half split, so the hash is scale-invariant by construction
    val half16 = raster(16, 16)((x, _) => if (x < 8) 0 else 255)
    // a constant image has g == mean everywhere; strict > ⇒ all bits clear
    val flat = raster(5, 3)((_, _) => 77)
    val b = bandsOf(1L -> half8, 2L -> half16, 3L -> flat, 4L -> half8)
    assert(b(1L) == Seq.fill(8)(240L), s"reference hash: ${b(1L)}")
    assert(b(2L) == b(1L), "2x upscale must hash identically (NN sampling)")
    assert(b(3L) == Seq.fill(8)(0L), "constant raster must hash to zero")
    assert(b(4L) == b(1L), "identical payloads must hash identically")
  }

  test("aHash quarantines non-raster payloads loudly") {
    val bad = Multimodal.packPayload("not a P6 raster body".getBytes(StandardCharsets.UTF_8))
    val ex = intercept[Exception] { bandsOf(9L -> bad) }
    assert(ex.getMessage != null)
  }

  test("m41: pairs are canonical, verified, and duplicate-free") {
    val rows = SparkEntry.queries("m41_image_phash")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty, "sf0.001 plants exact dups; the pair set must not be empty")
    rows.foreach { case (a, bId, ham) =>
      assert(a < bId, s"pair ($a,$bId) must be canonical a < b")
      assert(ham >= 0L && ham <= 6L, s"hamming $ham outside the verify bound")
    }
    assert(rows.map(p => (p._1, p._2)).distinct.length == rows.length,
      "banding across 8 bands must not emit a pair twice")
  }

  test("phashAdmission equals brute force on random signatures under the cap") {
    import spark.implicits._
    // random 8-band signatures with planted clusters: store stays under
    // the 64-per-bucket cap so banding must be LOSSLESS here (Hamming ≤ 7
    // pairs share a band by pigeonhole; the verify bound is 6 < 7) and
    // admission must equal the all-pairs reference exactly
    val rnd = new scala.util.Random(7)
    def sig(): Seq[Long] = Seq.fill(8)(rnd.nextInt(256).toLong)
    def flip(s: Seq[Long], bits: Int): Seq[Long] = {
      var v = s.toArray
      (1 to bits).foreach { _ =>
        val k = rnd.nextInt(64)
        v = v.updated(k / 8, v(k / 8) ^ (1L << (k % 8)))
      }
      v.toSeq
    }
    val storeSigs = (1L to 40L).map(i => (i, sig()))
    val batchSigs = (101L to 120L).map { i =>
      val base = storeSigs(rnd.nextInt(storeSigs.length))._2
      (i, rnd.nextInt(3) match {
        case 0 => base                      // exact dup of a store image
        case 1 => flip(base, 1 + rnd.nextInt(6)) // within the verify bound
        case 2 => sig()                     // unrelated (expected Hamming ≈ 32)
      })
    }
    val store = storeSigs.toDF("doc_id", "bands")
    val batch = batchSigs.toDF("doc_id", "bands")
    val got = graft.queries.Multimodal.phashAdmission(batch, store)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    def ham(a: Seq[Long], b: Seq[Long]): Int =
      a.zip(b).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
    batchSigs.foreach { case (id, s) =>
      val want = storeSigs.count { case (_, t) => ham(s, t) <= 6 }.toLong
      assert(got(id) == ((want, want == 0L)),
        s"doc $id: got ${got(id)}, brute force says $want dups")
    }
  }

  test("m42: trim-plan arithmetic is internally consistent on every doc") {
    val rows = SparkEntry.queries("m42_audio_energy")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.length == Tables.documents(spark, "/root/testdata/sf0.001").count())
    rows.foreach { case (id, nw, nq, longest, lead, tail, kept) =>
      assert(nq <= nw && longest <= nq, s"doc $id: quiet counts inconsistent")
      assert(kept == math.max(nw - lead - tail, 0L) * 64L, s"doc $id: kept_samples identity")
      if (nq == nw) assert(lead == nw && tail == 0L, s"doc $id: all-quiet trim convention")
      else assert(lead + tail <= nq, s"doc $id: trims can only eat quiet windows")
    }
    // the threshold must actually split the corpus — a degenerate all-loud
    // or all-quiet fixture would make the islands logic vacuous
    assert(rows.exists(_._3 > 0) && rows.exists(r => r._2 > 0 && r._3 < r._2),
      "fixture must contain both quiet and loud windows")
  }

  test("m43: clusters are non-trivial and conserve m41's pair nodes") {
    val pairs = SparkEntry.queries("m41_image_phash")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    val clusters = SparkEntry.queries("m43_image_dedup_select")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(clusters.nonEmpty)
    clusters.foreach { case (keep, members, dropped) =>
      assert(members >= 2L && dropped == members - 1L)
      assert(nodes.contains(keep), s"survivor $keep must be a paired node")
    }
    assert(clusters.map(_._2).sum == nodes.size.toLong,
      "clusters must partition exactly the paired nodes")
    assert(clusters.map(_._1).distinct.length == clusters.length)
  }

  test("raster fixture packs genuine P6 bodies the resample contract predicts") {
    val rows = graft.queries.Multimodal
      .rasterPayload(spark, "/root/testdata/sf0.001")
      .limit(50).collect()
    assert(rows.nonEmpty)
    val texts = Tables.documents(spark, "/root/testdata/sf0.001")
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val p = r.getAs[Array[Byte]](1)
      Multimodal.parseHeader(p) // container header must validate
      val img = Multimodal.parsePpm(p, Multimodal.HeaderLen)
      val t = texts(r.getLong(0)).getBytes(StandardCharsets.UTF_8)
      val n = t.length
      assert(img.width == n % 48 + 1 && img.height == n * 7 % 32 + 1)
      // generator contract: pixel byte k = text byte at k % n
      var k = 0
      while (k < img.width * img.height * 3) {
        assert(p(img.pixOff + k) == t(k % n), s"pixel $k of doc ${r.getLong(0)}")
        k += 1
      }
    }
  }
}
