package graft

import scala.util.Random

import graft.functions.CdcKit

/** Content-defined chunking kernel (functions/Cdc.scala): boundary
  * determinism vs a reference implementation, exact body coverage, and the
  * property CDC exists for — boundaries re-synchronize after an insertion,
  * so most chunk fingerprints survive an edit that shifts every byte.
  */
class CdcSpec extends SparkTestBase {

  private def pack(body: Array[Byte]): Array[Byte] =
    graft.queries.Multimodal.packPayload(body)

  private def ends(body: Array[Byte]): Seq[Long] =
    CdcKit.chunkEnds(pack(body)).toLongArray().toSeq

  private def refEnds(b: Array[Byte]): Seq[Long] = {
    val pow = Array(1L, 31L, 961L, 29791L, 923521L, 28629151L, 887503681L, 27512614111L)
    val n = b.length
    val out = (8 to n).filter { i =>
      val h = (0 until 8).map(j => (b(i - 1 - j) & 0xffL) * pow(j)).sum
      h % 2147483647L % 16L == 0L
    }.map(_.toLong)
    if (out.isEmpty || out.last != n) out :+ n.toLong else out
  }

  private def chunksOf(b: Array[Byte]): Seq[Seq[Byte]] = {
    val e = ends(b)
    val s = 1L +: e.dropRight(1).map(_ + 1)
    s.zip(e).map { case (a, z) => b.slice(a.toInt - 1, z.toInt).toSeq }
  }

  test("kernel matches the reference boundary scan on random bodies") {
    val rnd = new Random(99)
    (1 to 100).foreach { _ =>
      val b = Array.fill(rnd.nextInt(300) + 1)(rnd.nextInt(256).toByte)
      assert(ends(b) == refEnds(b))
    }
  }

  test("chunks exactly tile the body (strictly increasing ends, final = n)") {
    val rnd = new Random(7)
    (1 to 50).foreach { _ =>
      val b = Array.fill(rnd.nextInt(300) + 1)(rnd.nextInt(256).toByte)
      val e = ends(b)
      assert(e == e.sorted && e.distinct == e, "ends must be strictly increasing")
      assert(e.last == b.length.toLong)
      assert(chunksOf(b).map(_.length).sum == b.length, "chunks must tile the body")
      assert(chunksOf(b).flatten == b.toSeq, "concatenated chunks must equal the body")
    }
  }

  test("a zero-length body chunks to the EMPTY array — and m39 skips it (pinned choice)") {
    // contract decision (round-9 advice): an empty body has no chunks, so
    // the doc is ABSENT from chunk stats; the m39 oracle mirrors this with
    // WHERE length(text) > 0 and the Spark build filters size(ends) > 0
    // (which also keeps slice(ends, 1, size-1) off the negative-length
    // edge). The alternative — emitting one zero-length chunk — would have
    // put an md5('') fingerprint in every dedup index for free.
    assert(CdcKit.chunkEnds(pack(Array.empty[Byte])).numElements() == 0)
  }

  test("short bodies (< window) become one chunk") {
    (1 to 7).foreach { n =>
      val b = Array.fill(n)(42.toByte)
      assert(ends(b) == Seq(n.toLong))
    }
  }

  test("boundaries re-synchronize after a front insertion (the CDC property)") {
    val rnd = new Random(5)
    var resyncHits = 0
    (1 to 20).foreach { _ =>
      val b = Array.fill(400)(rnd.nextInt(256).toByte)
      val shifted = (rnd.nextInt(256).toByte +: b.toSeq).toArray
      val fps = chunksOf(b).toSet
      val fpsShifted = chunksOf(shifted).toSet
      // fixed-size blocks would share ~0 chunks; CDC re-locks after ~one
      // chunk, so the overwhelming majority of chunks must survive
      val shared = fps.intersect(fpsShifted).size
      if (shared * 2 >= fps.size) resyncHits += 1
    }
    assert(resyncHits >= 18, s"CDC resync property failed: $resyncHits/20")
  }
}
