package graft

import scala.util.Random

import graft.operators.Bpe

/** Randomized equivalence for the iterative BPE trainer: Bpe.train vs a
  * driver-side sequential reference (the textbook single-node greedy loop),
  * on vocabularies drawn from a tiny alphabet so merge chains, ties, and
  * multi-char-symbol re-merges arise naturally. Seeded, so failures
  * reproduce. Plus planted fixtures pinning the leftmost-greedy
  * non-overlap contract and the deterministic tie-break.
  */
class BpeSpec extends SparkTestBase {

  import spark.implicits._

  /** Textbook sequential BPE over a (word, freq) map: segment each word
    * into chars after the '_' marker, then repeatedly count adjacent
    * pairs, merge the (count DESC, lhs, rhs) argmax leftmost-greedily,
    * and record the rule. */
  private def reference(
      wf: Map[String, Long], steps: Int): Seq[(Long, String, String, String, Long)] = {
    var words: Map[Vector[String], Long] =
      wf.groupMapReduce { case (w, _) => ("_" + w).map(_.toString).toVector }(_._2)(_ + _)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, String, Long)]
    var step = 1
    var done = false
    while (step <= steps && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (s, f) =>
        s.sliding(2).filter(_.size == 2).foreach { p =>
          counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + f
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((a, b), cnt) = counts.toSeq.minBy { case ((x, y), c) => (-c, x, y) }
        out += ((step.toLong, a, b, a + b, cnt))
        words = words.groupMapReduce { case (s, _) => applyMerge(s, a, b) }(_._2)(_ + _)
        step += 1
      }
    }
    out.toSeq
  }

  /** Leftmost-greedy non-overlapping merge of (a, b) -> a+b. */
  private def applyMerge(s: Vector[String], a: String, b: String): Vector[String] =
    s.tail.foldLeft(Vector(s.head)) { (acc, x) =>
      if (acc.last == a && x == b) acc.init :+ (a + b) else acc :+ x
    }

  private def run(wf: Map[String, Long], steps: Int) =
    Bpe.train(spark, wf.toSeq.toDF("w", "freq"), "w", "freq", steps)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .toSeq

  test("train matches the sequential reference on random vocabularies") {
    val rnd = new Random(20260814L)
    for (trial <- 1 to 5) {
      val nWords = rnd.nextInt(40) + 10
      val wf = (0 until nWords).map { _ =>
        val len = rnd.nextInt(6) + 1
        val w = (0 until len).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
        w -> (rnd.nextInt(9) + 1).toLong
      }.groupMapReduce(_._1)(_._2)(_ + _)
      val steps = rnd.nextInt(6) + 3
      val got = run(wf, steps)
      val want = reference(wf, steps)
      assert(got == want, s"trial $trial diverged:\n got=$got\nwant=$want")
      assert(want.nonEmpty, s"trial $trial vacuous: no merges learned")
    }
  }

  test("BATCHED training emits exactly the sequential merge table on random vocabularies") {
    // the core batched-BPE claim (acceptBatch C1–C3): whatever prefix a
    // round accepts, the emitted rules — order, counts, everything — equal
    // the one-rule-per-round trainer's. Tiny 3-letter alphabet makes
    // ties, overlapping top pairs, and merge-symbol collisions (the cases
    // that force a batch to trim or stop) arise constantly.
    val rnd = new Random(20260814L ^ 0x51ed2701L)
    for (trial <- 1 to 8) {
      val nWords = rnd.nextInt(40) + 10
      val wf = (0 until nWords).map { _ =>
        val len = rnd.nextInt(6) + 1
        val w = (0 until len).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
        w -> (rnd.nextInt(9) + 1).toLong
      }.groupMapReduce(_._1)(_._2)(_ + _)
      val steps = rnd.nextInt(10) + 3
      val batch = rnd.nextInt(7) + 2
      val got = Bpe.train(spark, wf.toSeq.toDF("w", "freq"), "w", "freq", steps, batch)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
        .toSeq
      val want = reference(wf, steps)
      assert(got == want,
        s"trial $trial (steps=$steps batch=$batch) diverged:\n got=$got\nwant=$want")
    }
  }

  test("batching actually cuts recount rounds on a merge-rich vocabulary") {
    // words x y x y over pairwise-disjoint letter pairs at strictly
    // separated freqs: each word's in-word pair (x, y) counts 2·freq —
    // dominating every '_'-boundary pair (which all SHARE the '_' symbol
    // and so can never batch together) — so the ranked list's head is full
    // of disjoint, count-separated candidates and rounds must land well
    // under one-per-rule. The merge TABLE must still equal sequential
    // (the only thing batching is allowed to change is wall-clock).
    val letters = "abcdefghijklmnopqrstuvwxyz"
    val wf = (0 until 13).map { i =>
      val (x, y) = (letters(2 * i), letters(2 * i + 1))
      s"$x$y$x$y" -> (1000L - 7L * i)
    }.toMap
    val steps = 12
    val (df, rounds) = Bpe.trainWithRounds(
      spark, wf.toSeq.toDF("w", "freq"), "w", "freq", steps, batch = 8)
    val got = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .toSeq
    assert(got == reference(wf, steps), s"batched table diverged: $got")
    assert(rounds < steps,
      s"batching saved no rounds: $rounds rounds for $steps rules")
  }

  test("BATCHED training survives single-letter runs (self-pair batch barrier)") {
    // the edge-gate regression (EDGE.md): a long same-letter run makes the
    // top pair a SELF-pair (a, a), whose merge spawns (aa, aa) with count
    // ~half its own — ABOVE the batch's count cut, where the pre-fix
    // acceptBatch wrongly landed lower-count pairs the sequential trainer
    // orders after it. The run lengths here reproduce exactly that shape
    // ((a,a)=199·2 → (aa,aa)=99·2 > (o,w)=150), plus random same-letter-
    // run vocabularies for breadth.
    val planted = Map("a" * 200 -> 2L, "owowow" -> 25L, "xyxy" -> 30L)
    val got = Bpe.train(spark, planted.toSeq.toDF("w", "freq"), "w", "freq", 8, batch = 8)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .toSeq
    assert(got == reference(planted, 8), s"planted run diverged: $got")
    val rnd = new Random(20260816L)
    for (trial <- 1 to 5) {
      val wf = (0 until rnd.nextInt(20) + 5).map { _ =>
        val c = ('a' + rnd.nextInt(3)).toChar
        (c.toString * (rnd.nextInt(30) + 2)) -> (rnd.nextInt(9) + 1).toLong
      }.groupMapReduce(_._1)(_._2)(_ + _)
      val steps = rnd.nextInt(8) + 3
      val batch = rnd.nextInt(7) + 2
      val got2 = Bpe.train(spark, wf.toSeq.toDF("w", "freq"), "w", "freq", steps, batch)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
        .toSeq
      val want = reference(wf, steps)
      assert(got2 == want,
        s"trial $trial (steps=$steps batch=$batch) diverged:\n got=$got2\nwant=$want")
    }
  }

  test("batch=1 is byte-identical to the default sequential path") {
    val wf = Map("abab" -> 9L, "aba" -> 4L, "bb" -> 2L)
    val a = run(wf, 5)
    val b = Bpe.train(spark, wf.toSeq.toDF("w", "freq"), "w", "freq", 5, batch = 1)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .toSeq
    assert(a == b)
  }

  test("merge application is leftmost-greedy and never re-merges overlaps") {
    // 'aaaa' (segmented _ a a a a) under merge (a,a): leftmost pairs give
    // [_, aa, aa], NOT [_, aa, a, a]-with-late-merge or an overlapping
    // [_, aaa, a]. Train 2 steps: step 1 must be (a,a); step 2's counts
    // then see 'aa' symbols — ('aa','aa') from the aaaa-word.
    val wf = Map("aaaa" -> 10L, "aa" -> 1L)
    val got = run(wf, 2)
    val want = reference(wf, 2)
    assert(got == want)
    assert(got.head._2 == "a" && got.head._3 == "a" && got.head._5 == 31L,
      s"step 1 should merge (a,a) with count 3*10+1=31: $got")
  }

  test("argmax ties break by (lhs, rhs) lexicographically in both engines") {
    // 'ab' and 'ba' with equal freq: pairs (_,a)=5, (a,b)=5, (_,b)=5,
    // (b,a)=5 — all tied; the rule must pick (_,a) by name order.
    val got = run(Map("ab" -> 5L, "ba" -> 5L), 1)
    assert(got == reference(Map("ab" -> 5L, "ba" -> 5L), 1))
    assert(got.head._2 == "_" && got.head._3 == "a", s"tie-break diverged: $got")
  }

  test("encodeVocab matches a driver-side rule application on random vocabularies") {
    val rnd = new Random(20260814L ^ 0x9e3779b9L)
    for (trial <- 1 to 5) {
      val nWords = rnd.nextInt(40) + 10
      val wf = (0 until nWords).map { _ =>
        val len = rnd.nextInt(6) + 1
        val w = (0 until len).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
        w -> (rnd.nextInt(9) + 1).toLong
      }.groupMapReduce(_._1)(_._2)(_ + _)
      val merges = reference(wf, rnd.nextInt(6) + 3).map(m => (m._2, m._3))
      val got = Bpe.encodeVocab(wf.keys.toSeq.toDF("w"), "w", merges)
        .collect()
        .map(r => r.getString(0) -> r.getSeq[String](1).toVector)
        .toMap
      wf.keys.foreach { w =>
        val want = merges.foldLeft(("_" + w).map(_.toString).toVector) {
          case (s, (a, b)) => applyMerge(s, a, b)
        }
        assert(got(w) == want, s"trial $trial, word '$w': got=${got(w)} want=$want")
        // merges only concatenate adjacent symbols, so the encoding must
        // reassemble losslessly — the invariant a packer downstream relies on
        assert(got(w).mkString == "_" + w, s"lossy encode of '$w': ${got(w)}")
      }
    }
  }

  test("train frees every per-round checkpoint on return") {
    // Dataset.unpersist() is a no-op on localCheckpoint blocks; the loop
    // must free them via the RDD-id tracker or a long merge run pins one
    // vocabulary copy per round
    val before = spark.sparkContext.getPersistentRDDs.keySet
    run(Map("abab" -> 5L, "ab" -> 2L, "ba" -> 1L), 6)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"train leaked checkpoint RDDs: $leaked")
  }

  test("a shipped merge table round-trips through parquet and encodes identically") {
    val wf = Map("abab" -> 9L, "aba" -> 4L, "bb" -> 2L)
    val trained = Bpe.train(spark, wf.toSeq.toDF("w", "freq"), "w", "freq", steps = 4)
    val dir = java.nio.file.Files.createTempDirectory("bpe-ship").toString
    Bpe.saveMerges(trained, s"$dir/merges")
    val loaded = Bpe.loadMerges(spark, s"$dir/merges")
    val direct = trained.collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(loaded == direct, s"rule order must survive the round-trip: $loaded vs $direct")
    val vocab = wf.keys.toSeq.toDF("w")
    val a = Bpe.encodeVocab(vocab, "w", direct)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val b = Bpe.encodeVocab(vocab, "w", loaded)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(a == b, "encode with shipped rules diverged from in-memory rules")
  }

  test("training stops early when every word collapses to one symbol") {
    // single word 'ab' segments to [_, a, b]: merges (_,a)->(_a) then
    // (_a,b)->(_ab), after which no pairs remain — requesting 10 steps
    // must return exactly 2 rows.
    val got = run(Map("ab" -> 2L), 10)
    assert(got == reference(Map("ab" -> 2L), 10))
    assert(got.size == 2, s"expected exhaustion after 2 merges: $got")
    // encoding with the exhausted (shorter-than-requested) rule list must
    // collapse every word to one piece — the Spark twin of the oracle's
    // LEFT JOIN fallback, which keeps vocabulary rows alive through the
    // merge-less rounds instead of emptying them
    val enc = Bpe.encodeVocab(Seq("ab").toDF("w"), "w", got.map(m => (m._2, m._3)))
      .collect()
    assert(enc.length == 1 && enc(0).getLong(2) == 1L,
      s"'ab' must encode to the single merged symbol: ${enc.toSeq}")
  }

  test("t172 cadence form ≡ t169 full reassembly, row for row") {
    // The injective-join theorem the cadence form rests on: rebuilt and
    // canon are space-joins of the SAME extracted [a-z]+ token sequence
    // (space-free tokens ⇒ the join is injective), so t169's
    // rebuilt == canon verdict must equal t172's n_bad_words == 0 on
    // every document — all five shared columns identical, not just ok.
    val dir = "/root/testdata/sf0.001"
    val full = SparkEntry.registry.find(_.name == "t169_bpe_roundtrip").get
      .build(spark, dir)
    val cadence = SparkEntry.registry.find(_.name == "t172_bpe_roundtrip_cadence").get
      .build(spark, dir)
    assert(cadence.columns.toSeq == full.columns.toSeq,
      s"cadence schema drifted: ${cadence.columns.toSeq} vs ${full.columns.toSeq}")
    assert(cadence.exceptAll(full).isEmpty && full.exceptAll(cadence).isEmpty,
      "cadence and full round-trip certifications disagree")
  }
}
