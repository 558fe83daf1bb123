package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.queries.Similarity

/** The persisted admission index contract behind t96/DocStreams: the
  * on-disk (band, sig)-bucketed table is append-only, and probing it is
  * indistinguishable from probing a freshly built in-memory index.
  *
  *  - append == rebuild: writing corpus half A then APPENDING half B gives
  *    the same admission verdicts as writing A∪B in one shot, and the same
  *    as the in-memory [[Similarity.bandIndex]] frame. This is what makes
  *    the 100 TB maintenance path sound: admitted batches append their
  *    signatures; nothing is ever rebuilt.
  *  - the mega-bucket guard stays correct under appends because
  *    [[Similarity.admission]] applies it at probe time over current
  *    bucket sizes (a bucket crossing 20 members only via the append must
  *    be skipped — build-time capping would have frozen it in).
  *  - the table scan is genuinely bucketed (no Exchange needed to count
  *    bucket sizes by exactly the bucket keys).
  */
class PersistedIndexSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def verdicts(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Option[Any], Boolean)] =
    df.orderBy("doc_id").collect().toSeq
      .map((r: Row) => (r.getLong(0), r.getLong(1), Option(r.get(2)), r.getBoolean(3)))

  test("append-then-probe equals rebuild-then-probe equals in-memory index") {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val sh = Similarity.shingleDocs(corpus).localCheckpoint()
    val batchSh = Similarity.shingleDocs(docs.filter(col("doc_id") % 10 === 0))
      .localCheckpoint()

    val base = Files.createTempDirectory("graft_pidx").toString

    // one-shot: whole corpus written at once
    Similarity.writeBandIndex(sh, "pidx_oneshot", s"$base/oneshot", overwrite = true)
    val oneShot = verdicts(
      Similarity.admission(batchSh, Similarity.loadBandIndex(spark, "pidx_oneshot"), sh))

    // incremental: half A overwrites, half B appends to the same table
    val halfA = sh.filter(col("doc_id") % 2 === 1)
    val halfB = sh.filter(col("doc_id") % 2 === 0)
    Similarity.writeBandIndex(halfA, "pidx_inc", s"$base/inc", overwrite = true)
    Similarity.writeBandIndex(halfB, "pidx_inc", s"$base/inc", overwrite = false)
    val incremental = verdicts(
      Similarity.admission(batchSh, Similarity.loadBandIndex(spark, "pidx_inc"), sh))

    // in-memory: no table at all
    val inMemory = verdicts(Similarity.admission(batchSh, Similarity.bandIndex(sh), sh))

    assert(oneShot.nonEmpty)
    assert(incremental == oneShot, "appended index diverges from one-shot index")
    assert(inMemory == oneShot, "persisted index diverges from in-memory index")

    // row-level: the appended table holds exactly the one-shot rows
    val a = spark.table("pidx_inc").collect().map(_.toSeq).toSeq.sortBy(_.toString)
    val b = spark.table("pidx_oneshot").collect().map(_.toSeq).toSeq.sortBy(_.toString)
    assert(a == b, "appended table contents differ from one-shot table")
  }

  test("probe-time mega-bucket guard sees buckets that cross 20 only via append") {
    import spark.implicits._
    // 21 corpus docs with IDENTICAL text land their band signatures in the
    // same buckets; a probe of the same text must be ADMITTED (all its
    // buckets are mega-buckets, all skipped). Split 11+10 across an append
    // so no single write sees a bucket over the cap — only probe-time
    // counting can catch it.
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val corpus = (1L to 21L).map(i => (i, text)).toDF("doc_id", "text")
    val sh = Similarity.shingleDocs(corpus).localCheckpoint()
    val base = Files.createTempDirectory("graft_pidx_mega").toString
    Similarity.writeBandIndex(sh.filter(col("doc_id") <= 11), "pidx_mega",
      s"$base/mega", overwrite = true)
    Similarity.writeBandIndex(sh.filter(col("doc_id") > 11), "pidx_mega",
      s"$base/mega", overwrite = false)

    val probeSh = Similarity.shingleDocs(Seq((1000L, text)).toDF("doc_id", "text"))
    val out = verdicts(
      Similarity.admission(probeSh, Similarity.loadBandIndex(spark, "pidx_mega"), sh))
    assert(out == Seq((1000L, 0L, None, true)),
      s"probe of a 21-member mega-bucket must skip it and admit, got $out")

    // control: at 20 members the bucket is within the cap and must collide
    Similarity.writeBandIndex(sh.filter(col("doc_id") <= 20), "pidx_ctrl",
      s"$base/ctrl", overwrite = true)
    val ctrl = verdicts(
      Similarity.admission(probeSh, Similarity.loadBandIndex(spark, "pidx_ctrl"),
        sh.filter(col("doc_id") <= 20)))
    assert(ctrl.head._2 == 20L && !ctrl.head._4,
      s"20-member bucket must produce 20 verified dups and reject, got $ctrl")
  }

  test("a crashed-and-replayed batch recomputes identical verdicts after its own append") {
    // The self-maintaining stream's crash window: attempt 1 of a
    // micro-batch appends its admitted docs' signatures AND shingles, then
    // dies before the streaming checkpoint commits; attempt 2 re-runs the
    // same batch against the grown index. Verdicts must be identical —
    // admission excludes index rows carrying the batch's own ids, so the
    // batch never probes what its earlier attempt appended.
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val corpusSh = Similarity.shingleDocs(docs.filter(col("doc_id") % 10 =!= 0))
      .localCheckpoint()
    val batchSh = Similarity.shingleDocs(docs.filter(col("doc_id") % 10 === 0))
      .localCheckpoint()
    val base = Files.createTempDirectory("graft_pidx_replay").toString
    Similarity.writeBandIndex(corpusSh, "pidx_replay", s"$base/idx", overwrite = true)
    Similarity.writeShingleStore(corpusSh, "pidx_replay_sh", s"$base/sh", overwrite = true)
    def run() = verdicts(Similarity.admission(
      batchSh,
      Similarity.loadBandIndex(spark, "pidx_replay"),
      Similarity.loadShingleStore(spark, "pidx_replay_sh")))
    val attempt1 = run()
    assert(attempt1.exists(_._4), "fixture needs at least one admitted doc")
    val admittedIds = attempt1.filter(_._4).map(_._1)
    val admittedSh = batchSh.filter(col("doc_id").isin(admittedIds: _*))
    Similarity.writeBandIndex(admittedSh, "pidx_replay", s"$base/idx", overwrite = false)
    Similarity.writeShingleStore(admittedSh, "pidx_replay_sh", s"$base/sh", overwrite = false)
    val attempt2 = run()
    assert(attempt2 == attempt1,
      "a replayed batch must not probe its own appended signatures")
  }

  test("duplicated rows from a replayed append cannot trip the mega-bucket cap") {
    import spark.implicits._
    // 11 identical corpus docs → bucket size 11, within the cap. A replayed
    // append duplicates every row; a raw row count would read 22 > 20,
    // skip the bucket, and silently ADMIT a true near-dup. Distinct-doc
    // counting must keep the bucket live.
    val text = "pack my box with five dozen liquor jugs and more and more"
    val corpus = (1L to 11L).map(i => (i, text)).toDF("doc_id", "text")
    val sh = Similarity.shingleDocs(corpus).localCheckpoint()
    val base = Files.createTempDirectory("graft_pidx_dup").toString
    Similarity.writeBandIndex(sh, "pidx_dup", s"$base/idx", overwrite = true)
    Similarity.writeBandIndex(sh, "pidx_dup", s"$base/idx", overwrite = false)
    val probeSh = Similarity.shingleDocs(Seq((1000L, text)).toDF("doc_id", "text"))
    val out = verdicts(Similarity.admission(
      probeSh, Similarity.loadBandIndex(spark, "pidx_dup"), sh))
    assert(out.head._2 == 11L && !out.head._4,
      s"11 distinct docs (rows duplicated by replay) must still collide and reject, got $out")
  }

  test("compaction is probe-equivalent, purges replay duplicates, and shrinks to 8 files") {
    import spark.implicits._
    def parquetFiles(path: String): Int = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(path)).count(_.getName.endsWith(".parquet"))
    }
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val corpusSh = Similarity.shingleDocs(docs.filter(col("doc_id") % 10 =!= 0))
      .localCheckpoint()
    val batchSh = Similarity.shingleDocs(docs.filter(col("doc_id") % 10 === 0))
      .localCheckpoint()
    val base = Files.createTempDirectory("graft_pidx_compact").toString

    // simulate the streaming cadence: 4 appends (one doubled — a replay)
    val quarters = (0 to 3).map(q => corpusSh.filter(col("doc_id") % 4 === q))
    Similarity.writeBandIndex(quarters(0), "pidx_cmp", s"$base/idx", overwrite = true)
    quarters.drop(1).foreach(qs =>
      Similarity.writeBandIndex(qs, "pidx_cmp", s"$base/idx", overwrite = false))
    Similarity.writeBandIndex(quarters(2), "pidx_cmp", s"$base/idx", overwrite = false)

    def run(table: String, sh: org.apache.spark.sql.DataFrame) = verdicts(
      Similarity.admission(batchSh, Similarity.loadBandIndex(spark, table), sh))
    val before = run("pidx_cmp", corpusSh)

    Similarity.compactBandIndex(spark, "pidx_cmp", "pidx_cmp_v2", s"$base/idx_v2")
    val after = run("pidx_cmp_v2", corpusSh)
    assert(before.nonEmpty && after == before,
      "compaction changed admission verdicts")

    // replay-duplicated rows are gone: compacted rows are exactly the
    // distinct one-shot rows
    val want = Similarity.bandIndex(corpusSh).distinct().count()
    assert(spark.table("pidx_cmp_v2").count() == want,
      "compaction must leave exactly the distinct index rows")

    // the file pile-up actually shrinks: 5 bucketed writes left ≥ 5 files
    // per live bucket path-wide; the rewrite emits one file per bucket
    val nBefore = parquetFiles(s"$base/idx")
    val nAfter = parquetFiles(s"$base/idx_v2")
    assert(nAfter == 8, s"expected one file per bucket after compaction, got $nAfter")
    assert(nAfter < nBefore, s"compaction must shrink files: $nBefore -> $nAfter")

    // bucketing survives the rewrite: bucket-size counts still no-Exchange
    val counts = Similarity.loadBandIndex(spark, "pidx_cmp_v2")
      .groupBy(col("band"), col("sig")).agg(count(lit(1)).as("bsize"))
    counts.collect()
    assert(!counts.queryExecution.executedPlan.toString.contains("Exchange"),
      "compacted table lost its bucketing")
  }

  test("compaction retention evicts tombstoned docs like a from-scratch rebuild") {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val corpusSh = Similarity.shingleDocs(docs.filter(col("doc_id") % 10 =!= 0))
      .localCheckpoint()
    val batchSh = Similarity.shingleDocs(docs.filter(col("doc_id") % 10 === 0))
      .localCheckpoint()
    val base = Files.createTempDirectory("graft_pidx_retain").toString
    Similarity.writeBandIndex(corpusSh, "pidx_ret", s"$base/idx", overwrite = true)

    // tombstone the even corpus docs, compact with the retention predicate
    Similarity.compactBandIndex(spark, "pidx_ret", "pidx_ret_v2", s"$base/idx_v2",
      retain = col("doc_id2") % 2 === 1)
    val surviving = corpusSh.filter(col("doc_id") % 2 === 1)
    val got = verdicts(Similarity.admission(
      batchSh, Similarity.loadBandIndex(spark, "pidx_ret_v2"), surviving))

    // reference: an index built from scratch over only the surviving docs
    Similarity.writeBandIndex(surviving, "pidx_ret_ref", s"$base/ref", overwrite = true)
    val want = verdicts(Similarity.admission(
      batchSh, Similarity.loadBandIndex(spark, "pidx_ret_ref"), surviving))
    assert(got == want,
      "retention compaction diverges from a from-scratch rebuild over survivors")
  }

  test("bucket-size count over the persisted index needs no Exchange") {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      .filter(col("doc_id") < 100)
    val sh = Similarity.shingleDocs(docs)
    val base = Files.createTempDirectory("graft_pidx_plan").toString
    Similarity.writeBandIndex(sh, "pidx_plan", s"$base/plan", overwrite = true)
    val counts = Similarity.loadBandIndex(spark, "pidx_plan")
      .groupBy(col("band"), col("sig")).agg(count(lit(1)).as("bsize"))
    counts.collect()
    val plan = counts.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"grouping by the bucket keys of a bucketed table must not shuffle:\n$plan")
  }

  test("IVF inverted lists: append == rebuild, row for row, and occupancy counts shuffle-free") {
    import org.apache.spark.sql.DataFrame
    val e = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val cents = e.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("embedding").as("cemb"))
    // the SHARED arm, deliberately: a private re-implementation here would
    // keep passing while t162/VecStreams drift
    def assign(vecs: DataFrame): DataFrame = Similarity.ivfAssign(vecs, cents)
    val base = Files.createTempDirectory("graft_ivf_idx").toString
    // incremental: old corpus overwritten, batch appended
    Similarity.writeIvfIndex(assign(e.filter(col("vec_id") % 3 =!= 0)),
      "ivf_inc", s"$base/inc", overwrite = true)
    Similarity.writeIvfIndex(assign(e.filter(col("vec_id") % 3 === 0)),
      "ivf_inc", s"$base/inc", overwrite = false)
    // rebuild: everything in one shot
    Similarity.writeIvfIndex(assign(e), "ivf_full", s"$base/full", overwrite = true)
    def rows(t: String) = spark.table(t)
      .select(col("cid"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val inc = rows("ivf_inc")
    assert(inc == rows("ivf_full"), "appended lists must equal the rebuilt lists")
    assert(inc.nonEmpty && inc.map(_._1).size > 1, "degenerate fixture: one list")
    // occupancy accounting (the list-balance health check a production IVF
    // watches) groups by exactly the bucket key — must not shuffle
    val occ = spark.table("ivf_inc").groupBy(col("cid")).agg(count(lit(1)).as("n"))
    occ.collect()
    val plan = occ.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"occupancy count over the cid-bucketed table must not shuffle:\n$plan")
  }
}
