package graft

/** The invariant t131's oracle cannot express: the split is leakage-PROOF —
  * no verified near-dup pair ever straddles train/val/test, because
  * assignment hashes the CLUSTER id, not the doc id. Run against the real
  * corpus fixture (sf0.001) through the registered queries, plus the
  * counterfactual: the naive doc-id hash split DOES straddle pairs on this
  * same corpus (14 of 27 at last count), so the invariant is exercised
  * nontrivially, not vacuously.
  */
class LeakageSplitSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private lazy val split: Map[Long, (Long, String)] =
    SparkEntry.queries("t131_leakage_split")(spark, sf)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap

  private lazy val pairs: Seq[(Long, Long)] =
    SparkEntry.queries("t31_minhash_lsh")(spark, sf)
      .select("doc_id1", "doc_id2")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("no verified near-dup pair straddles splits, and clusters agree") {
    assert(pairs.nonEmpty, "fixture must plant near-dup pairs or the test is vacuous")
    pairs.foreach { case (a, b) =>
      assert(split(a)._1 === split(b)._1, s"pair ($a,$b) disagrees on cluster")
      assert(split(a)._2 === split(b)._2, s"pair ($a,$b) straddles splits — LEAK")
    }
  }

  test("every doc is assigned exactly once and train dominates 80/10/10") {
    assert(split.size === 500)
    val bySplit = split.values.groupBy(_._2).view.mapValues(_.size).toMap
    assert(bySplit.keySet.subsetOf(Set("train", "val", "test")))
    assert(bySplit("train") > bySplit.getOrElse("val", 0) + bySplit.getOrElse("test", 0))
  }

  test("singleton docs keep their own id as cluster") {
    val inPairs = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    val singletons = split.keySet -- inPairs
    assert(singletons.nonEmpty)
    // a singleton not reached by any pair may still share a cluster only
    // with itself
    singletons.foreach(dd => assert(split(dd)._1 === dd, s"singleton $dd lost its own cluster"))
  }

  test("counterfactual: the naive doc-id hash split leaks on this corpus") {
    import org.apache.spark.sql.functions._
    val naive = SparkEntry.queries("t131_leakage_split")(spark, sf)
      .select(col("doc_id"),
        expr("cast(conv(substring(md5(cast(concat('split:', cast(doc_id as string)) as binary)), 1, 15), 16, 10) as bigint) % 10").as("hb"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def bucket(h: Long): String = if (h < 8) "train" else if (h == 8) "val" else "test"
    val straddles = pairs.count { case (a, b) => bucket(naive(a)) != bucket(naive(b)) }
    assert(straddles > 0, "corpus no longer exercises the leak — rebuild the fixture claim")
  }
}
