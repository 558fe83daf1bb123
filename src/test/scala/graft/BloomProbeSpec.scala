package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.functions.BloomProbe

/** Contract of the explicit Bloom prefilter (functions/BloomProbe.scala):
  * no false negatives (the property that makes `prefilter → exact join`
  * result-identical to the exact join), bounded false-positive rate, and
  * end-to-end equivalence on the t141 decontamination shape.
  */
class BloomProbeSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("no false negatives: every inserted key probes true") {
    val rnd = new Random(42)
    val keys = Seq.fill(5000)(rnd.nextLong())
    import spark.implicits._
    val df = keys.toDF("k")
    val bf = df.stat.bloomFilter("k", 5000, 0.01)
    val bytes = BloomProbe.toBytes(bf)
    val surviving = df.filter(BloomProbe.mightContainLong(col("k"), bytes)).count()
    assert(surviving == keys.distinct.length.toLong,
      "a Bloom filter must never drop an inserted key")
  }

  test("false-positive rate stays near fpp on a disjoint key set") {
    val rnd = new Random(7)
    val inserted = Seq.fill(5000)(rnd.nextLong() & ~1L) // even keys
    import spark.implicits._
    val bf = inserted.toDF("k").stat.bloomFilter("k", 5000, 0.01)
    val bytes = BloomProbe.toBytes(bf)
    val probes = Seq.fill(20000)(rnd.nextLong() | 1L) // odd keys — disjoint
    val hits = probes.toDF("k")
      .filter(BloomProbe.mightContainLong(col("k"), bytes)).count()
    assert(hits.toDouble / probes.length < 0.05,
      s"fpp=0.01 filter passed $hits/${probes.length} disjoint keys")
  }

  test("t141 shape: bloom prefilter + exact join == exact join alone") {
    val grams = Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(graft.functions.ArrayFns.wordNgramHashes(lower(col("text")), 4)).as("g"))
      .localCheckpoint()
    val evalG = grams.filter(col("doc_id") % 25 === 0).select("g").distinct().localCheckpoint()
    val corpus = grams.filter(col("doc_id") % 25 =!= 0)

    def overlap(pre: org.apache.spark.sql.DataFrame) =
      pre.join(evalG, "g")
        .groupBy(col("doc_id")).agg(count_distinct(col("g")).as("n_shared"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val exact = overlap(corpus)
    val bf = evalG.stat.bloomFilter("g", math.max(evalG.count(), 64L), 0.01)
    val bytes = BloomProbe.toBytes(bf)
    val filtered = corpus.filter(BloomProbe.mightContainLong(col("g"), bytes))
    assert(overlap(filtered) == exact,
      "bloom prefilter must not change the exact overlap result")
    // and the prefilter actually prunes: the corpus gram stream is mostly
    // non-contaminated, so most rows must die before the join
    assert(filtered.count() < corpus.count() / 2,
      "prefilter should prune the majority of non-matching grams")
  }

  test("probes compare by filter CONTENT, so canonicalization/CSE can unify them") {
    import spark.implicits._
    val bf = Seq(1L, 2L).toDF("k").stat.bloomFilter("k", 64, 0.01)
    // two independently serialized copies of the same filter: semantically
    // identical probes must be equal (case-class Array fields compare by
    // reference — the defect this pins)
    val e1 = graft.functions.BloomMightContainLong(
      org.apache.spark.sql.catalyst.expressions.Literal(1L), BloomProbe.toBytes(bf))
    val e2 = graft.functions.BloomMightContainLong(
      org.apache.spark.sql.catalyst.expressions.Literal(1L), BloomProbe.toBytes(bf))
    assert(!(e1.filterBytes eq e2.filterBytes), "test needs distinct byte arrays")
    assert(e1 == e2 && e1.hashCode == e2.hashCode,
      "content-identical probes must compare equal (canonicalization/CSE)")
    val other = Seq(9L).toDF("k").stat.bloomFilter("k", 64, 0.01)
    assert(e1 != e1.copy(filterBytes = BloomProbe.toBytes(other)),
      "different filters must not compare equal")
    // explain/toString must print a summary, not a JVM array reference
    assert(e1.toString.contains("-byte filter") && !e1.toString.contains("[B@"),
      s"unreadable toString: $e1")
  }

  test("non-bigint input is rejected at analysis time") {
    import spark.implicits._
    val bytes = BloomProbe.toBytes(Seq(1L).toDF("k").stat.bloomFilter("k", 64, 0.01))
    val err = intercept[Exception] {
      Seq("x").toDF("s").filter(BloomProbe.mightContainLong(col("s"), bytes)).collect()
    }
    assert(err.getMessage.contains("bigint"))
  }
}
