package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.functions.{AhoCorasick, Blocklist}
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick blocklist matcher (functions/Blocklist.scala): overlapping
  * all-occurrence semantics, randomized equivalence against a brute-force
  * position scan, and the Spark expression path end-to-end.
  */
class BlocklistSpec extends SparkTestBase {

  private def brute(text: String, patterns: Seq[String]): Long =
    patterns.map { p =>
      (0 to text.length - p.length).count(i => text.regionMatches(i, p, 0, p.length)).toLong
    }.sum

  private def ac(patterns: String*) = new AhoCorasick(patterns.toArray)

  test("overlapping occurrences all count") {
    assert(ac("aa").countMatches(UTF8String.fromString("aaaa")) == 3)
    assert(ac("slow", "low").countMatches(UTF8String.fromString("slow low")) == 3)
    assert(ac("aba").countMatches(UTF8String.fromString("ababa")) == 2)
  }

  test("dictionary-suffix patterns count at shared positions") {
    // "she" ends at a position where "he" also ends — the classic AC case
    assert(ac("she", "he", "hers").countMatches(UTF8String.fromString("shers")) == 3)
  }

  test("randomized equivalence with a brute-force position scan") {
    val rnd = new Random(1234)
    val alphabet = "ab "
    (1 to 200).foreach { _ =>
      val text = Seq.fill(rnd.nextInt(60) + 1)(alphabet(rnd.nextInt(alphabet.length))).mkString
      val pats = Seq.fill(rnd.nextInt(4) + 1)(
        Seq.fill(rnd.nextInt(3) + 1)(alphabet(rnd.nextInt(alphabet.length))).mkString).distinct
      val got = ac(pats: _*).countMatches(UTF8String.fromString(text))
      assert(got == brute(text, pats), s"text='$text' pats=$pats")
    }
  }

  test("expression path: codegen'd scan over the documents table") {
    import spark.implicits._
    val pats = Seq("slow", "low", "table")
    val rows = Tables.documents(spark, "/root/testdata/sf0.001")
      .limit(50)
      .select(col("doc_id"), lower(col("text")).as("t"))
      .withColumn("n", Blocklist.hits(col("t"), pats))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) == brute(r.getString(1), pats))
    }
    // null passthrough
    val n = Seq(Option.empty[String]).toDF("t")
      .select(Blocklist.hits(col("t"), pats)).head()
    assert(n.isNullAt(0))
  }
}
