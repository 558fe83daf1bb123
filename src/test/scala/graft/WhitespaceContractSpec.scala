package graft

import org.apache.spark.sql.functions._

/** The regex-dialect whitespace contract behind every token/redaction
  * oracle (t28 token counts, t68 redaction scans, t69 sequence packing,
  * t50/t46 and friends): Spark compiles `\S` with java.util.regex, DuckDB
  * with RE2, and the two classes are NOT identical. Empirically (DuckDB
  * 1.0.0, probed while writing this spec):
  *
  *   - space, \t, \n, \r, \f: whitespace in BOTH dialects — agreement.
  *   - \x0b (vertical tab): whitespace in Java (`\s` = [ \t\n\x0B\f\r])
  *     but NOT in RE2 — "a\x0bb" is 2 Java tokens, 1 RE2 token. This is
  *     the one ASCII divergence point.
  *   - non-ASCII whitespace (U+00A0 NBSP, U+2003 em-space, U+2028 line
  *     sep, U+200B ZWSP): NOT whitespace in either dialect (both run
  *     byte/ASCII classes here) — agreement, though tokenization of such
  *     text is semantically wrong in both engines the same way.
  *
  * The oracles therefore agree with Spark iff the corpus contains no
  * vertical tab; the byte-arithmetic oracles (t29 fingerprints, m35–m38
  * container fields via `unicode(substring(...))`) further require pure
  * ASCII so byte == codepoint. This spec pins BOTH facts: the Java-side
  * behavior at the divergence point, and that the test corpus stays
  * inside the agreement regime — if a future generator ever emits VT or
  * non-ASCII, the purity test fails HERE with a named cause instead of
  * surfacing as an inscrutable oracle hash mismatch.
  */
class WhitespaceContractSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("Java \\S splits on vertical tab — the RE2 divergence point") {
    import spark.implicits._
    val counts = Seq("a\u000bb").toDF("s")
      .select(regexp_count(col("s"), lit("\\S+")).as("n")).head().getInt(0)
    // Java: VT is whitespace, so two tokens. RE2/DuckDB sees ONE token —
    // any VT in a tokenized column makes the t28/t69 oracles diverge.
    assert(counts == 2, "java.util.regex must treat \\x0b as whitespace")
  }

  test("both dialects agree on the rest of the ASCII whitespace set") {
    import spark.implicits._
    // each separator yields 2 Java tokens; DuckDB probed at 2 as well
    val seps = Seq(" ", "\t", "\n", "\r", "\f")
    val df = seps.map(sep => s"a${sep}b").toDF("s")
      .select(regexp_count(col("s"), lit("\\S+")).as("n"))
    assert(df.collect().forall(_.getInt(0) == 2))
    // and non-ASCII "whitespace" is a token character in BOTH dialects
    val uni = Seq("a\u00a0b", "a\u2003b", "a\u2028b", "a\u200bb").toDF("s")
      .select(regexp_count(col("s"), lit("\\S+")).as("n"))
    assert(uni.collect().forall(_.getInt(0) == 1))
  }

  test("the corpus stays inside the dialect-agreement regime") {
    // printable ASCII + {tab, newline, carriage return} only: no VT (the
    // \S divergence), no FF/controls, nothing multi-byte (byte-arithmetic
    // oracles assume byte == codepoint)
    val offenders = Tables.documents(spark, dir)
      .filter(col("text").rlike("[^\\x20-\\x7e\\t\\n\\r]"))
      .count()
    assert(offenders == 0,
      s"$offenders documents carry bytes outside printable-ASCII+[\\t\\n\\r]; " +
        "the DuckDB oracles for token counts and byte arithmetic are only " +
        "valid inside that regime (see scaladoc)")
  }
}
