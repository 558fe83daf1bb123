package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-pattern matcher — the blocklist-filtering stage
  * (UT1-style domain/phrase lists, unsafe-content term lists) every
  * web-corpus pipeline runs. One pass over the text counts occurrences of
  * EVERY pattern simultaneously: O(text + matches) per document regardless
  * of list size, where the regex-alternation a naive filter reaches for is
  * O(text × patterns) and falls over at the 10⁴–10⁵ patterns real
  * blocklists carry.
  *
  * Matches are counted at every ending position for every pattern
  * (overlapping included — "aa" occurs twice in "aaa"), which is also what
  * a position-scan oracle counts; case handling belongs to the caller
  * (lower() the input to match a lowercased list).
  *
  * The automaton is built ONCE per plan from the pattern list and attached
  * to generated code as a reference object — per-row work is the bare
  * goto/fail walk, no UDF, no per-row regex compilation.
  */
final class AhoCorasick(patterns: Array[String]) extends Serializable {
  require(patterns.nonEmpty, "empty pattern list")
  require(patterns.forall(_.nonEmpty), "empty pattern")

  // Flat trie: per-node char→child map, failure link, and the number of
  // dictionary strings ending at the node INCLUDING via suffix links
  // (pre-summed so the scan never walks suffix chains).
  private val children = mutable.ArrayBuffer(mutable.Map.empty[Char, Int])
  private val fail = mutable.ArrayBuffer(0)
  private val ends = mutable.ArrayBuffer(0L)

  patterns.foreach { p =>
    var v = 0
    p.foreach { c =>
      v = children(v).getOrElseUpdate(c, {
        children += mutable.Map.empty[Char, Int]
        fail += 0
        ends += 0L
        children.length - 1
      })
    }
    ends(v) += 1L
  }
  locally {
    val queue = mutable.Queue.empty[Int]
    children(0).valuesIterator.foreach { v => fail(v) = 0; queue += v }
    while (queue.nonEmpty) {
      val v = queue.dequeue()
      ends(v) += ends(fail(v)) // dictionary-suffix counts accumulate
      children(v).foreach { case (c, u) =>
        var f = fail(v)
        while (f != 0 && !children(f).contains(c)) f = fail(f)
        fail(u) = children(f).get(c).filter(_ != u).getOrElse(0)
        queue += u
      }
    }
  }
  // immutable flat form for the scan
  private val gotoMaps: Array[Map[Char, Int]] = children.map(_.toMap).toArray
  private val failArr: Array[Int] = fail.toArray
  private val endsArr: Array[Long] = ends.toArray

  /** Total number of (position, pattern) matches in `text`. */
  def countMatches(text: UTF8String): Long = {
    val s = text.toString
    var state = 0
    var total = 0L
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      var st = state
      while (st != 0 && !gotoMaps(st).contains(c)) st = failArr(st)
      state = gotoMaps(st).getOrElse(c, 0)
      total += endsArr(state)
      i += 1
    }
    total
  }
}

/** Count of blocklist-pattern occurrences in a string (overlapping,
  * all patterns, one pass). */
case class BlocklistHits(child: Expression, patterns: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_blocklist_hits"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"expects string, got ${child.dataType.simpleString}")

  @transient private lazy val ac = new AhoCorasick(patterns.toArray)

  override def nullSafeEval(s: Any): Any = ac.countMatches(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("graftAhoCorasick", ac, classOf[AhoCorasick].getName)
    defineCodeGen(ctx, ev, c => s"$acRef.countMatches($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Blocklist {
  def hits(text: Column, patterns: Seq[String]): Column =
    GraftColumnBridge.column(
      BlocklistHits(GraftColumnBridge.expression(text), patterns))
}
