package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd probe into a pre-built Bloom filter over 64-bit keys.
  *
  * Spark's optimizer-injected runtime bloom join filter
  * (`might_contain(bloom_filter_agg(...))`, proven in RuntimeFilterSpec) is
  * not user-invokable — the functions are internal-only — and it only fires
  * inside a single join's planning. This expression is the EXPLICIT half a
  * pipeline needs: build the filter once over a probe set (eval-benchmark
  * n-grams, a tombstone list, an allowlist), persist or broadcast its bytes,
  * and prefilter any number of corpus passes with a branch-free per-row
  * check before the exact verify join.
  *
  * Bloom filters have NO false negatives, so `prefilter → exact join` is
  * result-identical to the exact join alone; false positives only cost a
  * little extra verify work (bounded by fpp). That is what makes the probe
  * safe to drop into a correctness-gated plan.
  *
  * The deserialized filter is attached to the generated code as a reference
  * object — deserialization happens once per task-JVM plan instance, not per
  * row, and the serialized bytes ride the plan the way a broadcast small-dim
  * does (filters are ~1.2 bytes/key at fpp=0.01, ~100× smaller than the
  * exact key set they guard).
  */
case class BloomMightContainLong(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"expects bigint, got ${child.dataType.simpleString}")

  // filterBytes is an Array[Byte] field on a case class, so the synthesized
  // equals/hashCode compare it by REFERENCE — two semantically identical
  // probes would never compare equal, blocking expression canonicalization
  // and common-subexpression elimination. Content-based overrides restore
  // value semantics; toString/sql print a compact summary instead of a JVM
  // array reference.
  override def equals(other: Any): Boolean = other match {
    case b: BloomMightContainLong =>
      child == b.child && java.util.Arrays.equals(filterBytes, b.filterBytes)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(filterBytes)
  override def toString: String =
    s"$prettyName($child, <${filterBytes.length}-byte filter>)"
  override def sql: String = s"$prettyName(${child.sql})"

  @transient private lazy val bf: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(filterBytes))

  override def nullSafeEval(v: Any): Any = bf.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bfRef = ctx.addReferenceObj("graftBloomFilter", bf, classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$bfRef.mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomProbe {

  /** Serialize a Spark sketch BloomFilter to bytes (the persistable /
    * plan-embeddable form consumed by [[mightContainLong]]). */
  def toBytes(bf: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Column probe: true iff `key` might be in the serialized filter —
    * guaranteed true for every inserted key (no false negatives). */
  def mightContainLong(key: Column, filterBytes: Array[Byte]): Column =
    GraftColumnBridge.column(
      BloomMightContainLong(GraftColumnBridge.expression(key), filterBytes))
}
