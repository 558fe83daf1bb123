package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the similarity/dedup hot loops, each a
  * thin codegen'd call into a [[SimKit]] static kernel (the proven
  * [[SortedIntersectCount]] pattern). Replacing the interpreted
  * higher-order-function formulations with these closed the bulk of the
  * round-1 bench gap (t31 79 s / t32 40 s at sf0.1 were ~all lambda
  * interpretation overhead).
  */
private[graft] trait SimKitCall { self: Expression =>
  /** Fully-qualified static call target in generated Java. */
  protected final val kit = "graft.functions.SimKit"

  protected def requireType(
      e: Expression,
      ok: DataType => Boolean,
      what: String): TypeCheckResult =
    if (ok(e.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"expects $what, got ${e.dataType.simpleString}")

  protected final def isLongArray(t: DataType): Boolean = t match {
    case ArrayType(LongType, _) => true
    case _ => false
  }
  protected final def isFloatArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  protected final def isVecArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  /** Element types match, IGNORING containsNull: strict ArrayType equality
    * would reject e.g. a parquet column (containsNull = true) against a
    * builder literal (false) with an error message naming two identical
    * `array<float>`s — nullability is a per-element runtime concern the
    * kernels handle themselves (raise or null per their contracts). */
  protected final def sameElemType(l: DataType, r: DataType): Boolean = (l, r) match {
    case (ArrayType(a, _), ArrayType(b, _)) => a == b
    case _ => false
  }
}

/** Distinct sorted char-3-gram shingle hashes of a (lowercased) string. */
case class CharShingleHashes(child: Expression)
    extends UnaryExpression with SimKitCall {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    requireType(child, _ == StringType, "string")
  override def nullSafeEval(s: Any): Any =
    SimKit.charShingles(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"$kit.charShingles($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit md5-head hash of every `\S+` token of a (lowercased) string. */
case class TokenHashes64(child: Expression)
    extends UnaryExpression with SimKitCall {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    requireType(child, _ == StringType, "string")
  override def nullSafeEval(s: Any): Any =
    SimKit.tokenHashes64(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"$kit.tokenHashes64($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Distinct sorted 64-bit hashes of every word `n`-gram of a (lowercased)
  * string — contamination-check join keys (t48). */
case class WordNgramHashes(child: Expression, n: Int)
    extends UnaryExpression with SimKitCall {
  require(n >= 1, "n-gram size must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    requireType(child, _ == StringType, "string")
  override def nullSafeEval(s: Any): Any =
    SimKit.wordNgramHashes64(s.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"$kit.wordNgramHashes64($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Positional (or distinct-sorted) 64-bit k-gram fingerprints over a token
  * array — the DupSpans/TemplateGrams gram key (internal fingerprints only;
  * see SimKit.kgramHashesAt). */
case class KgramHashes(child: Expression, k: Int, distinct: Boolean)
    extends UnaryExpression with SimKitCall {
  require(k >= 1, "k-gram size must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    requireType(child, {
      case ArrayType(StringType, _) => true
      case _ => false
    }, "array<string>")
  override def nullSafeEval(a: Any): Any =
    if (distinct) SimKit.kgramHashesDistinct(a.asInstanceOf[ArrayData], k)
    else SimKit.kgramHashesAt(a.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      if (distinct) s"$kit.kgramHashesDistinct($c, $k)" else s"$kit.kgramHashesAt($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Leftmost-greedy BPE merge pass(es) over a symbol array — the
  * trainer/encoder hot loop as a native kernel instead of an interpreted
  * `aggregate(...)` HOF. `sequentialPasses = false` is the trainer's batch
  * form (one pass, pairwise-disjoint rules checked per step);
  * `true` is the encoder's (one full pass per rule, in learned order). */
case class ApplyMerges(child: Expression, rules: Seq[(String, String)], sequentialPasses: Boolean)
    extends UnaryExpression with SimKitCall {
  require(rules.nonEmpty, "need at least one merge rule")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    requireType(child, {
      case ArrayType(StringType, _) => true
      case _ => false
    }, "array<string>")
  @transient private lazy val lhsArr = rules.map(r => UTF8String.fromString(r._1)).toArray
  @transient private lazy val rhsArr = rules.map(r => UTF8String.fromString(r._2)).toArray
  @transient private lazy val mergedArr = rules.map(r => UTF8String.fromString(r._1 + r._2)).toArray
  override def nullSafeEval(a: Any): Any =
    if (sequentialPasses) SimKit.applyMergesSeq(a.asInstanceOf[ArrayData], lhsArr, rhsArr, mergedArr)
    else SimKit.applyMergesBatch(a.asInstanceOf[ArrayData], lhsArr, rhsArr, mergedArr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = "org.apache.spark.unsafe.types.UTF8String[]"
    val l = ctx.addReferenceObj("bpeLhs", lhsArr, cls)
    val r = ctx.addReferenceObj("bpeRhs", rhsArr, cls)
    val m = ctx.addReferenceObj("bpeMerged", mergedArr, cls)
    val fn = if (sequentialPasses) "applyMergesSeq" else "applyMergesBatch"
    defineCodeGen(ctx, ev, c => s"$kit.$fn($c, $l, $r, $m)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-document intra-repetition counts [t2,s2,t3,s3,t4,s4] of a
  * (lowercased) string — word-n-gram totals and distincts for
  * n ∈ {2,3,4} in ONE tokenization pass (t166's kernel). */
case class IntraDupCounts(child: Expression)
    extends UnaryExpression with SimKitCall {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    requireType(child, _ == StringType, "string")
  override def nullSafeEval(s: Any): Any =
    SimKit.intraDupCounts(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"$kit.intraDupCounts($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** K=32 minhash signature over a shingle-hash array. */
case class MinHashSig(child: Expression)
    extends UnaryExpression with SimKitCall {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    requireType(child, isLongArray, "array<bigint>")
  override def nullSafeEval(a: Any): Any =
    SimKit.minhashSig(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"$kit.minhashSig($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit majority-vote simhash over a token-hash array. */
case class SimHash64(child: Expression)
    extends UnaryExpression with SimKitCall {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    requireType(child, isLongArray, "array<bigint>")
  override def nullSafeEval(a: Any): Any =
    SimKit.simhash64(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"$kit.simhash64($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Cosine similarity of two equal-element-type vector arrays, in double. */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with SimKitCall {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (isVecArray(left.dataType) && sameElemType(left.dataType, right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"expects two array<float> or two array<double> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  private lazy val isFloat = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  private def fn: String = if (isFloat) "cosineF" else "cosineD"
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (isFloat) SimKit.cosineF(x, y) else SimKit.cosineD(x, y)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"$kit.$fn($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Sequential-fold dot product of two equal-element-type vector arrays, in
  * double — the codegen'd replacement for `aggregate(zip_with(...))`,
  * which Spark evaluates on the interpreted HOF path. Fold order matches
  * DuckDB's `list_sum(list_transform(...))` bit for bit (PcaPower's
  * zero-tolerance oracle contract). */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with SimKitCall {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (isVecArray(left.dataType) && sameElemType(left.dataType, right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"expects two array<float> or two array<double> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  private lazy val isFloat = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  private def fn: String = if (isFloat) "dotF" else "dotD"
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (isFloat) SimKit.dotF(x, y) else SimKit.dotD(x, y)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"$kit.$fn($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** L2 norm of a float vector; NULL on a NULL input OR any NULL element —
  * the reporting variant for vector health checks (t54), where [[CosineSim]]
  * deliberately raises instead.
  */
case class L2Norm(child: Expression) extends UnaryExpression with SimKitCall {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    requireType(child, isFloatArray, "array<float>")
  override def nullSafeEval(a: Any): Any = SimKit.l2NormOrNull(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val boxed = ctx.freshName("norm")
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    ev.copy(code =
      code"""
        ${c.code}
        boolean ${ev.isNull} = true;
        double ${ev.value} = 0.0;
        if (!${c.isNull}) {
          java.lang.Double $boxed = $kit.l2NormOrNull(${c.value});
          if ($boxed != null) { ${ev.isNull} = false; ${ev.value} = $boxed.doubleValue(); }
        }
      """)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** SRP LSH bucket (low `nBits` bits) of a float-array embedding. */
case class SrpBucket(child: Expression, nBits: Int)
    extends UnaryExpression with SimKitCall {
  require(nBits >= 1 && nBits <= SimKit.SrpBits, s"nBits must be in [1, ${SimKit.SrpBits}]")
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    requireType(child, isFloatArray, "array<float>")
  override def nullSafeEval(a: Any): Any =
    SimKit.srpBucket(a.asInstanceOf[ArrayData], nBits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"$kit.srpBucket($c, $nBits)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Banded early-exit edit distance: exact Levenshtein when ≤ `threshold`,
  * −1 otherwise — the builtin `levenshtein(l, r, t)` contract on the
  * [[SimKit.editDistBanded]] kernel (O((2t+1)·len) band, O(1) length-gap
  * reject, row-min early exit). Sits in the t130 fuzzy-dedup verify hot
  * loop; equivalence to the builtin is pinned in EditDistSpec.
  *
  * The threshold is a full integer EXPRESSION, so a verify stage can hand
  * every pair its OWN band (t130 uses `max_len / 4` — the pair's exact
  * accept budget), which is both tighter than any global bound and free of
  * the extra driver-side max-length job a global bound needs. A negative
  * per-row threshold short-circuits to −1 in the kernel. */
case class EditDistWithin(left: Expression, right: Expression, threshold: Expression)
    extends TernaryExpression with SimKitCall {
  override def first: Expression = left
  override def second: Expression = right
  override def third: Expression = threshold
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType
        && threshold.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"expects (string, string, int), got ${left.dataType.simpleString} / " +
        s"${right.dataType.simpleString} / ${threshold.dataType.simpleString}")
  override def nullSafeEval(a: Any, b: Any, t: Any): Any =
    SimKit.editDistBanded(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], t.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, t) => s"$kit.editDistBanded($a, $b, $t)")
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(left = newFirst, right = newSecond, threshold = newThird)
}
