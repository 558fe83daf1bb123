package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode canonicalization kernels — the normalization stage every text
  * pipeline runs BEFORE hashing, deduplication, or tokenization. Without
  * it, "café" (composed U+00E9) and "café" (e + combining U+0301) hash to
  * different fingerprints and dodge every exact-dedup arm; NFKC further
  * folds compatibility forms (ﬁ → fi, ① → 1, full-width → ASCII) the way
  * crawler output actually needs.
  *
  * Static JVM kernels called from whole-stage codegen (the SimKit
  * pattern) — `java.text.Normalizer` is allocation-light and the fast path
  * (`isNormalized`, overwhelmingly true for real corpora) avoids the
  * rewrite entirely. No UDFs, no interpreted fallback.
  */
object TextNormKit {

  /** NFC canonical composition. Returns the INPUT object unchanged when the
    * text is already normalized (the overwhelmingly common case), so the
    * fast path allocates nothing. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  /** NFKC compatibility composition (ligatures, width, circled forms). */
  def nfkc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFKC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFKC))
  }

  /** Accent strip: NFD-decompose, drop combining marks, recompose. The
    * dedup-canonicalization fold ("résumé" ≡ "resume"); NOT reversible —
    * use only in fingerprint/cluster keys, never on stored text. */
  def stripAccents(s: UTF8String): UTF8String = {
    val str = s.toString
    val d = Normalizer.normalize(str, Normalizer.Form.NFD)
    var i = 0
    var hasMark = false
    while (i < d.length && !hasMark) {
      val t = Character.getType(d.charAt(i))
      hasMark = t == Character.NON_SPACING_MARK ||
        t == Character.COMBINING_SPACING_MARK ||
        t == Character.ENCLOSING_MARK
      i += 1
    }
    if (!hasMark && (d eq str)) s
    else {
      val sb = new java.lang.StringBuilder(d.length)
      var j = 0
      while (j < d.length) {
        val c = d.charAt(j)
        val t = Character.getType(c)
        if (t != Character.NON_SPACING_MARK && t != Character.COMBINING_SPACING_MARK &&
          t != Character.ENCLOSING_MARK) sb.append(c)
        j += 1
      }
      UTF8String.fromString(
        Normalizer.normalize(sb.toString, Normalizer.Form.NFC))
    }
  }
}

private[functions] abstract class TextNormExpr extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"expects string, got ${child.dataType.simpleString}")
  protected def kernel: String
  override def nullSafeEval(s: Any): Any = s match {
    case u: UTF8String => eval0(u)
    case _ => throw new IllegalStateException("string input expected")
  }
  protected def eval0(u: UTF8String): UTF8String
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextNormKit.$kernel($c)")
}

case class NfcNormalize(child: Expression) extends TextNormExpr {
  override def prettyName: String = "graft_nfc"
  override protected def kernel: String = "nfc"
  override protected def eval0(u: UTF8String): UTF8String = TextNormKit.nfc(u)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class NfkcNormalize(child: Expression) extends TextNormExpr {
  override def prettyName: String = "graft_nfkc"
  override protected def kernel: String = "nfkc"
  override protected def eval0(u: UTF8String): UTF8String = TextNormKit.nfkc(u)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class StripAccents(child: Expression) extends TextNormExpr {
  override def prettyName: String = "graft_strip_accents"
  override protected def kernel: String = "stripAccents"
  override protected def eval0(u: UTF8String): UTF8String = TextNormKit.stripAccents(u)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextNorm {
  def nfc(c: Column): Column =
    GraftColumnBridge.column(NfcNormalize(GraftColumnBridge.expression(c)))
  def nfkc(c: Column): Column =
    GraftColumnBridge.column(NfkcNormalize(GraftColumnBridge.expression(c)))
  def stripAccents(c: Column): Column =
    GraftColumnBridge.column(StripAccents(GraftColumnBridge.expression(c)))
}
