package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** Content-defined chunking (CDC) over binary payloads — the blob-dedup
  * primitive (Muthitacharoen et al., SOSP'01 LBFS): chunk boundaries are
  * placed where a rolling hash of the last W bytes hits a divisor
  * condition, so boundaries move WITH the content. Insert a byte at the
  * front of a blob and fixed-size blocks all shift (0% dedup); CDC chunks
  * re-synchronize after ~one chunk and everything downstream still
  * deduplicates — which is why near-identical media blobs (re-encoded
  * thumbnails, re-crawled pages, repacked audio) dedup at chunk level when
  * whole-blob hashes miss them.
  *
  * Constants are part of the on-disk contract (chunk ids must be stable
  * across runs and engines): window W=8, polynomial base 31, modulus
  * 2³¹−1, divisor 16 (expected chunk ≈ 16 bytes at test scale; production
  * would raise the divisor to hit ~64 KiB chunks). The hash over window
  * bytes b[i−7..i] is Σ b[i−j]·31ʲ mod (2³¹−1); position i (1-based in the
  * body) ends a chunk iff that value ≡ 0 (mod 16). The body end always
  * ends the final chunk. All arithmetic stays < 2⁶³ and is reproduced
  * verbatim by the DuckDB oracle.
  */
object CdcKit {

  val W = 8
  val HeaderLen = 14
  private val Mod = 2147483647L
  private val Div = 16L
  // 31^0 .. 31^7 — literal in the oracle SQL too
  private val Pow: Array[Long] =
    Array(1L, 31L, 961L, 29791L, 923521L, 28629151L, 887503681L, 27512614111L)

  /** 1-based chunk END positions in the payload BODY (bytes after the
    * 14-byte GRFT1 header), strictly increasing, last element = body
    * length. Empty array for an empty body. */
  def chunkEnds(payload: Array[Byte]): ArrayData = {
    require(payload.length >= HeaderLen,
      s"payload shorter than GRFT1 header: ${payload.length}")
    val n = payload.length - HeaderLen
    if (n == 0) return new GenericArrayData(Array.empty[Long])
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var i = W
    while (i <= n) {
      var h = 0L
      var j = 0
      while (j < W) {
        h += (payload(HeaderLen + i - 1 - j) & 0xffL) * Pow(j)
        j += 1
      }
      if (h % Mod % Div == 0L) out += i.toLong
      i += 1
    }
    if (out.isEmpty || out.last != n.toLong) out += n.toLong
    new GenericArrayData(out.toArray)
  }
}

/** Chunk-end positions of a GRFT1 payload's body under the CdcKit contract. */
case class CdcChunkEnds(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_cdc_chunk_ends"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"expects binary, got ${child.dataType.simpleString}")

  override def nullSafeEval(v: Any): Any =
    CdcKit.chunkEnds(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CdcKit.chunkEnds($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Cdc {
  def chunkEnds(payload: Column): Column =
    GraftColumnBridge.column(CdcChunkEnds(GraftColumnBridge.expression(payload)))
}
