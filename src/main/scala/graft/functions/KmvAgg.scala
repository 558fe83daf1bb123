package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** KMV (k-minimum-values, Bar-Yossef et al. RANDOM'02) distinct sketch as a
  * native mergeable Catalyst AGGREGATE — the third leg of the extension
  * surface next to the scalar kernels (SimExprs) and the whole-operator
  * plan (TopKPerKey). t91 builds the same sketch with distinct + TakeOrdered
  * as a global query; this form is what a 100-TB GROUPED sketch needs:
  * per-partition buffers of ≤ k longs, map-side partial aggregation,
  * serialized partials merged after a shuffle that carries k longs per
  * group instead of the group's whole key set. Bottom-k of a union is the
  * bottom-k of per-partition bottom-ks, so the merge is associative,
  * commutative, and duplicate-proof — the eval result is bit-identical for
  * every partitioning, which is what lets a DuckDB oracle certify the
  * sketch CONTENT (not just its estimate; contrast HLL in t57).
  *
  * Input is an already-hashed BIGINT column (the engine's md5-head idiom —
  * see t91/t94), so the aggregate composes with any key shape and the
  * oracle reproduces the hash verbatim. Returns the ascending array of the
  * kept hashes; estimate math ((k−1)·M/U_k) stays in query land where the
  * hash-space constant M lives.
  */
case class KmvAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k >= 1 && k <= 65536, s"graft_kmv k must be in [1, 65536], got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_kmv"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_kmv expects a BIGINT hash column, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit =
    if (buf.size < k) { buf.add(h); () }
    else if (h < buf.last) {
      // strictly smaller than the current k-th: admit, then re-trim (add
      // is a no-op on duplicates, so only trim when the size really grew)
      if (buf.add(h) && buf.size > k) { buf.pollLast(); () }
    }

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(
      a: java.util.TreeSet[java.lang.Long],
      b: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b.iterator()
    while (it.hasNext) add(a, it.next())
    a
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(n: Int): KmvAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KmvAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object KmvAgg {
  /** DataFrame-side aggregate column: bottom-k distinct hashes, ascending. */
  def kmv(hash: Column, k: Int): Column =
    GraftColumnBridge.column(
      KmvAgg(GraftColumnBridge.expression(hash), k).toAggregateExpression())
}
