package graft.catalyst

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Fixed-width bitmap kernels for the Leiden affected-frontier (and any
  * other dense-id vertex-set) path.
  *
  * The affected-frontier update — "neighbors of moved vertices become
  * affected" (`/root/reference/inc/leiden.hxx:427-429`) — is a set-union of
  * dst ids over the edges of moved srcs. As a `distinct()` it costs one
  * full-size hash aggregation over up to O(E) joined rows per half-sweep
  * (per-row random probes into a V-sized map: the single most
  * DRAM-expensive stage the scaling diagnostic found). Over a DENSE id
  * space the same set is a V-bit bitmap: per row one branch + one bit-OR
  * into a buffer that fits L2 (2M vertices = 250 KB), merged across
  * partitions by word-wise OR. The driver then holds the frontier as a
  * byte[] and feeds it back into the next sweep as a literal predicate —
  * no O(V) broadcast-relation build, no join.
  *
  * Bit layout: vertex id i lives at `bytes(i >>> 3)`, mask `1 << (i & 7)`
  * — identical in the aggregator's output, [[BitSetContainsExpr]], and the
  * driver-side helpers in [[graft.leiden.FrontierBits]].
  */
object BitSetKernels {
  def contains(bytes: Array[Byte], id: Long): Boolean =
    id >= 0 && id < (bytes.length.toLong << 3) &&
      ((bytes((id >>> 3).toInt) & (1 << (id & 7).toInt)) != 0)
}

/** Aggregate a LONG id column into a `numBits`-wide bitmap (BinaryType).
  * Ids outside [0, numBits) fail loudly — the caller gates this path on a
  * measured max id, and silently dropping a vertex would silently shrink
  * the affected frontier (wrong results, not just slow ones).
  */
case class BitSetOrAgg(
    child: Expression,
    numBits: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  require(numBits > 0 && numBits <= (1 << 30), s"numBits out of range: $numBits")
  private val numBytes = (numBits + 7) >>> 3

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bitset_or expects bigint, got ${child.dataType}")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bitset_or"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](numBytes)

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val id = v.asInstanceOf[Long]
      if (id < 0 || id >= numBits)
        throw new IllegalArgumentException(
          s"graft_bitset_or: id $id outside [0, $numBits)")
      buffer((id >>> 3).toInt) = (buffer((id >>> 3).toInt) | (1 << (id & 7).toInt)).toByte
    }
    buffer
  }

  override def merge(buffer: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < numBytes) { buffer(i) = (buffer(i) | other(i)).toByte; i += 1 }
    buffer
  }

  override def eval(buffer: Array[Byte]): Any = buffer
  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): BitSetOrAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitSetOrAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BitSetOrAgg =
    copy(child = newChildren.head)
}

/** `bitmap` (BinaryType, typically a literal byte[] the driver built from a
  * [[BitSetOrAgg]] result) tested at bit `id`. Ids outside the bitmap are
  * simply absent (false) — the predicate form of set membership. Codegen'd
  * (a static call into [[BitSetKernels]]), so frontier filters stay inside
  * whole-stage codegen; the literal rides the per-stage task binary
  * broadcast, not per-task closures.
  */
case class BitSetContainsExpr(left: Expression, right: Expression)
  extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bitset_contains expects (binary, bigint), got (${left.dataType}, ${right.dataType})")
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bitset_contains"
  override protected def nullSafeEval(bytes: Any, id: Any): Any =
    BitSetKernels.contains(bytes.asInstanceOf[Array[Byte]], id.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, i) => s"graft.catalyst.BitSetKernels.contains($b, $i)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): BitSetContainsExpr =
    copy(left = l, right = r)
}
