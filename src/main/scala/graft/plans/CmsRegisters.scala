package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Count-Min sketch aggregate (d = 4 rows × w = 256 counters)
  * as a Catalyst [[TypedImperativeAggregate]] — the frequency
  * counterpart to [[HllRegisters]] (which answers "how many
  * DISTINCT"; this answers "how often is EACH item", biased only
  * upward).
  *
  * The hash reuses the engine's portable md5 convention: byte j of
  * md5(value) selects row j's counter, so every engine — and the
  * DuckDB oracle — reproduces the 1024-counter state integer-exactly.
  * Counters are summed pairwise under merge: the state is associative
  * and commutative, so partial aggregation, shuffle-side combine and
  * any partitioning give identical sketches.
  *
  * Why this shape at 100 TB: exact per-item frequencies for a follow-up
  * query (top talkers, spam keys, hot shards) need a full (key, item)
  * shuffle; this aggregate ships 8 KB per key per map partition
  * however many distinct items flow through, and sketches of disjoint
  * slices (days, shards) merge later by element-wise addition without
  * re-reading anything. Point estimates read min over the item's d
  * counters — an upper bound that overcounts only on collisions
  * (ε ≈ e/w of the total mass, δ ≈ e^-d).
  */
case class CmsRegisters(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cms_registers expects string (cast the item), got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "cms_registers"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](CmsRegisters.D * CmsRegisters.W)

  override def update(buf: Array[Long], input: org.apache.spark.sql.catalyst.InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      // thread-local engine, digest() self-resets — same discipline as
      // HllRegisters (per-row getInstance was the round-6 hot-path nit)
      val d = HllRegisters.digest.get()
        .digest(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)
      var j = 0
      while (j < CmsRegisters.D) {
        buf(j * CmsRegisters.W + (d(j) & 0xff)) += 1L
        j += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsRegisters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsRegisters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsRegisters =
    copy(child = newChild)
}

object CmsRegisters {
  /** Hash rows (depth). */
  val D = 4
  /** Counters per row (width). */
  val W = 256

  val info = new ExpressionInfo(classOf[CmsRegisters].getName, "cms_registers")
}
