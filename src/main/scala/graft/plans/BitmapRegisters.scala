package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** Native distinct-membership bitmap aggregate (m = 4096 buckets,
  * 512-byte state) as a Catalyst [[TypedImperativeAggregate]] — the
  * third native sketch, covering the LOW-cardinality regime:
  * [[HllRegisters]] estimates millions of distincts in 256 bytes but
  * is coarse under ~1k; a linear-counting bitmap is near-exact there,
  * and unlike HLL its registers support INTERSECTION estimates by
  * inclusion-exclusion (bitmap AND), not just union.
  *
  * Bucket = first 12 bits of md5 (the engine's portable hash
  * convention — the DuckDB oracle recomputes every set bit from the
  * same hex nibbles). Merge is bitwise OR: associative, commutative,
  * idempotent — partial aggregation, shuffle-side combine and
  * disjoint-slice rollups (day × shard) all give byte-identical
  * bitmaps while shuffling 512 B per key per map partition. The
  * output is the sorted set-bucket list (integer-exact, gateable);
  * the float estimate lives in [[BitmapRegisters.estimate]]. */
case class BitmapRegisters(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bitmap_registers expects string (cast the key), got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bitmap_registers"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](BitmapRegisters.M / 64)

  override def update(buf: Array[Long], input: org.apache.spark.sql.catalyst.InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val d = HllRegisters.digest.get()
        .digest(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)
      // first 12 bits: byte 0 + the high nibble of byte 1 — exactly
      // hex chars 1..3 of the md5 string the oracle reads
      val bucket = ((d(0) & 0xff) << 4) | ((d(1) & 0xff) >>> 4)
      buf(bucket >> 6) |= 1L << (bucket & 63)
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    val out = Array.newBuilder[Int]
    var bucket = 0
    while (bucket < BitmapRegisters.M) {
      if ((buf(bucket >> 6) & (1L << (bucket & 63))) != 0L) out += bucket
      bucket += 1
    }
    new GenericArrayData(out.result())
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapRegisters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapRegisters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BitmapRegisters =
    copy(child = newChild)
}

object BitmapRegisters {
  /** Bucket count (12 hash bits). */
  val M = 4096

  /** Linear-counting estimate: m · ln(m / zeros). Near-exact while
    * the bitmap is sparse; saturates (zeros → 0) around m·ln m ≈ 34k
    * distincts — beyond that, use [[HllRegisters]]. */
  def estimate(setBuckets: Int): Double = {
    val zeros = M - setBuckets
    require(zeros > 0, s"bitmap saturated ($setBuckets/$M) — use the HLL sketch")
    M * math.log(M.toDouble / zeros)
  }

  val info = new ExpressionInfo(classOf[BitmapRegisters].getName, "bitmap_registers")
}
