package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** Native HyperLogLog register aggregate (p = 8, m = 256 registers)
  * as a Catalyst [[TypedImperativeAggregate]] — the "novel sketch as a
  * custom TypedColumn" path of the brief's preference order (b).
  *
  * The hash is md5 over the UTF-8 input (the engine's portable hashing
  * convention — reference analog: content hashing in
  * stage_csv_dims_to_pg.py's staging flow): byte 0 selects the
  * register; the next 56 bits yield rank = leading-zero count + 1
  * (all-zero suffix → 57). Registers are the pairwise max — the state
  * is a 256-byte array that is associative, commutative and
  * idempotent under merge, so partial aggregation, shuffle-side
  * combine and ANY partitioning give byte-identical results.
  *
  * Why this shape at 100 TB: a per-key COUNT(DISTINCT x) shuffles
  * every distinct (key, x) pair; this aggregate shuffles exactly 256
  * bytes per key per map partition, and sketches of disjoint data
  * slices (days, shards, tables) merge later without re-reading
  * anything. The register array itself is the output (integer-exact,
  * DuckDB-reproducible nibble by nibble); the float estimate lives in
  * [[HllRegisters.estimate]] so the gated query stays bit-portable.
  */
case class HllRegisters(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hll_registers expects string (cast the key), got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "hll_registers"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](HllRegisters.M)

  override def update(buf: Array[Byte], input: org.apache.spark.sql.catalyst.InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      // digest() resets the engine after each call, so one instance per
      // thread serves every row — `getInstance` + provider lookup per
      // row was the hot-path allocation flagged in round 6
      val d = HllRegisters.digest.get()
        .digest(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)
      val bucket = d(0) & 0xFF
      var suffix = 0L
      var i = 1
      while (i < 8) { suffix = (suffix << 8) | (d(i) & 0xFFL); i += 1 }
      val rank =
        if (suffix == 0L) 57
        else java.lang.Long.numberOfLeadingZeros(suffix) - 8 + 1
      if (rank > buf(bucket)) buf(bucket) = rank.toByte
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < HllRegisters.M) {
      if (b(i) > a(i)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def eval(buf: Array[Byte]): Any =
    new GenericArrayData(buf.map(_.toInt))

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllRegisters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllRegisters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllRegisters =
    copy(child = newChild)
}

object HllRegisters {
  /** Register count (p = 8). */
  val M = 256

  /** One MD5 engine per task thread — MessageDigest is not
    * thread-safe, and expression instances can be shared within a JVM
    * in local mode. */
  private[plans] val digest: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** Classic HLL estimate with the small-range (linear counting)
    * correction — float math lives HERE, outside the gated query. */
  def estimate(regs: Seq[Int]): Double = {
    require(regs.length == M, s"expected $M registers, got ${regs.length}")
    val alpha = 0.7213 / (1.0 + 1.079 / M)
    val raw = alpha * M * M / regs.map(r => math.pow(2.0, -r)).sum
    val zeros = regs.count(_ == 0)
    if (raw <= 2.5 * M && zeros > 0) M * math.log(M.toDouble / zeros) else raw
  }

  val info = new ExpressionInfo(classOf[HllRegisters].getName, "hll_registers")
}
