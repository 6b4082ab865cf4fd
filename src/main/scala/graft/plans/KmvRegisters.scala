package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native KMV / bottom-k ("theta") sketch as a Catalyst
  * [[TypedImperativeAggregate]] — the fourth native sketch, covering
  * SET EXPRESSIONS: the k smallest distinct md5 hashes of a key are a
  * uniform sample of the key's hash space, and signatures of
  * different slices support union (merge = min-k of the pooled set),
  * intersection and Jaccard estimates (|minK(A∪B) ∩ A ∩ B| / k) —
  * the Theta-sketch algebra HLL registers cannot express.
  *
  * The state is a bounded sorted set of k = 64 hex strings
  * (lexicographic order on lowercase hex == numeric order on the
  * hash, the same convention MinHash already relies on), so merge is
  * associative/commutative/idempotent and the emitted signature is
  * integer-exact: the DuckDB oracle recomputes it as the k smallest
  * DISTINCT md5 values per group. ~2 KB per key per partition. */
case class KmvRegisters(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[String]] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kmv_registers expects string (cast the key), got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_registers"

  override def createAggregationBuffer(): java.util.TreeSet[String] =
    new java.util.TreeSet[String]()

  private def add(buf: java.util.TreeSet[String], h: String): Unit = {
    if (buf.size < KmvRegisters.K) buf.add(h)
    else if (h < buf.last()) { // strictly below the current k-th value
      if (buf.add(h)) buf.pollLast()
    }
  }

  override def update(buf: java.util.TreeSet[String],
                      input: org.apache.spark.sql.catalyst.InternalRow): java.util.TreeSet[String] = {
    val v = child.eval(input)
    if (v != null) {
      val d = HllRegisters.digest.get()
        .digest(v.asInstanceOf[UTF8String].getBytes)
      val sb = new java.lang.StringBuilder(32)
      var i = 0
      while (i < 16) { sb.append(f"${d(i) & 0xff}%02x"); i += 1 }
      add(buf, sb.toString)
    }
    buf
  }

  override def merge(a: java.util.TreeSet[String],
                     b: java.util.TreeSet[String]): java.util.TreeSet[String] = {
    val it = b.iterator()
    while (it.hasNext) add(a, it.next())
    a
  }

  override def eval(buf: java.util.TreeSet[String]): Any = {
    val arr = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[String]): Array[Byte] = {
    val sb = new java.lang.StringBuilder()
    val it = buf.iterator()
    while (it.hasNext) { sb.append(it.next()); sb.append('\n') }
    sb.toString.getBytes("UTF-8")
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[String] = {
    val out = new java.util.TreeSet[String]()
    new String(bytes, "UTF-8").split("\n").filter(_.nonEmpty).foreach(out.add)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvRegisters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvRegisters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvRegisters =
    copy(child = newChild)
}

object KmvRegisters {
  /** Signature size. */
  val K = 64

  /** Distinct-count estimate: (K−1) / h_K where h_K is the K-th
    * smallest hash as a fraction of the 128-bit space (first 15 hex
    * digits — 60 bits — are plenty of precision). Undefined (returns
    * the exact size) when fewer than K distincts were seen: the
    * signature IS the full distinct set then. */
  def estimate(sig: Seq[String]): Double = {
    if (sig.length < K) sig.length.toDouble
    else {
      val hk = java.lang.Long.parseLong(sig.last.take(15), 16).toDouble /
        java.lang.Math.pow(16.0, 15)
      (K - 1) / hk
    }
  }

  /** KMV Jaccard estimate between two signatures: the fraction of the
    * pooled min-K that appears in BOTH signatures. */
  def jaccard(a: Seq[String], b: Seq[String]): Double = {
    val union = (a ++ b).distinct.sorted.take(K)
    val sa = a.toSet; val sb = b.toSet
    union.count(h => sa.contains(h) && sb.contains(h)).toDouble / union.length
  }

  val info = new ExpressionInfo(classOf[KmvRegisters].getName, "kmv_registers")
}
