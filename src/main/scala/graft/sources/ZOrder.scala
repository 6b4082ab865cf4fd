package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering key — multi-dimensional write layout.
  *
  * Range-clustering on ONE column ([[Sinks.writeSorted]]) makes
  * parquet min/max pruning sharp on that column and useless on every
  * other; interleaving the bits of two key columns gives each output
  * file a small rectangle in (x, y) space, so predicates on EITHER
  * column skip most files — the standard layout for two-dimensional
  * scan patterns (e.g. part × supplier, user × day).
  *
  * The key is a pure integer column expression (shifts/masks summed),
  * fully codegen'd and engine-portable — the q47 oracle recomputes the
  * identical unrolled expression in DuckDB.
  */
object ZOrder {

  /** Bit-interleaved Morton key of two non-negative integer columns,
    * `bits` low bits each (default 16 → 32-bit key). x takes even bit
    * positions, y odd. */
  def zkey2(x: Column, y: Column, bits: Int = 16): Column =
    (0 until bits).map { i =>
      (shiftright(x.cast("long"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))) +
        (shiftright(y.cast("long"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)))
    }.reduce(_ + _)

  /** Equivalent DuckDB SQL text for the same key (oracle mirror). */
  def zkey2Sql(x: String, y: String, bits: Int = 16): String =
    (0 until bits).map { i =>
      s"(($x >> $i) & 1) * ${1L << (2 * i)} + (($y >> $i) & 1) * ${1L << (2 * i + 1)}"
    }.mkString("(", " + ", ")")

  /** Driver-side mirror of [[scaled]] — identical double arithmetic,
    * so a pruning bound computed from a box corner lands exactly where
    * the data's own key expression would put it. */
  def scaledValue(v: Long, lo: Long, hi: Long, bits: Int = 16): Long = {
    val maxCode = (1L << bits) - 1
    if (hi <= lo) 0L
    else {
      val clamped = math.max(lo, math.min(v, hi)) // corners may overshoot the domain
      math.floor((clamped.toDouble - lo.toDouble) * maxCode.toDouble
        / (hi - lo).toDouble).toLong
    }
  }

  /** Driver-side mirror of [[zkey2]]: the Morton code of two scaled
    * coordinates. For any box, every point inside has its z-value in
    * [zvalue2(min corner), zvalue2(max corner)] — the classic Z-curve
    * bound that makes a 2D box query a single (conservative) key
    * range, refined by an exact row filter. */
  def zvalue2(x: Long, y: Long, bits: Int = 16): Long =
    (0 until bits).map { i =>
      (((x >> i) & 1L) << (2 * i)) + (((y >> i) & 1L) << (2 * i + 1))
    }.sum

  /** N-dimensional Morton key: column j takes bit positions
    * `i·N + j` — [[zkey2]] is the N = 2 case. With 16 bits per
    * dimension a 3-column key spans 48 bits, comfortably inside a
    * long; the same corner bound ([[zvalueN]]) turns an N-dimensional
    * box into one conservative key range. */
  def zkeyN(cs: Seq[Column], bits: Int = 16): Column = {
    val n = cs.length
    require(n >= 2 && n * bits <= 63, s"zkeyN: $n dims × $bits bits")
    (for { i <- 0 until bits; (c, j) <- cs.zipWithIndex } yield
      shiftright(c.cast("long"), i).bitwiseAND(lit(1L)) * lit(1L << (i * n + j))
    ).reduce(_ + _)
  }

  /** Driver-side mirror of [[zkeyN]] (box-corner bounds). */
  def zvalueN(vs: Seq[Long], bits: Int = 16): Long = {
    val n = vs.length
    (for { i <- 0 until bits; (v, j) <- vs.zipWithIndex } yield
      ((v >> i) & 1L) << (i * n + j)).sum
  }

  /** Column scaled to the full [0, 2^bits) domain given its min/max —
    * REQUIRED before interleaving: with unequal raw domains (say an
    * 11-bit partkey and a 7-bit suppkey) every high bit of the key
    * comes from the wider column and the sort degenerates to a
    * single-column cluster. */
  def scaled(c: Column, lo: Long, hi: Long, bits: Int): Column = {
    val maxCode = (1L << bits) - 1
    if (hi <= lo) lit(0L)
    else floor((c.cast("double") - lit(lo.toDouble)) * lit(maxCode.toDouble)
      / lit((hi - lo).toDouble)).cast("long")
  }

  /** Write parquet clustered by the Z-order key of (xCol, yCol): one
    * tiny min/max aggregate to learn the domains, both columns scaled
    * to the full 16-bit range, then one range exchange + local sort on
    * the interleaved key — each file covers a small (x, y) rectangle
    * and min/max stats prune on BOTH columns. `numFiles` is explicit
    * (AQE would otherwise coalesce a small range exchange into one
    * file, defeating the layout); size it as table bytes / target
    * file size. */
  def writeZOrdered(df: DataFrame, path: String, xCol: String, yCol: String,
                    numFiles: Int): Unit = {
    val bits = 16
    val r = df.agg(min(col(xCol)).cast("long"), max(col(xCol)).cast("long"),
      min(col(yCol)).cast("long"), max(col(yCol)).cast("long")).head()
    if (r.isNullAt(0)) { // empty input: nothing to cluster
      df.write.mode("overwrite").parquet(path)
      return
    }
    val keyed = df.withColumn("_zkey", zkey2(
      scaled(col(xCol), r.getLong(0), r.getLong(1), bits),
      scaled(col(yCol), r.getLong(2), r.getLong(3), bits), bits))
    keyed.repartitionByRange(numFiles, col("_zkey"))
      .sortWithinPartitions(col("_zkey"))
      .drop("_zkey")
      .write.mode("overwrite").parquet(path)
  }
}
