package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TFRecord shard source — the TensorFlow training-data container
  * (and the second shipping format next to WebDataset tar): a shard
  * is a flat stream of length-framed records, each
  *
  *   uint64 length (LE) · uint32 masked CRC32C(length bytes) ·
  *   data[length] · uint32 masked CRC32C(data)
  *
  * with TensorFlow's masking `rotr(crc, 15) + 0xa282ead8` over the
  * Castagnoli CRC (JDK `java.util.zip.CRC32C` — no external deps).
  * Both halves are implemented and the reader VERIFIES both checksums
  * per record (`require`, loud) — a truncated or bit-flipped shard
  * fails at parse, exactly like TensorFlow's reader, instead of
  * feeding silent garbage into training.
  *
  * Scale shape mirrors [[TarShards]]: the SHARD is the unit of
  * parallelism — writers assemble one shard per group executor-side,
  * readers stream one shard per task via `binaryFile` with zero
  * seeking. The gate (q251) round-trips the documents table and
  * compares length + content md5 per record against the source rows.
  */
object TfRecords {

  /** Records per shard (deterministic fixture knob, as in TarShards). */
  val RecordsPerShard = 100

  /** TensorFlow's CRC mask: rotate right 15, add the magic. 32-bit. */
  private def maskedCrc(bytes: Array[Byte]): Int = {
    val c = new java.util.zip.CRC32C()
    c.update(bytes)
    val crc = c.getValue.toInt
    ((crc >>> 15) | (crc << 17)) + 0xa282ead8.toInt
  }

  /** One framed record: length, masked length-CRC, data, data-CRC. */
  private[graft] def record(data: Array[Byte]): Array[Byte] = {
    val lenB = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putLong(data.length.toLong).array()
    java.nio.ByteBuffer.allocate(16 + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put(lenB).putInt(maskedCrc(lenB))
      .put(data).putInt(maskedCrc(data))
      .array()
  }

  /** Parse a shard stream into records, verifying BOTH checksums. */
  private[graft] def parse(stream: Array[Byte]): Seq[Array[Byte]] = {
    val out = Seq.newBuilder[Array[Byte]]
    var off = 0
    while (off + 12 <= stream.length) {
      val head = java.nio.ByteBuffer.wrap(stream, off, 12)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val len = head.getLong.toInt
      val lenCrc = head.getInt
      require(off + 16 + len <= stream.length,
        s"TFRecord: truncated record at offset $off")
      val lenB = java.util.Arrays.copyOfRange(stream, off, off + 8)
      require(maskedCrc(lenB) == lenCrc,
        s"TFRecord: length CRC mismatch at offset $off")
      val data = java.util.Arrays.copyOfRange(stream, off + 12, off + 12 + len)
      val dataCrc = java.nio.ByteBuffer.wrap(stream, off + 12 + len, 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
      require(maskedCrc(data) == dataCrc,
        s"TFRecord: data CRC mismatch at offset $off")
      out += data
      off += 16 + len
    }
    out.result()
  }

  /** Pack (shard, order, data) rows into `shard-NNNNN.tfrecord` files,
    * records laid out in `order` within each shard, assembled and
    * written executor-side (one group per shard). */
  def writeShards(spark: SparkSession, records: DataFrame, outDir: String): Unit = {
    import spark.implicits._
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    records.select(col("shard").cast("long"), col("order").cast("long"),
        col("data").cast("binary"))
      .as[(Long, Long, Array[Byte])]
      .groupByKey(_._1)
      .mapGroups { (shard: Long, it: Iterator[(Long, Long, Array[Byte])]) =>
        val body = it.toSeq.sortBy(_._2).flatMap(r => record(r._3)).toArray
        val p = new Path(outDir, f"shard-$shard%05d.tfrecord")
        val fs = p.getFileSystem(confBc.value.value)
        val os = fs.create(p, true)
        try os.write(body) finally os.close()
        shard
      }
      .count()
    ()
  }

  /** (shard, data) record rows; one task streams one shard and
    * checksum-verifies every record. */
  def readRecords(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.tfrecord").load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, stream) =>
        val shard = path.substring(path.lastIndexOf('/') + 1)
        parse(stream).map(data => (shard, data))
      }
      .toDF("shard", "data")
  }

  /** The q251 gate: records carry `<doc_id>\n<text>`; read back, split
    * the id prefix off, report framed length + text md5 per doc —
    * comparable against the documents table directly (a framing or
    * CRC bug cannot hash-match). */
  def roundTripTable(spark: SparkSession, dir: String): DataFrame =
    readRecords(spark, dir)
      .select(col("data"))
      .withColumn("s", col("data").cast("string"))
      .select(
        regexp_extract(col("s"), "^(\\d+)\\n", 1).cast("long").as("doc_id"),
        length(col("data")).cast("long").as("rec_len"),
        md5(expr("substring(s, instr(s, '\n') + 1)")).as("txt_md5"))
      .orderBy(col("doc_id"))
}
