package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WebDataset-style tar-shard source — the de-facto shipping format
  * for large multimodal training corpora (LAION, img2dataset output):
  * samples are packed as consecutive members of plain POSIX tar
  * files ("shards"), one member per modality sharing a key prefix
  * (`<key>.txt`, `<key>.cls`, `<key>.jpg`, …), and the SHARD is the
  * unit of parallelism — a reader streams whole shards sequentially,
  * never seeking, so throughput is pure sequential I/O and work is
  * distributed by handing different shards to different executors.
  *
  * This implements both halves with no external deps (tar's ustar
  * layout is just 512-byte headers + zero-padded data blocks):
  *
  *   - [[writeShards]] packs a keyed (name → bytes) dataset into
  *     fixed-size shards, assembled executor-side (one group per
  *     shard — bounded by membersPerShard) and written through the
  *     Hadoop FS API, so the build is distributed exactly like the
  *     real packers.
  *   - [[readMembers]] reads shards through Spark's binaryFile source
  *     (one row per shard = one sequential stream per task) and walks
  *     the tar structure into (shard, name, bytes) member rows.
  *
  * The gate (q223) round-trips the documents table: text + class
  * members packed per doc, read back, re-grouped by key, and compared
  * against the source table by length/md5 — the q85/q95 source
  * round-trip discipline.
  */
object TarShards {

  /** Samples per shard (the real knob is ~shard bytes; member count
    * keeps the fixture deterministic). */
  val MembersPerShard = 100

  private val BlockSize = 512

  /** One ustar header + padded data region for a member. */
  private[graft] def tarEntry(name: String, bytes: Array[Byte]): Array[Byte] = {
    require(name.getBytes("UTF-8").length < 100, s"tar name too long: $name")
    val header = new Array[Byte](BlockSize)
    def put(s: String, off: Int, len: Int): Unit = {
      val b = s.getBytes("UTF-8")
      System.arraycopy(b, 0, header, off, math.min(b.length, len))
    }
    put(name, 0, 100)
    put("0000644", 100, 8)                       // mode
    put("0000000", 108, 8)                       // uid
    put("0000000", 116, 8)                       // gid
    put(f"${bytes.length}%011o", 124, 12)        // size, octal
    put("00000000000", 136, 12)                  // mtime: epoch (deterministic)
    put("        ", 148, 8)                      // checksum: spaces while summing
    header(156) = '0'                            // typeflag: regular file
    put("ustar", 257, 6)
    put("00", 263, 2)
    val sum = header.map(b => b & 0xff).sum
    put(f"$sum%06o", 148, 7)                     // 6 octal digits
    header(154) = 0                              // then NUL + space
    header(155) = ' '
    val padded = (bytes.length + BlockSize - 1) / BlockSize * BlockSize
    val out = new Array[Byte](BlockSize + padded)
    System.arraycopy(header, 0, out, 0, BlockSize)
    System.arraycopy(bytes, 0, out, BlockSize, bytes.length)
    out
  }

  /** Parse a whole tar stream into (name, bytes) members. Stops at
    * the end-of-archive zero block (or EOF). */
  private[graft] def parseTar(tar: Array[Byte]): Seq[(String, Array[Byte])] = {
    val out = Seq.newBuilder[(String, Array[Byte])]
    var off = 0
    while (off + BlockSize <= tar.length && tar(off) != 0) {
      val name = new String(tar, off, 100, "UTF-8").takeWhile(_ != '\u0000')
      val size = java.lang.Long.parseLong(
        new String(tar, off + 124, 12, "UTF-8").trim.takeWhile(_ != '\u0000'), 8).toInt
      val data = java.util.Arrays.copyOfRange(tar, off + BlockSize,
        off + BlockSize + size)
      out += ((name, data))
      off += BlockSize + (size + BlockSize - 1) / BlockSize * BlockSize
    }
    out.result()
  }

  /** Pack keyed members into shards named `shard-NNNNN.tar`, one tar
    * per `shardOf` group, assembled and written executor-side.
    * Members are laid out in (key, name) order within a shard —
    * WebDataset requires a sample's members adjacent. */
  def writeShards(spark: SparkSession, members: DataFrame, outDir: String): Unit = {
    import spark.implicits._
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    members.select(col("shard").cast("long"), col("name").cast("string"),
        col("bytes").cast("binary"))
      .as[(Long, String, Array[Byte])]
      .groupByKey(_._1)
      .mapGroups { (shard: Long, it: Iterator[(Long, String, Array[Byte])]) =>
        val entries = it.toSeq.sortBy(_._2)
        val body = entries.flatMap(e => tarEntry(e._2, e._3)).toArray
        val tar = body ++ new Array[Byte](2 * BlockSize) // end-of-archive
        val p = new Path(outDir, f"shard-$shard%05d.tar")
        val fs = p.getFileSystem(confBc.value.value)
        val os = fs.create(p, true)
        try os.write(tar) finally os.close()
        shard
      }
      .count()
    ()
  }

  /** (shard, name, bytes) member rows; one task streams one shard. */
  def readMembers(spark: SparkSession, tarDir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.tar").load(tarDir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, tar) =>
        val shard = path.substring(path.lastIndexOf('/') + 1)
        parseTar(tar).map { case (name, bytes) => (shard, name, bytes) }
      }
      .toDF("shard", "name", "bytes")
  }

  /** The q223 gate: per sample key, re-group the `.txt` + `.cls`
    * members read back from the shards and report the text length,
    * text md5 and decoded class — comparable against the documents
    * table directly (a parse or pairing bug cannot hash-match). */
  def webdatasetTable(spark: SparkSession, tarDir: String): DataFrame =
    readMembers(spark, tarDir)
      .withColumn("doc_id",
        regexp_extract(col("name"), "^(\\d+)\\.", 1).cast("long"))
      .withColumn("ext", regexp_extract(col("name"), "\\.([a-z]+)$", 1))
      .groupBy(col("doc_id"))
      .agg(
        max(when(col("ext") === "txt", length(col("bytes"))))
          .cast("long").as("txt_len"),
        max(when(col("ext") === "txt", md5(col("bytes")))).as("txt_md5"),
        max(when(col("ext") === "cls", col("bytes").cast("string"))).as("cls"))
      .orderBy(col("doc_id"))
}
