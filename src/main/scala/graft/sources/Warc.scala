package graft.sources

import java.io.ByteArrayOutputStream
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (Web ARChive, ISO 28500) shard source — the raw-crawl front
  * door: every 100 TB LLM corpus starts as WARC files (Common Crawl
  * ships ~100k `.warc.gz` shards per snapshot), and the SHARD is the
  * unit of parallelism exactly as for tar/TFRecord shards — a reader
  * streams whole files sequentially, never seeking, so throughput is
  * pure sequential I/O and work distributes by handing different
  * shards to different executors.
  *
  * Dependency-free, both halves (the [[TarShards]]/[[TfRecords]]
  * discipline):
  *
  *   - [[writeShards]] packs (shard, doc_id, url, html) page rows into
  *     `shard-NNNNN.warc` / `.warc.gz` files, assembled executor-side:
  *     one `warcinfo` record then one `response` record per page, each
  *     response wrapping a full HTTP/1.1 response (status line +
  *     headers + body) under `Content-Type: application/http;
  *     msgtype=response` — the layout real crawlers emit. Odd shards
  *     are gzipped ONE MEMBER PER RECORD (the real `.warc.gz`
  *     convention: per-record members keep records independently
  *     seekable), even shards stay plain, so one fixture corpus
  *     exercises both codec paths like a real mixed crawl bucket.
  *   - [[readRecords]] reads whole shards through Spark's binaryFile
  *     source (one row per shard = one sequential stream per task),
  *     detects gzip by magic bytes (GZIPInputStream consumes
  *     concatenated members transparently), and walks the record
  *     structure: WARC header block → `Content-Length` → payload →
  *     record separator; `application/http` payloads are further
  *     parsed into status / headers / body.
  *
  * A record whose framing is corrupt fails loudly (`require`) rather
  * than resynchronizing silently — at ingest scale a quarantine pass
  * belongs upstream, and a reader that invents record boundaries
  * poisons every downstream count.
  */
object Warc {

  /** Pages per shard (the real knob is ~1 GB of shard bytes; a page
    * count keeps the fixture deterministic). */
  val PagesPerShard = 100

  private val Crlf = "\r\n"

  /** One parsed record: `http_status` is 0 and `content_type`/`body`
    * empty for non-http records (warcinfo); `target_uri` empty when
    * the header is absent. */
  case class WarcRecord(file: String, record_id: String, warc_type: String,
                        target_uri: String, http_status: Long,
                        http_content_type: String, body: Array[Byte])

  /** Serialize one WARC record: named headers + Content-Length +
    * blank line + payload + the two-CRLF record separator. */
  private def record(headers: Seq[(String, String)],
                     payload: Array[Byte]): Array[Byte] = {
    val head = (Seq("WARC/1.0") ++
      headers.map { case (k, v) => s"$k: $v" } ++
      Seq(s"Content-Length: ${payload.length}", "", ""))
      .mkString(Crlf).getBytes("UTF-8")
    head ++ payload ++ (Crlf + Crlf).getBytes("UTF-8")
  }

  /** The file-level `warcinfo` record every conformant WARC opens
    * with. Deterministic date: fixture files must be byte-stable. */
  private[graft] def warcinfoRecord(filename: String): Array[Byte] = {
    val info = s"software: graft$Crlf" + s"format: WARC File Format 1.0$Crlf"
    record(Seq(
      "WARC-Type" -> "warcinfo",
      "WARC-Record-ID" -> s"<urn:graft:warcinfo:$filename>",
      "WARC-Date" -> "2026-01-01T00:00:00Z",
      "WARC-Filename" -> filename,
      "Content-Type" -> "application/warc-fields"),
      info.getBytes("UTF-8"))
  }

  /** One `response` record wrapping a full HTTP/1.1 200 response. */
  private[graft] def responseRecord(docId: Long, uri: String,
                                    html: Array[Byte]): Array[Byte] = {
    val http = (s"HTTP/1.1 200 OK$Crlf" +
      s"Content-Type: text/html; charset=utf-8$Crlf" +
      s"Content-Length: ${html.length}$Crlf" + Crlf).getBytes("UTF-8") ++ html
    record(Seq(
      "WARC-Type" -> "response",
      "WARC-Record-ID" -> s"<urn:graft:doc-$docId>",
      "WARC-Date" -> "2026-01-01T00:00:00Z",
      "WARC-Target-URI" -> uri,
      "Content-Type" -> "application/http; msgtype=response"),
      http)
  }

  /** One gzip member (own header+trailer) — concatenated members are
    * the `.warc.gz` convention and what GZIPInputStream reads back
    * transparently. Java's gzip header is byte-deterministic (MTIME
    * 0), so fixture shards are stable across builds. */
  private def gzipMember(bytes: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(bytes.length / 2 + 64)
    val gz = new GZIPOutputStream(bos)
    gz.write(bytes); gz.close()
    bos.toByteArray
  }

  /** Pack page rows (`shard` long, `doc_id` long, `url` string,
    * `html` string) into `shard-NNNNN.warc[.gz]` files, one file per
    * shard group, assembled and written executor-side through the
    * Hadoop FS API (distributed exactly like a real crawler's shard
    * writers). Records are laid out in doc_id order within a shard.
    * Odd shards gzip per-record; even shards are plain. */
  def writeShards(spark: SparkSession, pages: DataFrame, outDir: String): Unit = {
    import spark.implicits._
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    pages.select(col("shard").cast("long"), col("doc_id").cast("long"),
        col("url").cast("string"), col("html").cast("string"))
      .as[(Long, Long, String, String)]
      .groupByKey(_._1)
      .mapGroups { (shard: Long, it: Iterator[(Long, Long, String, String)]) =>
        val gz = shard % 2 == 1
        val name = f"shard-$shard%05d.warc" + (if (gz) ".gz" else "")
        val records = warcinfoRecord(name) +:
          it.toSeq.sortBy(_._2).map { case (_, id, url, html) =>
            responseRecord(id, url, html.getBytes("UTF-8")) }
        val bytes =
          if (gz) records.flatMap(gzipMember(_)).toArray
          else records.flatten.toArray
        val p = new Path(outDir, name)
        val fs = p.getFileSystem(confBc.value.value)
        val os = fs.create(p, true)
        try os.write(bytes) finally os.close()
        shard
      }
      .count()
    ()
  }

  private def gunzipAll(bytes: Array[Byte]): Array[Byte] = {
    val in = new GZIPInputStream(new java.io.ByteArrayInputStream(bytes), 65536)
    val bos = new ByteArrayOutputStream(bytes.length * 4)
    val buf = new Array[Byte](65536)
    var n = in.read(buf)
    while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
    in.close()
    bos.toByteArray
  }

  private def isGzip(b: Array[Byte]): Boolean =
    b.length >= 2 && (b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x8b

  /** Find the index of the first CRLFCRLF at/after `from`; -1 if none. */
  private def blankLine(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n')
        return i
      i += 1
    }
    -1
  }

  /** Parse one whole (decompressed) WARC stream into records. */
  private[graft] def parseWarc(file: String, stream: Array[Byte]): Seq[WarcRecord] = {
    val out = Seq.newBuilder[WarcRecord]
    var off = 0
    while (off < stream.length) {
      // skip inter-record CRLFs
      while (off < stream.length &&
        (stream(off) == '\r' || stream(off) == '\n')) off += 1
      if (off < stream.length) {
        val hdrEnd = blankLine(stream, off)
        require(hdrEnd >= 0, s"$file: unterminated WARC header block at offset $off")
        val headLines = new String(stream, off, hdrEnd - off, "UTF-8").split(Crlf)
        require(headLines.headOption.exists(_.startsWith("WARC/")),
          s"$file: record at offset $off does not start with a WARC version line")
        val headers = headLines.tail.flatMap { l =>
          val i = l.indexOf(':')
          if (i < 0) None else Some(l.take(i).trim -> l.drop(i + 1).trim)
        }.toMap
        val len = headers.getOrElse("Content-Length",
          sys.error(s"$file: record at offset $off has no Content-Length")).toInt
        val payloadStart = hdrEnd + 4
        require(payloadStart + len <= stream.length,
          s"$file: record at offset $off truncated (wants $len payload bytes)")
        val payload = java.util.Arrays.copyOfRange(stream, payloadStart,
          payloadStart + len)
        val wtype = headers.getOrElse("WARC-Type", "")
        val (status, ctype, body) =
          if (headers.get("Content-Type").exists(_.startsWith("application/http")))
            parseHttp(file, payload)
          else (0L, "", Array.empty[Byte])
        out += WarcRecord(file, headers.getOrElse("WARC-Record-ID", ""), wtype,
          headers.getOrElse("WARC-Target-URI", ""), status, ctype, body)
        off = payloadStart + len
      }
    }
    out.result()
  }

  /** Split an HTTP response payload into (status, content-type, body). */
  private def parseHttp(file: String, payload: Array[Byte]): (Long, String, Array[Byte]) = {
    val hdrEnd = blankLine(payload, 0)
    require(hdrEnd >= 0, s"$file: http payload has no header terminator")
    val lines = new String(payload, 0, hdrEnd, "UTF-8").split(Crlf)
    val statusLine = lines.head.split(" ")
    require(statusLine.length >= 2 && statusLine(0).startsWith("HTTP/"),
      s"$file: malformed http status line '${lines.head}'")
    val ctype = lines.tail.collectFirst {
      case l if l.toLowerCase.startsWith("content-type:") => l.drop(13).trim
    }.getOrElse("")
    (statusLine(1).toLong, ctype,
      java.util.Arrays.copyOfRange(payload, hdrEnd + 4, payload.length))
  }

  /** Record rows from every `*.warc` / `*.warc.gz` under `dir`; one
    * task streams one shard (binaryFile source, no seeks). */
  def readRecords(spark: SparkSession, dir: String): Dataset[WarcRecord] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc*").load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val file = path.substring(path.lastIndexOf('/') + 1)
        parseWarc(file, if (isGzip(bytes)) gunzipAll(bytes) else bytes)
      }
  }
}
