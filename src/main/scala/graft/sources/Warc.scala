package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** WARC (ISO 28500) web-archive reader — the container format of
  * Common Crawl, the corpus every web-scale training-data pipeline
  * starts from. Parses both plain `.warc` and the Common Crawl
  * `.warc.gz` layout (one gzip MEMBER per record, concatenated — the
  * JDK's GZIPInputStream walks multi-member streams natively), splits
  * records on the spec's `WARC/...` header + Content-Length framing,
  * and for `response` records additionally parses the embedded HTTP
  * response (status line, headers, payload).
  *
  * Scale shape: record splitting is inherently sequential WITHIN a
  * file (Content-Length framing has no self-synchronizing marker), so
  * parallelism comes from files — exactly how the corpus ships. Size
  * envelope, stated honestly: this reader materializes each file's
  * inflated bytes in one JVM array, so it targets SHARDED archives
  * (≤ ~2 GiB inflated per file; Spark's binaryFile source itself caps
  * compressed content at ~2.1 GB, and a full-size ~1 GiB Common Crawl
  * segment inflates past the array limit — re-shard such archives, or
  * extend here with a streaming per-member parse; the member walk in
  * [[gunzipAll]] is already the right seam). `read` is a binaryFile
  * scan + per-partition flatMap: no driver work, no shuffle;
  * downstream text extraction starts from the payload column.
  *
  * Fail-closed: any malformed framing (bad magic, missing
  * Content-Length, truncated block, corrupt gzip) quarantines the
  * WHOLE file as one `status = "quarantined"` row — records before
  * the corruption are suppressed, never silently partial. */
object Warc {

  /** One parsed record (path added by [[read]]). `httpStatus` is 0
    * and `httpContentType` empty for non-response records; `payload`
    * is the HTTP body for responses, the raw block otherwise. */
  case class WarcRecord(recordType: String, targetUri: String,
                        warcDate: String, httpStatus: Int,
                        httpContentType: String, payload: Array[Byte])

  private val Gzip = Array[Byte](0x1F.toByte, 0x8B.toByte)

  /** Inflate a multi-member gzip stream with PER-MEMBER verification.
    * The JDK's GZIPInputStream deliberately treats an unparseable
    * next-member header as "trailing garbage" and reports a clean
    * end-of-stream — which would turn a corrupt member boundary into
    * a silent PARTIAL parse, violating the fail-closed contract. This
    * walk parses each member header itself, inflates with a raw
    * Inflater, and checks the member's CRC32 + ISIZE trailer; any
    * corruption — header, deflate data, trailer, or truncation —
    * throws. */
  private[sources] def gunzipAll(bytes: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](65536)
    var off = 0
    while (off < bytes.length) {
      require(off + 10 <= bytes.length &&
        bytes(off) == Gzip(0) && bytes(off + 1) == Gzip(1),
        s"bad gzip member header at $off")
      require(bytes(off + 2) == 8, "unsupported gzip compression method")
      val flg = bytes(off + 3) & 0xFF
      var p = off + 10
      if ((flg & 4) != 0) { // FEXTRA
        val xlen = (bytes(p) & 0xFF) | ((bytes(p + 1) & 0xFF) << 8)
        p += 2 + xlen
      }
      if ((flg & 8) != 0) { while (bytes(p) != 0) p += 1; p += 1 } // FNAME
      if ((flg & 16) != 0) { while (bytes(p) != 0) p += 1; p += 1 } // FCOMMENT
      if ((flg & 2) != 0) p += 2 // FHCRC
      val inf = new java.util.zip.Inflater(true)
      try {
        inf.setInput(bytes, p, bytes.length - p)
        val member = new java.io.ByteArrayOutputStream()
        while (!inf.finished()) {
          val n = inf.inflate(buf)
          require(n > 0 || !(inf.needsInput() || inf.needsDictionary()),
            s"truncated gzip member at $off")
          member.write(buf, 0, n)
        }
        val trailer = p + (bytes.length - p - inf.getRemaining)
        require(trailer + 8 <= bytes.length, "gzip trailer missing")
        val data = member.toByteArray
        val crc = new java.util.zip.CRC32()
        crc.update(data)
        def u32le(i: Int): Long =
          (bytes(i) & 0xFFL) | ((bytes(i + 1) & 0xFFL) << 8) |
            ((bytes(i + 2) & 0xFFL) << 16) | ((bytes(i + 3) & 0xFFL) << 24)
        require(u32le(trailer) == crc.getValue,
          s"gzip CRC mismatch in member at $off")
        require(u32le(trailer + 4) == (data.length & 0xFFFFFFFFL),
          s"gzip ISIZE mismatch in member at $off")
        out.write(data, 0, data.length)
        off = trailer + 8
      } finally inf.end()
    }
    out.toByteArray
  }

  /** Parse every record of one WARC file (gzip-sniffed). Throws on
    * malformed framing — [[read]] maps that to a quarantine row. */
  def parseAll(bytes0: Array[Byte]): Seq[WarcRecord] = {
    val bytes =
      if (bytes0.length >= 2 && bytes0(0) == Gzip(0) && bytes0(1) == Gzip(1))
        gunzipAll(bytes0)
      else bytes0
    val out = scala.collection.mutable.ArrayBuffer.empty[WarcRecord]
    var p = 0
    while (p < bytes.length) {
      // skip inter-record blank lines (the spec's two CRLFs live at
      // the END of each record; tolerate LF-only writers)
      while (p < bytes.length &&
        (bytes(p) == '\r' || bytes(p) == '\n')) p += 1
      if (p < bytes.length) {
        val (headers, bodyAt) = headerBlock(bytes, p)
        require(headers.headOption.exists(_.startsWith("WARC/")),
          s"bad WARC record magic at offset $p")
        val h = headerMap(headers.tail)
        val len64 = h.getOrElse("content-length",
          throw new IllegalArgumentException(
            s"record at $p lacks Content-Length")).trim.toLong
        require(len64 >= 0 && len64 <= Int.MaxValue - 16L,
          s"record length $len64 beyond this reader's array envelope")
        val len = len64.toInt
        require(bodyAt + len <= bytes.length,
          s"record block at $bodyAt escapes the file")
        val block = java.util.Arrays.copyOfRange(bytes, bodyAt, bodyAt + len)
        val rType = h.getOrElse("warc-type", "")
        val rec =
          if (rType == "response" &&
              h.getOrElse("content-type", "").startsWith("application/http"))
            httpResponse(block) match {
              case (status, ct, payload) =>
                WarcRecord(rType, h.getOrElse("warc-target-uri", ""),
                  h.getOrElse("warc-date", ""), status, ct, payload)
            }
          else WarcRecord(rType, h.getOrElse("warc-target-uri", ""),
            h.getOrElse("warc-date", ""), 0, "", block)
        out += rec
        p = bodyAt + len
      }
    }
    out.toSeq
  }

  /** Header lines up to the first blank line; returns (lines, offset
    * of the byte after the blank line). */
  private def headerBlock(bytes: Array[Byte], start: Int)
  : (Seq[String], Int) = {
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    var p = start
    var done = false
    while (!done) {
      var e = p
      while (e < bytes.length && bytes(e) != '\n') e += 1
      require(e < bytes.length, "unterminated header block")
      val lineEnd = if (e > p && bytes(e - 1) == '\r') e - 1 else e
      val line = new String(bytes, p, lineEnd - p,
        java.nio.charset.StandardCharsets.UTF_8)
      p = e + 1
      if (line.isEmpty) done = true else lines += line
    }
    (lines.toSeq, p)
  }

  private def headerMap(lines: Seq[String]): Map[String, String] =
    lines.flatMap { l =>
      val i = l.indexOf(':')
      if (i < 0) None else Some(l.take(i).toLowerCase -> l.drop(i + 1).trim)
    }.toMap

  /** Parse the HTTP response inside a response record's block:
    * (status, content-type, body). A block that is not an HTTP
    * response fails the file closed (the record CLAIMED msgtype
    * response). */
  private def httpResponse(block: Array[Byte])
  : (Int, String, Array[Byte]) = {
    val (lines, bodyAt) = headerBlock(block, 0)
    val status = lines.headOption match {
      case Some(s) if s.startsWith("HTTP/") =>
        s.split(" ", 3).lift(1).map(_.toInt).getOrElse(
          throw new IllegalArgumentException(s"bad status line '$s'"))
      case other =>
        throw new IllegalArgumentException(s"bad HTTP response: $other")
    }
    val hm = headerMap(lines.tail)
    (status, hm.getOrElse("content-type", ""),
      java.util.Arrays.copyOfRange(block, bodyAt, block.length))
  }

  /** `(path, content)` frame → one row per record, plus one
    * `status = "quarantined"` row per malformed file (the shared core
    * of [[read]], also driven directly by the fixture-pinned
    * queries). */
  def recordRows(files: DataFrame): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    files.select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        try parseAll(bytes).map(r => (p, r.recordType, r.targetUri,
          r.warcDate, r.httpStatus, r.httpContentType, r.payload,
          r.payload.length.toLong, "ok"))
        catch {
          // NonFatal: an InterruptedException from a Spark task kill
          // must propagate (a bare Exception catch would convert a
          // speculative-execution kill into a bogus quarantine row)
          case scala.util.control.NonFatal(_) =>
            Seq((p, "", "", "", 0, "",
              Array.emptyByteArray, 0L, "quarantined"))
        }
      }
      .toDF("path", "record_type", "target_uri", "warc_date",
        "http_status", "http_content_type", "payload", "payload_len",
        "status")
  }

  /** Distributed WARC scan: one row per record, plus one
    * `status = "quarantined"` row per malformed file. */
  def read(spark: SparkSession, path: String,
           glob: String = "*"): DataFrame =
    recordRows(spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .option("recursiveFileLookup", "true")
      .load(path))
}
