package graft.sources

/** Spec-derived WARC fixture bytes (ISO 28500 framing) — built from
  * the published record grammar, the same fixture philosophy as
  * [[NetCdfFixtures]]: a plain multi-record file, the Common Crawl
  * gzip-member-per-record layout, and a mid-file corruption. */
object WarcFixtures {

  private def ascii(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  /** One framed record: headers + Content-Length'd block + the
    * record-terminating double CRLF. */
  def record(typ: String, uri: String, date: String,
             block: Array[Byte]): Array[Byte] = {
    val ct =
      if (typ == "response") "application/http;msgtype=response"
      else "application/warc-fields"
    ascii(s"WARC/1.0\r\nWARC-Type: $typ\r\n" +
      (if (uri.nonEmpty) s"WARC-Target-URI: $uri\r\n" else "") +
      s"WARC-Date: $date\r\nContent-Type: $ct\r\n" +
      s"Content-Length: ${block.length}\r\n\r\n") ++
      block ++ ascii("\r\n\r\n")
  }

  /** An HTTP response block (status line + headers + body). */
  def httpBlock(status: Int, contentType: String,
                body: String): Array[Byte] =
    ascii(s"HTTP/1.1 $status X\r\nContent-Type: $contentType\r\n" +
      "Server: fixture\r\n\r\n") ++ ascii(body)

  private def gzipMember(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(b); gz.close()
    bos.toByteArray
  }

  private val Info = record("warcinfo", "", "2024-01-01T00:00:00Z",
    ascii("software: graft\r\n"))

  /** Plain .warc: warcinfo + two responses (200 html, 404 text). */
  def plainWarc(): Array[Byte] =
    Info ++
      record("response", "https://ex.com/a", "2024-01-01T00:00:01Z",
        httpBlock(200, "text/html", "<html>hello a</html>")) ++
      record("response", "https://ex.com/b", "2024-01-01T00:00:02Z",
        httpBlock(404, "text/plain", "missing"))

  /** Common Crawl layout: one gzip member PER record, concatenated. */
  def ccWarcGz(): Array[Byte] =
    gzipMember(Info) ++
      gzipMember(record("response", "https://cc.example.co.uk/c",
        "2024-01-02T00:00:00Z",
        httpBlock(200, "text/html;charset=utf-8", "c-body web page")))

  /** A valid response followed by corrupt framing: the WHOLE file
    * must quarantine (no partial rows). */
  def brokenWarc(): Array[Byte] =
    record("response", "https://ex.com/a", "2024-01-01T00:00:01Z",
      httpBlock(200, "text/html", "<html>hello a</html>")) ++
      ascii("WARX/1.0\r\ngarbage framing\r\n\r\n")
}
