package graft

import graft.sources.{Warc, WarcFixtures}
import org.apache.spark.sql.functions.col

/** Pins [[Warc]] — ISO 28500 record framing, the Common Crawl
  * gzip-member-per-record layout, embedded HTTP response parsing, and
  * whole-file fail-closed quarantine on corrupt framing. */
class WarcSpec extends SparkSuite {

  test("plain multi-record file: framing, HTTP parse, payloads") {
    val recs = Warc.parseAll(WarcFixtures.plainWarc())
    assert(recs.map(_.recordType) === Seq("warcinfo", "response",
      "response"))
    val a = recs(1)
    assert(a.targetUri === "https://ex.com/a")
    assert(a.httpStatus === 200 && a.httpContentType === "text/html")
    assert(new String(a.payload, "UTF-8") === "<html>hello a</html>")
    assert(recs(2).httpStatus === 404)
    assert(new String(recs(2).payload, "UTF-8") === "missing")
  }

  test("Common Crawl layout: concatenated gzip members inflate as one") {
    val recs = Warc.parseAll(WarcFixtures.ccWarcGz())
    assert(recs.size === 2)
    assert(recs(1).targetUri === "https://cc.example.co.uk/c")
    assert(new String(recs(1).payload, "UTF-8") === "c-body web page")
  }

  test("LF-only writers parse; CRLF and LF mix within one file") {
    val lf = ("WARC/1.0\nWARC-Type: metadata\nContent-Length: 3\n\n" +
      "abc\n\n").getBytes("UTF-8")
    val recs = Warc.parseAll(lf)
    assert(recs.size === 1 && new String(recs.head.payload) === "abc")
  }

  test("corrupt gzip MEMBER BOUNDARY fails closed, never a silent " +
    "partial parse (the JDK stream treats it as trailing garbage)") {
    val gz = WarcFixtures.ccWarcGz()
    // locate the second member's magic and mangle it
    val second = (1 until gz.length - 1).find(i =>
      gz(i) == 0x1F.toByte && gz(i + 1) == 0x8B.toByte).get
    val mangled = gz.clone()
    mangled(second) = 'X'
    intercept[Exception](Warc.parseAll(mangled))
    // deflate-data corruption and trailer corruption also fail closed
    val midFlip = gz.clone()
    midFlip(second + 12) = (midFlip(second + 12) ^ 0x55).toByte
    intercept[Exception](Warc.parseAll(midFlip))
    val crcFlip = gz.clone()
    crcFlip(gz.length - 6) = (crcFlip(gz.length - 6) ^ 0x01).toByte
    intercept[Exception](Warc.parseAll(crcFlip))
  }

  test("corrupt framing fails the whole file closed") {
    intercept[Exception](Warc.parseAll(WarcFixtures.brokenWarc()))
    // missing Content-Length
    intercept[Exception](Warc.parseAll(
      "WARC/1.0\r\nWARC-Type: metadata\r\n\r\nxx\r\n\r\n".getBytes))
    // block escaping the file
    intercept[Exception](Warc.parseAll(
      "WARC/1.0\r\nContent-Length: 999\r\n\r\nshort".getBytes))
  }

  test("read: binaryFile end-to-end with per-file quarantine routing") {
    val dir = java.nio.file.Files.createTempDirectory("warcs")
    java.nio.file.Files.write(dir.resolve("a.warc"),
      WarcFixtures.plainWarc())
    java.nio.file.Files.write(dir.resolve("b.warc.gz"),
      WarcFixtures.ccWarcGz())
    java.nio.file.Files.write(dir.resolve("bad.warc"),
      WarcFixtures.brokenWarc())
    val rows = Warc.read(spark, s"file://$dir")
    assert(rows.filter(col("status") === "ok").count() === 5)
    val q = rows.filter(col("status") === "quarantined")
      .select("path").collect().map(_.getString(0))
    assert(q.length === 1 && q.head.endsWith("bad.warc"))
  }

  test("end-to-end crawl shape: WARC -> HTML text extraction -> " +
    "quality gate composes on the payload column") {
    val rich = WarcFixtures.record("response", "https://ex.com/rich",
      "2024-01-03T00:00:00Z",
      WarcFixtures.httpBlock(200, "text/html",
        "<html><head><title>T</title><style>x{}</style></head><body>" +
          "<h1>Header</h1><p>the quick brown fox jumps over the " +
          "lazy dog</p></body></html>"))
    val dir = java.nio.file.Files.createTempDirectory("warcpipe")
    java.nio.file.Files.write(dir.resolve("rich.warc"), rich)
    val pages = Warc.read(spark, s"file://$dir")
      .filter(col("status") === "ok" &&
        col("record_type") === "response" &&
        col("http_content_type").startsWith("text/html"))
      .select(col("target_uri"),
        graft.llm.Html.extractText(col("payload").cast("string"))
          .as("text"))
    val row = pages.collect().head
    assert(row.getString(0) === "https://ex.com/rich")
    val text = row.getString(1)
    assert(text.contains("the quick brown fox") && !text.contains("<p>")
      && !text.contains("x{}"))
    // and the quality gate runs straight on the extracted column
    assert(pages.filter(graft.llm.Clean.qualityKeep(col("text"),
      graft.llm.Clean.Config(minTokens = 5))).count() === 1)
  }

  test("records spanning gzip member boundaries reframe exactly " +
    "(non-CC layouts: members split mid-header and mid-block)") {
    val plain = WarcFixtures.plainWarc()
    // re-gzip the SAME byte stream as 37-byte members — every record
    // crosses several member boundaries, exercising the pending-buffer
    // compaction paths
    val out = new java.io.ByteArrayOutputStream()
    plain.grouped(37).foreach { slice =>
      val gz = new java.util.zip.GZIPOutputStream(out)
      gz.write(slice); gz.finish()
    }
    val want = Warc.parseAll(plain)
    val got = Warc.parseAll(out.toByteArray)
    assert(got.map(_.recordType) === want.map(_.recordType))
    assert(got.map(_.targetUri) === want.map(_.targetUri))
    assert(got.map(r => new String(r.payload, "UTF-8")) ===
      want.map(r => new String(r.payload, "UTF-8")))
  }

  test("property: ANY member segmentation of the same byte stream " +
    "reframes to identical records") {
    val plain = WarcFixtures.plainWarc()
    val want = Warc.parseAll(plain).map(r =>
      (r.recordType, r.targetUri, r.payload.toSeq))
    val rnd = new scala.util.Random(11)
    (1 to 20).foreach { trial =>
      // random cut points, including 1-byte members at the extremes
      val out = new java.io.ByteArrayOutputStream()
      var i = 0
      while (i < plain.length) {
        val n = 1 + rnd.nextInt(if (trial % 4 == 0) 3 else 97)
        val gz = new java.util.zip.GZIPOutputStream(out)
        gz.write(plain, i, math.min(n, plain.length - i)); gz.finish()
        i += n
      }
      val got = Warc.parseAll(out.toByteArray).map(r =>
        (r.recordType, r.targetUri, r.payload.toSeq))
      assert(got === want, s"trial $trial reframed differently")
    }
  }

  test("full-size Common Crawl envelope: a stream inflating past the " +
    "2 GiB JVM array wall parses member-streamed in bounded memory") {
    // one 32 MiB-body record, deflated ONCE; the same compressed
    // member repeated 68x inflates to 68 * 32 MiB ≈ 2.18 GiB — the
    // old whole-file accumulator could not even represent it
    val body = new Array[Byte](32 << 20)
    val member = {
      val bos = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(WarcFixtures.record("resource", "https://ex.com/big",
        "2024-01-01T00:00:00Z", body))
      gz.close()
      bos.toByteArray
    }
    val n = 68
    val stream = new Array[Byte](member.length * n)
    (0 until n).foreach(i =>
      System.arraycopy(member, 0, stream, i * member.length, member.length))
    assert(n.toLong * body.length > Int.MaxValue.toLong) // past the wall
    var count = 0L
    var bytesSeen = 0L
    Warc.recordIterator(stream).foreach { r =>
      count += 1
      bytesSeen += r.payload.length
      assert(r.recordType === "resource")
    }
    assert(count === n)
    assert(bytesSeen === n.toLong * body.length)
  }

  test("a gzip member inflating past the member cap raises a regular " +
    "(quarantinable) exception, not an OutOfMemoryError") {
    val big = WarcFixtures.record("resource", "https://ex.com/bomb",
      "2024-01-01T00:00:00Z", new Array[Byte](1 << 20))
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(big); gz.close()
    val e = intercept[IllegalArgumentException](
      Warc.memberIterator(bos.toByteArray, memberCap = 1024).next())
    assert(e.getMessage.contains("inflates past"))
    // and the whole-file contract: the record walk fails closed too
    intercept[IllegalArgumentException](
      Warc.recordIterator(bos.toByteArray, memberCap = 1024)
        .foreach(_ => ()))
  }

  test("readStream: arriving WARC files ingest incrementally with " +
    "per-file quarantine; text extraction composes on the stream") {
    val dir = java.nio.file.Files.createTempDirectory("warcstream")
    java.nio.file.Files.write(dir.resolve("a.warc"),
      WarcFixtures.plainWarc())
    java.nio.file.Files.write(dir.resolve("bad.warc"),
      WarcFixtures.brokenWarc())
    val pages = Warc.readStream(spark, s"file://$dir")
      .select(col("path"), col("record_type"), col("status"),
        graft.llm.Html.extractText(col("payload").cast("string"))
          .as("text"))
    val q = pages.writeStream.format("memory").queryName("crawl_feed")
      .start()
    try {
      q.processAllAvailable()
      val t = spark.table("crawl_feed")
      assert(t.filter(col("status") === "ok").count() === 3)
      assert(t.filter(col("status") === "quarantined").count() === 1)
      assert(t.filter(col("text").contains("hello a")).count() === 1)
      // batch 2: one more file arrives — only ITS records land (the
      // source's file tracking processes each file exactly once)
      java.nio.file.Files.write(dir.resolve("b.warc.gz"),
        WarcFixtures.ccWarcGz())
      q.processAllAvailable()
      val t2 = spark.table("crawl_feed")
      assert(t2.filter(col("status") === "ok").count() === 5)
      assert(t2.filter(col("status") === "quarantined").count() === 1)
    } finally q.stop()
  }

  test("fuzz: truncations and bit flips raise or parse, never hang or " +
    "yield phantom records") {
    val good = WarcFixtures.plainWarc()
    (0 until good.length by 7).foreach { n =>
      try {
        val recs = Warc.parseAll(good.take(n))
        assert(recs.size <= 3)
      } catch { case _: Exception => () } // fail-closed is fine
    }
    val gz = WarcFixtures.ccWarcGz()
    val rnd = new scala.util.Random(5)
    (1 to 300).foreach { _ =>
      val b = gz.clone()
      val i = rnd.nextInt(b.length)
      val v = rnd.nextInt().toByte
      try {
        val recs = Warc.parseAll(b.updated(i, v))
        // a flip that still parses must NOT have silently dropped a
        // record (the partial-parse invariant); content may differ
        // only when the flip was a no-op or landed in header slack
        assert(recs.size === 2,
          s"silent partial parse: flip at $i -> ${recs.size} records")
      } catch { case _: Exception => () } // fail-closed is fine
    }
  }
}
