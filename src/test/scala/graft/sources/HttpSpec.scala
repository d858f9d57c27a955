package graft.sources

import graft.SparkSpec

import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}

/** The HTTP response layer's contract: status/header/body split on real
  * and damaged messages, folded + duplicate headers, chunked and
  * gzip/deflate unwrapping in wire order, and the browser charset
  * precedence (BOM > header > meta prescan > UTF-8) with lying labels
  * degrading to U+FFFD, never to a throw. */
class HttpSpec extends SparkSpec {

  private def msg(s: String): Array[Byte] = s.getBytes(ISO_8859_1)

  test("parseResponse: status line, headers, folding, duplicates, LF-only") {
    val r = Http.parseResponse(msg(
      "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
        "Set-Cookie: a=1\r\nSet-Cookie: b=2\r\n" +
        "X-Folded: part1\r\n  part2\r\n\r\nbody!")).get
    assert(r.version === "HTTP/1.1" && r.status === 200 && r.reason === "OK")
    assert(r.header("content-type") === Some("text/html"))
    assert(r.headers.count(_._1 == "Set-Cookie") === 2)
    assert(r.header("X-Folded") === Some("part1 part2"))
    assert(new String(r.body, UTF_8) === "body!")
    // Bare-LF servers parse identically; reason phrase is optional.
    val lf = Http.parseResponse(msg(
      "HTTP/1.0 404\nX: y\n\nnot found")).get
    assert(lf.status === 404 && lf.reason === "" &&
      lf.header("X") === Some("y"))
    // Damaged header lines are skipped, the record survives.
    val junk = Http.parseResponse(msg(
      "HTTP/1.1 200 OK\r\ngarbage no colon\r\nA: b\r\n\r\nx")).get
    assert(junk.header("A") === Some("b") && junk.headers.size === 1)
    // Truncated before the blank line: headers kept, body empty.
    val trunc = Http.parseResponse(msg(
      "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n")).get
    assert(trunc.body.isEmpty &&
      trunc.header("Content-Type") === Some("text/html"))
    // Not an HTTP message at all → None (the -1 row in the DataFrame).
    assert(Http.parseResponse(msg("<html>hi</html>")) === None)
    assert(Http.parseResponse(msg("HTTP/1.1 20x OK\r\n\r\n")) === None)
    assert(Http.parseResponse(null) === None)
  }

  test("dechunk: hex sizes, extensions, trailers; malformed returns raw") {
    assert(new String(Http.dechunk(msg(
      "5\r\nhello\r\n6\r\n world\r\n0\r\n\r\n")), UTF_8) === "hello world")
    // Chunk extension + trailers are dropped; LF-only tolerated.
    assert(new String(Http.dechunk(msg(
      "5;ext=1\nhello\n0\nTrailer: x\n\n")), UTF_8) === "hello")
    // Hex size with uppercase digits.
    assert(new String(Http.dechunk(msg(
      "A\r\n0123456789\r\n0\r\n\r\n")), UTF_8) === "0123456789")
    // Truncated chunk / garbage size → the raw bytes come back.
    val bad1 = msg("ff\r\nshort\r\n")
    assert(Http.dechunk(bad1) eq bad1)
    val bad2 = msg("zz\r\nnope")
    assert(Http.dechunk(bad2) eq bad2)
    // Capture that ends cleanly at a chunk boundary keeps what arrived.
    assert(new String(Http.dechunk(msg("5\r\nhello\r\n")), UTF_8) ===
      "hello")
  }

  test("decodedBody: wire order (dechunk then content-decode), gzip + deflate") {
    val payload = "compressed content €".getBytes(UTF_8)
    val gz = WarcPack.gzipBytes(payload)
    def chunked(b: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream
      b.grouped(7).foreach { c =>
        out.write(msg(c.length.toHexString + "\r\n"))
        out.write(c); out.write(msg("\r\n"))
      }
      out.write(msg("0\r\n\r\n")); out.toByteArray
    }
    val r = Http.parseResponse(
      msg("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n" +
        "Content-Encoding: gzip\r\n\r\n") ++ chunked(gz)).get
    assert(Http.decodedBody(r).sameElements(payload))
    // deflate: zlib-wrapped and raw both decode (servers ship both).
    def deflate(raw: Boolean): Array[Byte] = {
      val d = new java.util.zip.Deflater(6, raw)
      d.setInput(payload); d.finish()
      val buf = new Array[Byte](1024)
      val n = d.deflate(buf); d.end()
      java.util.Arrays.copyOf(buf, n)
    }
    for (raw <- Seq(false, true)) {
      val dr = Http.parseResponse(
        msg("HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\n\r\n") ++
          deflate(raw)).get
      assert(Http.decodedBody(dr).sameElements(payload))
    }
    // Corrupt gzip degrades to the raw bytes (visible, not dropped).
    val corrupt = gz.clone(); corrupt(12) = (corrupt(12) ^ 0xff).toByte
    val cr = Http.parseResponse(
      msg("HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n") ++ corrupt).get
    assert(Http.decodedBody(cr).sameElements(corrupt))
  }

  test("charset precedence: BOM > header > meta prescan > UTF-8; lying labels replace") {
    // Header charset, quoted and bare; WHATWG latin1→cp1252 superset.
    assert(Http.charsetParam("text/html; charset=utf-8") === Some("utf-8"))
    assert(Http.charsetParam("text/html; charset=\"ISO-8859-1\"") ===
      Some("ISO-8859-1"))
    assert(Http.charsetParam("text/html") === None)
    // 'charset' must start at a parameter boundary: a longer name
    // containing the token is a DIFFERENT attribute and must not
    // supply the decode label — but a real charset later still wins.
    assert(Http.charsetParam("text/html; data-charset=koi8-r") === None)
    assert(Http.charsetParam("text/html; x-charset=koi8-r") === None)
    assert(Http.charsetParam(
      "text/html; data-charset=koi8-r; charset=utf-8") === Some("utf-8"))
    assert(Http.charsetParam("charset=utf-8") === Some("utf-8"))
    assert(Http.resolveCharset("iso-8859-1").get.name === "windows-1252")
    assert(Http.resolveCharset("ASCII").get.name === "windows-1252")
    assert(Http.resolveCharset("no-such-charset") === None)
    // latin1-labeled body: 0x92 decodes as cp1252 ’ (the superset call).
    val l1 = Http.bodyText(Array[Byte]('i', 't', 0x92.toByte, 's'),
      Some("text/html; charset=iso-8859-1"))
    assert(l1._1 === "it’s" && l1._2 === "windows-1252")
    // Meta prescan fallback, both <meta charset> and http-equiv forms.
    val metaBody = "<html><meta charset=\"windows-1252\"><p>€</p>"
      .getBytes("windows-1252")
    assert(Http.sniffMetaCharset(metaBody) === Some("windows-1252"))
    assert(Http.bodyText(metaBody, Some("text/html"))._1.contains("€"))
    val equiv = ("<meta http-equiv=\"Content-Type\" " +
      "content=\"text/html; charset=shift_jis\">").getBytes(ISO_8859_1)
    assert(Http.sniffMetaCharset(equiv) === Some("shift_jis"))
    // BOM wins over a LYING header label.
    val bom = Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++
      "héllo".getBytes(UTF_8)
    assert(Http.bodyText(bom, Some("text/html; charset=shift_jis"))._1 ===
      "héllo")
    // A lying utf-8 label over latin1 bytes yields U+FFFD, not a throw.
    val lying = Http.bodyText("café".getBytes(ISO_8859_1),
      Some("text/html; charset=utf-8"))._1
    assert(lying.startsWith("caf") && lying.contains('�'))
    // Unknown label → meta-less ASCII/UTF-8 body falls to UTF-8.
    assert(Http.bodyText("plain".getBytes(UTF_8),
      Some("text/html; charset=klingon"))._1 === "plain")
    // UNLABELED legacy page: not valid UTF-8 → decode as cp1252, the
    // encoding unlabeled pages actually use (r11) — café stays café
    // instead of caf�.
    val legacy = Http.bodyText("café".getBytes(ISO_8859_1),
      Some("text/html"))
    assert(legacy._1 === "café" && legacy._2 === "windows-1252")
    // Unlabeled VALID UTF-8 with multibyte chars stays UTF-8.
    val utf = Http.bodyText("héllo €".getBytes(UTF_8), None)
    assert(utf._1 === "héllo €" && utf._2 === "UTF-8")
    // The validator itself: truncated sequences, bad leads, overlongs,
    // surrogates all refuse; astral accepts.
    assert(Http.isValidUtf8("😀".getBytes(UTF_8), 0))
    assert(!Http.isValidUtf8(Array(0xc3.toByte), 0)) // truncated
    assert(!Http.isValidUtf8(Array(0xc0.toByte, 0xaf.toByte), 0)) // overlong
    assert(!Http.isValidUtf8(Array(0xed.toByte, 0xa0.toByte,
      0x80.toByte), 0)) // surrogate
    assert(!Http.isValidUtf8(Array(0xff.toByte), 0))
    // GBK pages decode through the JDK charset table.
    val gbk = Http.bodyText("中文".getBytes("GBK"),
      Some("text/html; charset=gbk"))
    assert(gbk._1 === "中文" && gbk._2 === "GBK")
  }

  test("isTextual: text types decode, binary types stay binary") {
    assert(Http.isTextual(Some("text/html; charset=utf-8")))
    assert(Http.isTextual(Some("application/json")))
    assert(Http.isTextual(Some("application/xhtml+xml")))
    assert(Http.isTextual(None)) // omitted header: attempt text
    assert(!Http.isTextual(Some("image/jpeg")))
    assert(!Http.isTextual(Some("application/octet-stream")))
    assert(!Http.isTextual(Some("video/mp4")))
  }

  test("responses: DataFrame pass keeps parse failures as status -1 rows") {
    val sparkSession = spark
    import sparkSession.implicits._
    val df = Seq(
      (1L, msg("HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\nhi")),
      (2L, msg("not http at all")),
      (3L, msg("HTTP/1.1 301 Moved\r\nLocation: /x\r\n" +
        "Content-Type: image/png\r\n\r\n"))
    ).toDF("id", "payload")
    val out = Http.responses(df)
      .selectExpr("id", "http_status", "http_charset", "text",
        "octet_length(body) AS blen").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getString(2), r.getString(3), r.get(4))))
      .toMap
    assert(out(1L) === ((200L, "UTF-8", "hi", 2)))
    assert(out(2L)._1 === -1L && out(2L)._3 === null)
    // Binary media type / empty body: text null, body empty not null.
    assert(out(3L) === ((301L, null, null, 0)))
  }
}
