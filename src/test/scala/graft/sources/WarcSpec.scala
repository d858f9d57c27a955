package graft.sources

import graft.SparkSpec

/** WARC framing + gzip semantics: hand-built records parse to exact
  * field/payload values, the framing rules (Content-Length, double-CRLF
  * terminator, all-or-nothing on damage) are enforced, the member-walk
  * gzip validates trailers and fails bombs before allocating, and
  * hostile bytes never throw anywhere. */
/** [[graft.FsIO]] decorator counting bytes delivered by the read
  * calls — the measuring tape for the zipnumLookup summary-seek pin
  * (the lookup must read the summary + probed blocks, never the rest
  * of a shard). */
final class CountingFs(inner: graft.FsIO) extends graft.FsIO {
  val bytesRead = new java.util.concurrent.atomic.AtomicLong(0L)
  override def resolve(dir: String, name: String): String =
    inner.resolve(dir, name)
  override def exists(path: String): Boolean = inner.exists(path)
  override def isDirectory(path: String): Boolean = inner.isDirectory(path)
  override def mkdirs(dir: String): Unit = inner.mkdirs(dir)
  override def list(dir: String): Seq[String] = inner.list(dir)
  override def size(path: String): Long = inner.size(path)
  override def read(path: String): Array[Byte] = {
    val b = inner.read(path); bytesRead.addAndGet(b.length.toLong); b
  }
  override def readRange(path: String, off: Long, len: Int): Array[Byte] = {
    bytesRead.addAndGet(len.toLong); inner.readRange(path, off, len)
  }
  val spansRequested = new java.util.concurrent.atomic.AtomicLong(0L)
  override def readRanges(path: String,
                          spans: Seq[(Long, Int)]): Seq[Array[Byte]] = {
    bytesRead.addAndGet(spans.map(_._2.toLong).sum)
    spansRequested.addAndGet(spans.length.toLong)
    inner.readRanges(path, spans)
  }
  override def write(path: String, bytes: Array[Byte]): Unit =
    inner.write(path, bytes)
  override def atomicSwap(staging: String, target: String): Unit =
    inner.atomicSwap(staging, target)
  override def rename(src: String, target: String): Unit =
    inner.rename(src, target)
  override def delete(path: String): Boolean = inner.delete(path)
  override def deleteRecursively(path: String): Unit =
    inner.deleteRecursively(path)
}

class WarcSpec extends SparkSpec {

  private def rec(typ: String, payload: String,
                  extra: String = ""): String =
    s"WARC/1.0\r\nWARC-Type: $typ\r\n$extra" +
      s"Content-Length: ${payload.length}\r\n\r\n$payload\r\n\r\n"

  test("warcRecords: hand-built records parse to exact fields and payload ranges") {
    val file = (rec("warcinfo", "software: x\r\n") +
      rec("response", "hello body",
        extra = "WARC-Target-URI: https://e.org/1\r\n")).getBytes("ISO-8859-1")
    val rs = Warc.warcRecords(file).get
    assert(rs.length === 2)
    assert(rs(0).version === "WARC/1.0")
    assert(rs(0).header("WARC-Type") === Some("warcinfo"))
    assert(rs(0).header("warc-type") === Some("warcinfo")) // case-insensitive
    assert(new String(file, rs(1).payloadOffset, rs(1).payloadLength,
      "ISO-8859-1") === "hello body")
    assert(rs(1).header("WARC-Target-URI") === Some("https://e.org/1"))
    // Junk after the last whole record ends the walk cleanly (it does
    // not begin "WARC/").
    assert(Warc.warcRecords(file ++ "junk".getBytes).get.length === 2)
    // A record with NO Content-Length, a non-numeric length, or a missing
    // double-CRLF terminator fails the file.
    val noLen = "WARC/1.0\r\nWARC-Type: x\r\n\r\npayload\r\n\r\n".getBytes
    assert(Warc.warcRecords(noLen).isEmpty)
    val badTerm = (rec("response", "abc").dropRight(2) + "xx").getBytes
    assert(Warc.warcRecords(badTerm).isEmpty)
    // Truncated payload (declared length past the buffer) fails.
    assert(Warc.warcRecords(
      "WARC/1.0\r\nContent-Length: 100\r\n\r\nshort".getBytes).isEmpty)
    assert(Warc.warcRecords("not a warc".getBytes).isEmpty)
    // Damage in the MIDDLE of a multi-record file fails the WHOLE file
    // (never a silently-truncated prefix — the count audit depends on
    // it): valid record + damaged record + valid record → None.
    val damagedMid = (rec("a", "one") +
      "WARC/1.0\r\nContent-Length: NaN\r\n\r\n\r\n\r\n" +
      rec("b", "three")).getBytes("ISO-8859-1")
    assert(Warc.warcRecords(damagedMid).isEmpty)
  }

  test("warcRecords: UTF-8 headers, folded lines, repeated names in order") {
    // Raw IRI in UTF-8 (ISO 28500 headers are UTF-8, not Latin-1).
    val iri = "https://e.org/café"
    val f1 = rec("response", "x",
      extra = s"WARC-Target-URI: $iri\r\n").getBytes("UTF-8")
    assert(Warc.warcRecords(f1).get.head.header("WARC-Target-URI") ===
      Some(iri))
    // Folded continuation line (SP lead) unfolds onto the previous
    // header with a single space.
    val folded = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: https://e.org/very\r\n long/path\r\n" +
      "Content-Length: 2\r\n\r\nhi\r\n\r\n").getBytes("ISO-8859-1")
    assert(Warc.warcRecords(folded).get.head.header("WARC-Target-URI") ===
      Some("https://e.org/very long/path"))
    // Repeated names (legal, e.g. WARC-Concurrent-To) survive in order.
    val repeated = rec("revisit", "y",
      extra = "WARC-Concurrent-To: <urn:a>\r\nWARC-Concurrent-To: <urn:b>\r\n")
      .getBytes("ISO-8859-1")
    val hs = Warc.warcRecords(repeated).get.head.headers
      .filter(_._1 == "WARC-Concurrent-To").map(_._2)
    assert(hs === Seq("<urn:a>", "<urn:b>"))
  }

  test("gunzip: round-trip, member trailers validated, bomb cap, malformed") {
    val data = Array.tabulate(10000)(i => (i % 251).toByte)
    assert(Warc.gunzip(WarcPack.gzipBytes(data)).get.toSeq === data.toSeq)
    // Per-record members concatenate into one stream (the .warc.gz rule).
    val two = WarcPack.gzipBytes(data.take(100)) ++
      WarcPack.gzipBytes(data.drop(100))
    assert(Warc.gunzip(two).get.toSeq === data.toSeq)
    // A corrupt SECOND member must fail the whole stream — the OpenJDK
    // GZIPInputStream masks this as clean EOF, which is why the member
    // walk is hand-rolled.
    val corrupt2 = two.clone()
    corrupt2(WarcPack.gzipBytes(data.take(100)).length) = 0x00 // magic byte
    assert(Warc.gunzip(corrupt2).isEmpty)
    // A flipped TRAILER CRC byte fails (the JDK path would also catch
    // this one; the member walk validates ISIZE too).
    val crcFlip = WarcPack.gzipBytes(data)
    crcFlip(crcFlip.length - 5) = (crcFlip(crcFlip.length - 5) ^ 0x01).toByte
    assert(Warc.gunzip(crcFlip).isEmpty)
    // The output cap turns a decompression bomb into None, not an OOM:
    // 10 MB of zeros compresses to ~10 KB; cap at 1 MB must refuse.
    val bomb = WarcPack.gzipBytes(new Array[Byte](10 * 1024 * 1024))
    assert(bomb.length < 64 * 1024)
    assert(Warc.gunzip(bomb, maxOut = 1024 * 1024).isEmpty)
    // Malformed/truncated streams are None, never a throw.
    assert(Warc.gunzip("nope".getBytes).isEmpty)
    val trunc = WarcPack.gzipBytes(data).take(50)
    assert(Warc.gunzip(trunc).isEmpty)
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 200) {
      val b = new Array[Byte](rnd.nextInt(300))
      rnd.nextBytes(b)
      if (b.length >= 3) {
        b(0) = 0x1f.toByte; b(1) = 0x8b.toByte; b(2) = 8.toByte
      }
      Warc.gunzip(b) // must not throw
      Warc.warcRecords(b) // must not throw
    }
  }

  test("records: DataFrame explode, coded failure rows, gzip path") {
    val sparkSession = spark
    import sparkSession.implicits._
    val good = WarcPack.warcFile(5L, "payload five".getBytes("US-ASCII"))
    val df = Seq((1L, good), (2L, "garbage".getBytes)).toDF("id", "bytes")
    val rows = Warc.records(df).select("id", "record_ix", "warc_type")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.getString(2)).getOrElse("-"))).toSet
    assert(rows === Set((1L, 0L, "warcinfo"), (1L, 1L, "response"),
      (2L, -1L, "-"))) // framing failure kept, never silently dropped
    // The gzipped path recovers the identical records; a corrupt gzip
    // layer is the DISTINCT code −2 (audit can tell the layers apart).
    val gz = Seq((1L, WarcPack.gzipBytes(good)),
      (2L, "garbage".getBytes)).toDF("id", "bytes")
    val gzRows = Warc.records(gz, gzipped = true)
    val pay = gzRows.filter($"record_ix" === 1L).select("payload")
      .collect().head
    assert(new String(pay.getAs[Array[Byte]](0), "US-ASCII") === "payload five")
    assert(gzRows.filter($"id" === 2L).select("record_ix")
      .collect().head.getLong(0) === -2L)
  }

  test("sha1Digest/base32: external test vectors, no padding") {
    // RFC 3174 SHA-1("abc") / SHA-1("") through RFC 4648 base32.
    assert(Warc.sha1Digest("abc".getBytes("US-ASCII")) ===
      "sha1:VGMT4NSHA2AWVOR6EVYXQUGCNSONBWE5")
    assert(Warc.sha1Digest(Array.empty[Byte]) ===
      "sha1:3I42H3S6NNFQ2MSVX7XZKYAYSCX5QBYJ")
    // RFC 4648 §10 vector (padding stripped — WARC digests omit it).
    assert(Warc.base32("foobar".getBytes("US-ASCII")) === "MZXW6YTBOI")
    assert(Warc.base32("fooba".getBytes("US-ASCII")) === "MZXW6YTB")
  }

  test("writeRecord/encodeResponses: deterministic export, own reader reads it back exactly") {
    val sparkSession = spark
    import sparkSession.implicits._
    // Single record: framing parses, fields round-trip, the declared
    // digest verifies against the payload, ids are deterministic.
    val payload = "HTTP/1.1 200 OK\r\nContent-Length: 2\r\n\r\nhi"
      .getBytes("ISO-8859-1")
    val r1 = Warc.writeRecord("response", "https://w.org/a",
      "2024-01-01T00:00:00Z", payload)
    assert(r1.toSeq === Warc.writeRecord("response", "https://w.org/a",
      "2024-01-01T00:00:00Z", payload).toSeq, "export must be byte-stable")
    val parsed = Warc.warcRecords(r1).get
    assert(parsed.length === 1)
    val h = parsed.head
    assert(h.header("WARC-Type").contains("response"))
    assert(h.header("WARC-Target-URI").contains("https://w.org/a"))
    assert(h.header("WARC-Payload-Digest")
      .contains(Warc.sha1Digest(payload)))
    assert(h.header("WARC-Record-ID").exists(_.startsWith("<urn:uuid:")))
    assert(new String(r1, h.payloadOffset, h.payloadLength,
      "ISO-8859-1") === new String(payload, "ISO-8859-1"))
    // Grouped export: one .warc.gz per group, one gzip MEMBER per
    // record (the member walk reads them), read-back equality through
    // records → Http.responses.
    val rows = Seq(
      ("g0", "https://w.org/1", "2024-01-01T00:00:00Z", "text/plain",
        "one".getBytes("UTF-8")),
      ("g0", "https://w.org/2", "2024-01-01T00:00:00Z", "text/plain",
        "two".getBytes("UTF-8")),
      ("g1", "https://w.org/3", "2024-01-01T00:00:00Z", "text/plain",
        "three".getBytes("UTF-8")))
      .toDF("file_group", "url", "warc_date", "content_type", "body")
    val files = Warc.encodeResponses(rows).collect()
      .map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(files.keySet === Set("g0.warc.gz", "g1.warc.gz"))
    val back = Http.responses(
        Warc.records(files.toSeq.toDF("path", "bytes"), gzipped = true))
      .select("target_uri", "http_status", "text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(back === Set(
      ("https://w.org/1", 200L, "one"), ("https://w.org/2", 200L, "two"),
      ("https://w.org/3", 200L, "three")))
  }

  test("withDigestCheck + resolveRevisits: digest verify, digest join, unmatched kept") {
    val sparkSession = spark
    import sparkSession.implicits._
    val body = "the original payload".getBytes("US-ASCII")
    val digest = Warc.sha1Digest(body)
    def record(typ: String, uri: String, payload: Array[Byte],
               dg: String, refers: String = null): String = {
      val extra = s"WARC-Target-URI: $uri\r\nWARC-Payload-Digest: $dg\r\n" +
        (if (refers != null) s"WARC-Refers-To-Target-URI: $refers\r\n" else "")
      s"WARC/1.0\r\nWARC-Type: $typ\r\n$extra" +
        s"Content-Length: ${payload.length}\r\n\r\n" +
        new String(payload, "ISO-8859-1") + "\r\n\r\n"
    }
    val file = (record("response", "https://e.org/orig", body, digest) +
      record("response", "https://e.org/bad", body, "sha1:WRONGDIGEST") +
      record("revisit", "https://e.org/re", Array.empty[Byte], digest,
        refers = "https://e.org/orig") +
      record("revisit", "https://e.org/orphan", Array.empty[Byte],
        "sha1:NOSUCHDIGEST")).getBytes("ISO-8859-1")
    val recs = Warc.records(Seq((1L, file)).toDF("id", "bytes"))
    // Declared-but-wrong digests flag false; correct ones true; the
    // compare is case-insensitive per RFC 4648.
    val checks = Warc.withDigestCheck(recs)
      .filter($"warc_type" === "response")
      .select("target_uri", "digest_ok").collect()
      .map(r => (r.getString(0), r.getBoolean(1))).toSet
    assert(checks === Set(("https://e.org/orig", true),
      ("https://e.org/bad", false)))
    val resolved = Warc.resolveRevisits(recs)
      .select("target_uri", "original_uri", "original_ix").collect()
      .map(r => (r.getString(0), Option(r.getString(1)),
        Option(r.get(2)))).toSet
    // The matched revisit gains its original; the orphan is KEPT with
    // null originals. /bad shares no digest so only /orig can match.
    assert(resolved === Set(
      ("https://e.org/re", Some("https://e.org/orig"), Some(0L)),
      ("https://e.org/orphan", None, None)))
    // Several responses sharing a digest: the chosen original is ONE
    // CONSISTENT record — min-URI with ITS OWN record_ix, never the
    // min uri stitched onto another record's min ix.
    val dup = (record("response", "https://b.org/x", body, digest) +
      record("response", "https://a.org/y", body, digest) +
      record("revisit", "https://e.org/re2", Array.empty[Byte], digest))
      .getBytes("ISO-8859-1")
    val r2 = Warc.resolveRevisits(
        Warc.records(Seq((1L, dup)).toDF("id", "bytes")))
      .select("target_uri", "original_uri", "original_ix").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // min uri is a.org/y which is record 1 — NOT record 0's ix.
    assert(r2 === Set(("https://e.org/re2", "https://a.org/y", 1L)))
  }

  test("writeRecord: CR/LF and control chars in header values are REJECTED (injection)") {
    val body = "x".getBytes
    // A hostile URL embedding a forged digest header must throw, not
    // split the record (advice r13).
    val hostile = "https://e.org/a\r\nWARC-Payload-Digest: sha1:FORGED"
    intercept[IllegalArgumentException] {
      Warc.writeRecord("response", hostile, "2024-01-01T00:00:00Z", body)
    }
    intercept[IllegalArgumentException] { // date
      Warc.writeRecord("response", "https://e.org/a", "2024\r\nX: y", body)
    }
    intercept[IllegalArgumentException] { // extra header value
      Warc.writeRecord("response", "https://e.org/a",
        "2024-01-01T00:00:00Z", body,
        extraHeaders = Seq("Content-Type" -> "text/html\r\nX: y"))
    }
    intercept[IllegalArgumentException] { // bare control char too
      Warc.writeRecord("response", "https://e.org/a\t",
        "2024-01-01T00:00:00Z", body)
    }
    // Sanity: the same call without the injection succeeds.
    assert(Warc.writeRecord("response", "https://e.org/a",
      "2024-01-01T00:00:00Z", body).nonEmpty)
  }

  test("encodeResponses: status fidelity, revisit records, CDX offsets, cross-group id uniqueness") {
    val sparkSession = spark
    import sparkSession.implicits._
    val pageA = "alpha page".getBytes("UTF-8")
    val pageB = "beta page".getBytes("UTF-8")
    val rows = Seq(
      // 301 with Location — the status line must survive round-trip.
      ("g0", "https://w.org/moved", "2024-01-01T00:00:00Z", "text/html",
        "stub".getBytes("UTF-8"), 301L, "https://w.org/new"),
      ("g0", "https://w.org/a", "2024-01-01T00:00:00Z", "text/html",
        pageA, 200L, null),
      // Digest duplicate of /a in ANOTHER group → revisit record there.
      ("g1", "https://w.org/a-copy", "2024-02-01T00:00:00Z", "text/html",
        pageA, 200L, null),
      // Digest duplicate of /moved's stub body, itself a 301 to a
      // DIFFERENT target (default redirect pages are byte-identical in
      // the wild): the revisit record must keep ITS OWN status line
      // and Location — a header-less revisit would flatten it
      // (review r14).
      ("g1", "https://w.org/moved-copy", "2024-02-01T00:00:00Z",
        "text/html", "stub".getBytes("UTF-8"), 301L,
        "https://w.org/new2"),
      ("g1", "https://w.org/gone", "2024-01-01T00:00:00Z", "text/html",
        pageB, 404L, null))
      .toDF("file_group", "url", "warc_date", "content_type", "body",
        "http_status", "location")
    def export() = Warc.encodeResponses(rows, statusCol = "http_status",
        locationCol = "location", withRevisits = true, withCdx = true)
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1))
    val files = export().toMap
    assert(files.keySet ===
      Set("g0.warc.gz", "g0.cdx", "g1.warc.gz", "g1.cdx"))
    // Byte-stable re-export holds with the new features on.
    val again = export().toMap
    assert(files.forall { case (k, v) => again(k).toSeq == v.toSeq })
    val warcRows = files.toSeq.filter(_._1.endsWith(".warc.gz"))
      .toDF("path", "bytes")
    val recs = Warc.records(warcRows, gzipped = true)
    // Status lines carried faithfully; Location intact on the 301.
    val back = Http.responses(recs.filter($"warc_type" === "response"))
      .select("target_uri", "http_status").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(back === Set(("https://w.org/moved", 301L),
      ("https://w.org/a", 200L), ("https://w.org/gone", 404L)))
    val moved = Http.responses(recs.filter($"warc_type" === "response"))
      .filter($"http_status" === 301)
      .select(org.apache.spark.sql.functions.try_element_at(
        org.apache.spark.sql.functions.filter($"http_headers",
          h => org.apache.spark.sql.functions.lower(h.getField("name"))
            === "location"),
        org.apache.spark.sql.functions.lit(1)).getField("value"))
      .collect().map(_.getString(0)).toSet
    assert(moved === Set("https://w.org/new"))
    // The duplicates became payload-free revisits the reader resolves.
    val resolved = Warc.resolveRevisits(recs)
      .select("target_uri", "original_uri").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(resolved === Set(("https://w.org/a-copy", "https://w.org/a"),
      ("https://w.org/moved-copy", "https://w.org/moved")))
    // The revisit BLOCK carries the duplicate's own protocol headers
    // (ISO 28500 §6.7.2): moved-copy's 301 and its own Location
    // survive even though the payload is elided (review r14 — a
    // header-less revisit re-flattened what r13 fixed for responses).
    val revBack = Http.responses(recs.filter($"warc_type" === "revisit"))
      .select($"target_uri", $"http_status",
        org.apache.spark.sql.functions.try_element_at(
          org.apache.spark.sql.functions.filter($"http_headers",
            h => org.apache.spark.sql.functions.lower(h.getField("name"))
              === "location"),
          org.apache.spark.sql.functions.lit(1)).getField("value"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.getString(2)).orNull)).toSet
    assert(revBack === Set(
      ("https://w.org/a-copy", 200L, null),
      ("https://w.org/moved-copy", 301L, "https://w.org/new2")))
    // CDX offsets are byte-exact: slicing [offset, offset+length) out
    // of the archive yields a gunzip-able single record whose URI
    // matches the entry.
    val cdxLines = new String(files("g0.cdx"), "UTF-8").split("\n")
      .filter(_.nonEmpty) ++
      new String(files("g1.cdx"), "UTF-8").split("\n").filter(_.nonEmpty)
    assert(cdxLines.length === 5)
    for (line <- cdxLines) {
      val j = line.substring(line.indexOf('{'))
      def field(k: String): String =
        s""""$k":"?([^",}]+)"?""".r.findFirstMatchIn(j).get.group(1)
      val fn = field("filename")
      val off = field("offset").toInt
      val len = field("length").toInt
      val member = java.util.Arrays.copyOfRange(files(fn), off, off + len)
      val inflated = Warc.gunzip(member)
      assert(inflated.isDefined, s"slice at $off+$len must gunzip alone")
      val rec = Warc.warcRecords(inflated.get).get
      assert(rec.length === 1)
      assert(rec.head.header("WARC-Target-URI").contains(field("url")))
    }
    // The revisits' CDX entries are flagged.
    assert(cdxLines.count(_.contains("\"mod\":\"revisit\"")) === 2)
    // ISO 28500 global id uniqueness: the SAME row exported into TWO
    // different groups must get two different record ids (advice r13 —
    // the group is folded into the id seed).
    val twin = Seq(
      ("gA", "https://w.org/t", "2024-01-01T00:00:00Z", "text/html",
        pageA, 200L, null),
      ("gB", "https://w.org/t", "2024-01-01T00:00:00Z", "text/html",
        pageA, 200L, null))
      .toDF("file_group", "url", "warc_date", "content_type", "body",
        "http_status", "location")
    val idSet = Warc.encodeResponses(twin, statusCol = "http_status")
      .collect()
      .flatMap(r => Warc.gunzip(r.getAs[Array[Byte]](1))
        .flatMap(Warc.warcRecords).get)
      .flatMap(_.header("WARC-Record-ID")).toSet
    assert(idSet.size === 2, "same row in two archives → two ids")
  }

  test("a raw (non-gzip) export is named .warc, not .warc.gz, and round-trips") {
    val sparkSession = spark
    import sparkSession.implicits._
    import org.apache.spark.sql.functions.col
    val rows = Seq(("g0", "https://e.org/u/1", "2024-01-01T00:00:00Z",
      "text/plain", "raw body".getBytes("UTF-8")))
      .toDF("file_group", "url", "warc_date", "content_type", "body")
    val files = Warc.encodeResponses(rows, gzipped = false,
      withCdx = true).collect()
    assert(files.map(_.getString(0)).toSet === Set("g0.warc", "g0.cdx"))
    val cdx = new String(files.find(_.getString(0) == "g0.cdx").get
      .getAs[Array[Byte]](1), "UTF-8")
    assert(cdx.contains("\"filename\":\"g0.warc\""))
    val recs = Warc.records(Seq(files.find(_.getString(0) == "g0.warc")
        .get.getAs[Array[Byte]](1)).toDF("bytes"))
      .select(col("target_uri")).collect()
    assert(recs.map(_.getString(0)).toSeq === Seq("https://e.org/u/1"))
  }

  test("writeZipnum: one globally-sorted cluster — summary keys ascend, fragments assembled, blocks recover every line") {
    val sparkSession = spark
    import sparkSession.implicits._
    import org.apache.spark.sql.functions.col
    val rows = (0 until 40).map { i =>
      (s"g${i % 5}", f"https://z.org/p/${(i * 7) % 40}%02d",
        "2024-01-01T00:00:00Z", "text/plain", s"body $i".getBytes("UTF-8"))
    }.toDF("file_group", "url", "warc_date", "content_type", "body")
    val files = Warc.encodeResponses(rows, withCdx = true)
      .localCheckpoint(true)
    val allLines = files.filter(col("path").endsWith(".cdx"))
      .collect().flatMap(r => new String(r.getAs[Array[Byte]](1), "UTF-8")
        .split("\n").filter(_.nonEmpty)).toSeq
    val dir = java.nio.file.Files.createTempDirectory("graft_zn").toString
    Warc.writeZipnum(files, dir, shards = 3, blockLines = 4)
    val names = {
      val s = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      try s.toArray.toSeq.map(_.asInstanceOf[java.nio.file.Path]
        .getFileName.toString).sorted
      finally s.close()
    }
    // Fragments are assembled and dropped; shards + ONE cluster.idx.
    assert(names.contains("cluster.idx"))
    assert(!names.exists(_.startsWith("cluster.idx.part")))
    val idx = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "cluster.idx")), "UTF-8")
      .split("\n").filter(_.nonEmpty).toSeq
    val keys = idx.map(_.split("\t")(0))
    // GLOBAL order: summary keys ascend across shard boundaries (the
    // range partition + within-sort composition).
    assert(keys === keys.sorted)
    // Every line recovers through the summary's byte-exact offsets,
    // and the union is exactly the original line universe, sorted.
    val recovered = idx.flatMap { e =>
      val f = e.split("\t")
      val bytes = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir, f(1)))
      val member = java.util.Arrays.copyOfRange(bytes,
        f(2).toInt, f(2).toInt + f(3).toInt)
      new String(Warc.gunzip(member).get, "UTF-8").split("\n")
        .filter(_.nonEmpty).toSeq
    }
    assert(recovered === allLines.sorted)
  }

  test("zipnumLookup: summary-seek point lookup finds every capture, across block straddles") {
    val sparkSession = spark
    import sparkSession.implicits._
    // Three captures of the SAME url at different dates: with
    // blockLines = 2 their sorted lines straddle a block boundary, so
    // the lookup must continue into the next block whose first key
    // equals the probe.
    val rows = (Seq(
      ("g0", "https://z.org/dup", "2024-01-01T00:00:00Z", "a"),
      ("g1", "https://z.org/dup", "2024-02-01T00:00:00Z", "b"),
      ("g2", "https://z.org/dup", "2024-03-01T00:00:00Z", "c")) ++
      (0 until 9).map(i =>
        (s"g${i % 3}", s"https://z.org/p/$i", "2024-01-01T00:00:00Z",
          s"body $i")))
      .map { case (g, u, d, b) =>
        (g, u, d, "text/plain", b.getBytes("UTF-8"))
      }.toDF("file_group", "url", "warc_date", "content_type", "body")
    val files = Warc.encodeResponses(rows, withCdx = true)
      .localCheckpoint(true)
    val dir = java.nio.file.Files.createTempDirectory("graft_znl").toString
    Warc.writeZipnum(files, dir, shards = 2, blockLines = 2)
    // Every capture of the straddling key comes back, nothing else.
    val dup = Warc.zipnumLookup(dir, "https://z.org/dup")
    assert(dup.size === 3)
    assert(dup.forall(_.startsWith("https://z.org/dup ")))
    assert(dup.map(_.split(" ")(1)).sorted ===
      Seq("20240101000000", "20240201000000", "20240301000000"))
    // Single-capture keys resolve to exactly their line; misses (below
    // the first block key, between keys, above the last) are empty.
    (0 until 9).foreach { i =>
      val hit = Warc.zipnumLookup(dir, s"https://z.org/p/$i")
      assert(hit.size === 1 && hit.head.contains(s"/p/$i "))
    }
    assert(Warc.zipnumLookup(dir, "https://a.org/before").isEmpty)
    assert(Warc.zipnumLookup(dir, "https://z.org/nope").isEmpty)
    assert(Warc.zipnumLookup(dir, "https://zz.org/after").isEmpty)
    // Timestamp range bounds (the wayback from/to semantics): prefix
    // upper bounds admit the whole prefix period.
    assert(Warc.zipnumLookup(dir, "https://z.org/dup",
      tsFrom = "20240201000000").size === 2)
    assert(Warc.zipnumLookup(dir, "https://z.org/dup", tsTo = "202402")
      .map(_.split(" ")(1)).sorted ===
      Seq("20240101000000", "20240201000000"))
    assert(Warc.zipnumLookup(dir, "https://z.org/dup",
      tsFrom = "202402", tsTo = "202402").size === 1)
    assert(Warc.zipnumLookup(dir, "https://z.org/dup",
      tsFrom = "2025").isEmpty)
    // BULK form over the same cluster: the straddling key yields all
    // three captures, a single-capture key its one line, misses (below/
    // between/above) vanish — one DataFrame, inner-join semantics.
    val keys = Seq("https://z.org/dup", "https://z.org/p/3",
      "https://a.org/before", "https://z.org/nope",
      "https://zz.org/after").toDF("urlkey")
    val joined = Warc.zipnumJoin(keys, dir).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(joined.count(_._1 == "https://z.org/dup") === 3)
    assert(joined.count(_._1 == "https://z.org/p/3") === 1)
    assert(joined.forall { case (k, l) => l.startsWith(k + " ") })
    assert(joined.length === 4)
  }

  test("surtKey: canonicalization flags, IPv6 literals, trailing-dot hosts") {
    // Flags OFF: byte-stable legacy behavior.
    assert(Warc.surtKey("https://Example.ORG:443/A/b?q=1") ===
      "org,example)/a/b?q=1")
    assert(Warc.surtKey("https://www.Example.org/x") ===
      "org,example,www)/x")
    // stripWww: www / www<digits> labels drop; a bare "www.org" apex
    // must NOT lose its only meaningful label pair's head... (www. is
    // only stripped when a host remains).
    assert(Warc.surtKey("https://www.Example.org/x", stripWww = true) ===
      "org,example)/x")
    assert(Warc.surtKey("https://WWW2.site.org/x", stripWww = true) ===
      "org,site)/x")
    assert(Warc.surtKey("https://wwwx.site.org/x", stripWww = true) ===
      "org,site,wwwx)/x") // not a www label
    // scrubSession: named session params die, real params survive, an
    // emptied query drops its '?', the servlet matrix form dies too.
    assert(Warc.surtKey(
      "https://e.org/p?a=1&JSESSIONID=XYZ&b=2", scrubSession = true) ===
      "org,e)/p?a=1&b=2")
    assert(Warc.surtKey(
      "https://e.org/p?phpsessid=9", scrubSession = true) === "org,e)/p")
    assert(Warc.surtKey(
      "https://e.org/p;jsessionid=ABC?sid=1&x=2", scrubSession = true) ===
      "org,e)/p?x=2")
    assert(Warc.surtKey("https://e.org/p?sid=1&x=2") ===
      "org,e)/p?sid=1&x=2") // flag off → untouched
    // IPv6 literal: port stripped after the bracket, address never
    // reversed (advice r15 — lastIndexOf(':') mangled it before).
    assert(Warc.surtKey("https://[2001:db8::1]:8080/x") ===
      "[2001:db8::1]:8080)/x")
    assert(Warc.surtKey("https://[2001:DB8::1]:443/x") ===
      "[2001:db8::1])/x") // default port drops
    // Trailing-dot host keys like the undotted form (the DNS root dot
    // is not a label — no empty leading label).
    assert(Warc.surtKey("https://example.org./x") === "org,example)/x")
    // Matrix strip is PATH-ONLY (advice r16): the same bytes in a
    // query VALUE are part of the parameter and must survive.
    assert(Warc.surtKey(
      "https://e.org/p?x=1;jsessionid=abc", scrubSession = true) ===
      "org,e)/p?x=1;jsessionid=abc")
    assert(Warc.surtKey(
      "https://e.org/p;jsessionid=A/q;jsessionid=B?x=1",
      scrubSession = true) === "org,e)/p/q?x=1")
    // normalizeEncoding (r16 verdict #5): IDN hosts fold to punycode;
    // unreserved escapes decode; reserved / non-ASCII escapes keep
    // their %XX form, hex case collapsing via the final lowercase;
    // malformed sequences pass through untouched.
    assert(Warc.surtKey("https://BÜcher.example/x",
      normalizeEncoding = true) === "example,xn--bcher-kva)/x")
    assert(Warc.surtKey("https://bücher.example/x") ===
      "example,bücher)/x") // flag off → raw label keeps its bytes
    assert(Warc.surtKey("https://e.org/%41b%2Fc?q=%7E1",
      normalizeEncoding = true) === "org,e)/ab%2fc?q=~1")
    assert(Warc.surtKey("https://e.org/M%C3%BCnchen",
      normalizeEncoding = true) === "org,e)/m%c3%bcnchen")
    assert(Warc.surtKey("https://e.org/a%zz%4",
      normalizeEncoding = true) === "org,e)/a%zz%4")
    // www-strip composes after the punycode fold.
    assert(Warc.surtKey("https://www.BÜcher.example/x",
      stripWww = true, normalizeEncoding = true) ===
      "example,xn--bcher-kva)/x")
    // IPv4 dotted quad: NEVER reversed (r17 — the surt library's
    // hostToSURT; reversing octets is as meaningless as reversing an
    // IPv6 literal's groups). Port and default-port rules unchanged;
    // the surt-library match is \d+ per label WITHOUT a 0–255 range
    // check, so 999.1.2.3 counts too; 3 or 5 labels, or any alpha
    // byte, fall back to name-style reversal.
    assert(Warc.surtKey("http://203.0.113.7/x") === "203.0.113.7)/x")
    assert(Warc.surtKey("http://203.0.113.7:8080/x?q=1") ===
      "203.0.113.7:8080)/x?q=1")
    assert(Warc.surtKey("http://203.0.113.7:80/x") === "203.0.113.7)/x")
    assert(Warc.surtKey("http://203.0.113.7./x") === "203.0.113.7)/x")
    assert(Warc.surtKey("http://999.1.2.3/x") === "999.1.2.3)/x")
    assert(Warc.surtKey("http://1.2.3/x") === "3,2,1)/x")
    assert(Warc.surtKey("http://1.2.3.4.5/x") === "5,4,3,2,1)/x")
    assert(Warc.surtKey("http://1.2.3.4a/x") === "4a,3,2,1)/x")
    // Session scrub composes on an IP host like any other.
    assert(Warc.surtKey("http://203.0.113.7/p?x=1&phpsessid=q",
      scrubSession = true) === "203.0.113.7)/p?x=1")
  }

  test("zipnumPrefix: bounded prefix scan in key order, paging, ts-swallowed blocks") {
    val sparkSession = spark
    import sparkSession.implicits._
    // 30 captures, zero-padded keys (lexicographic == numeric), dates
    // split 2024/2025 at i=14 so a tsFrom filter can swallow WHOLE
    // blocks inside the prefix run.
    val rows = (0 until 30).map { i =>
      val date =
        if (i < 14) "2024-01-01T00:00:00Z" else "2025-01-01T00:00:00Z"
      (s"g${i % 3}", f"https://s.org/p/$i%02d", date, "text/plain",
        s"body $i".getBytes("UTF-8"))
    }.toDF("file_group", "url", "warc_date", "content_type", "body")
    val files = Warc.encodeResponses(rows, withCdx = true)
      .localCheckpoint(true)
    val dir = java.nio.file.Files.createTempDirectory("graft_znpfx")
      .toString
    Warc.writeZipnum(files, dir, shards = 1, blockLines = 2)
    // The full prefix range, in cluster key order.
    val all = Warc.zipnumPrefix(dir, "https://s.org/p/1")
    assert(all.map(_.split(" ")(0)) ===
      (10 to 19).map(i => s"https://s.org/p/$i"))
    // Paging: chained limit-4 pages reconstruct the full scan with no
    // duplicates and no gaps (afterLine = strictly-after resume).
    val got = scala.collection.mutable.ArrayBuffer.empty[String]
    var page = Warc.zipnumPrefix(dir, "https://s.org/p/1", limit = 4)
    assert(page.size === 4)
    while (page.nonEmpty) {
      got ++= page
      page = Warc.zipnumPrefix(dir, "https://s.org/p/1", limit = 4,
        afterLine = page.last)
    }
    assert(got.toSeq === all)
    // A ts filter that swallows whole blocks must EXHAUST the shard
    // run, not skip its untaken spans (the chunk loop's reason to
    // exist): the first limit-sized chunk holds only 2024 lines.
    val ts = Warc.zipnumPrefix(dir, "https://s.org/p/1",
      tsFrom = "2025", limit = 2)
    assert(ts.map(_.split(" ")(0)) ===
      Seq("https://s.org/p/14", "https://s.org/p/15"))
    // ts bounds compose with paging.
    val ts2 = Warc.zipnumPrefix(dir, "https://s.org/p/1",
      tsFrom = "2025", limit = 2, afterLine = ts.last)
    assert(ts2.map(_.split(" ")(0)) ===
      Seq("https://s.org/p/16", "https://s.org/p/17"))
    // A corrupted resume line sorting BELOW the prefix degrades to a
    // fresh scan (clamped search key; strictly-after filter no-ops),
    // never a silently-empty range.
    assert(Warc.zipnumPrefix(dir, "https://s.org/p/1",
      afterLine = "aaaa 0") === all)
    // Misses below, between, and above the collection; a broader
    // prefix sees everything.
    assert(Warc.zipnumPrefix(dir, "https://a.org/").isEmpty)
    assert(Warc.zipnumPrefix(dir, "https://s.org/p/1x").isEmpty)
    assert(Warc.zipnumPrefix(dir, "https://t.org/").isEmpty)
    assert(Warc.zipnumPrefix(dir, "https://s.org/").size === 30)
  }

  test("cdxFilterLines / cdxCollapseLines: wayback-cdx-server line options") {
    val lines = Seq(
      "org,a)/x 20240101120000 {\"url\":\"https://a.org/x\",\"mime\":\"text/html\",\"status\":200,\"digest\":\"d1\"}",
      "org,a)/x 20240101130000 {\"url\":\"https://a.org/x\",\"mime\":\"text/html\",\"status\":200,\"digest\":\"d1\"}",
      "org,a)/x 20240102120000 {\"url\":\"https://a.org/x\",\"mime\":\"text/html\",\"status\":404,\"digest\":\"d2\"}",
      "org,a)/y 20240101120000 {\"url\":\"https://a.org/y\",\"mime\":\"image/png\",\"status\":200,\"digest\":\"d3\"}")
    // Whole-field regex; multiple specs AND; `!` inverts.
    assert(Warc.cdxFilterLines(lines, Seq("status:200")).size === 3)
    assert(Warc.cdxFilterLines(lines,
      Seq("mime:text/.*", "status:200")).size === 2)
    assert(Warc.cdxFilterLines(lines, Seq("!status:200")).size === 1)
    // WHOLE-field match: a prefix regex does not partial-match.
    assert(Warc.cdxFilterLines(lines, Seq("status:2")).isEmpty)
    // The two lead tokens address as urlkey/timestamp; JSON fields by
    // name; an absent field matches only the empty string.
    assert(Warc.cdxFilterLines(lines,
      Seq("urlkey:org,a\\)/y")).size === 1)
    assert(Warc.cdxFilterLines(lines,
      Seq("timestamp:202401011.*")).size === 3)
    assert(Warc.cdxFilterLines(lines, Seq("nosuch:.+")).isEmpty)
    assert(Warc.cdxFilterLines(lines, Seq("nosuch:")).size === 4)
    // Malformed specs fail loudly, never match-everything.
    intercept[IllegalArgumentException] {
      Warc.cdxFilterLines(lines, Seq("nocolon"))
    }
    intercept[IllegalArgumentException] {
      Warc.cdxFilterLines(lines, Seq("f:["))
    }
    // Collapse: first of each ADJACENT run — timestamp:8 is the
    // per-day calendar view; a later day reopens the run.
    assert(Warc.cdxCollapseLines(lines, "timestamp:8")
      .map(_.split(" ")(1)) ===
      Seq("20240101120000", "20240102120000", "20240101120000"))
    assert(Warc.cdxCollapseLines(lines, "digest").size === 3)
    assert(Warc.cdxCollapseLines(lines, "urlkey").size === 2)
    intercept[IllegalArgumentException] {
      Warc.cdxCollapseLines(lines, "timestamp:0")
    }
    // seedLine carries the fold across pages: page 2 of a day run
    // whose representative was served on page 1 emits nothing for
    // that day (without the seed it re-emitted a duplicate
    // representative per page).
    assert(Warc.cdxCollapseLines(lines.slice(1, 3), "timestamp:8",
      seedLine = lines.head).map(_.split(" ")(1)) ===
      Seq("20240102120000"))
    // Guards: spec count and regex length are capped; a
    // catastrophically-backtracking CLIENT regex aborts within its
    // budget instead of pinning the serving thread (the classic
    // (a+)+$ against a long run of a's).
    intercept[IllegalArgumentException] {
      Warc.cdxFilterLines(lines, Seq.fill(17)("status:200"))
    }
    intercept[IllegalArgumentException] {
      Warc.cdxFilterLines(lines, Seq("url:" + "a" * 513))
    }
    // (a{1,10}){1,10} against a 40-a run that can't match measures
    // 13 s of backtracking on this JDK unbudgeted (the (a+)+ classics
    // are optimized away by modern java.util.regex — measured, not
    // assumed); the budget must abort it in milliseconds.
    val evil = Seq("org,evil)/x 20240101120000 {\"digest\":\"" +
      "a" * 40 + "!\",\"status\":200}")
    val t0 = System.nanoTime()
    intercept[IllegalArgumentException] {
      Warc.cdxFilterLines(evil, Seq("digest:(a{1,10}){1,10}$"),
        budgetNanos = 50_000_000L)
    }
    assert(System.nanoTime() - t0 < 5_000_000_000L,
      "budget must abort the backtracking well under the test bound")
  }

  test("zipnumPrefix: adaptive chunking reads ~limit/blockLines blocks, not limit blocks") {
    val sparkSession = spark
    import sparkSession.implicits._
    val rows = (0 until 500).map { i =>
      (s"g${i % 3}", f"https://s.org/p/$i%03d", "2024-01-01T00:00:00Z",
        "text/plain", s"b$i".getBytes("UTF-8"))
    }.toDF("file_group", "url", "warc_date", "content_type", "body")
    val files = Warc.encodeResponses(rows, withCdx = true)
      .localCheckpoint(true)
    val dir = java.nio.file.Files.createTempDirectory("graft_znadp")
      .toString
    Warc.writeZipnum(files, dir, shards = 1, blockLines = 50)
    // limit=4 over 10 blocks of 50 lines: the 2-block seed chunk
    // already holds 100 lines — exactly 2 positioned reads. The
    // pre-fix sizing requested `limit` BLOCKS (4 here; `limit` at
    // serving defaults — 1000 — against blockLines=3000 defaults).
    val counting = new CountingFs(graft.FsIO.local)
    val page = Warc.zipnumPrefix(dir, "https://s.org/p/", counting,
      limit = 4)
    assert(page.size === 4)
    assert(counting.spansRequested.get === 2L,
      s"expected the 2-block seed chunk, read ${counting.spansRequested}")
    // limit spanning several blocks: the estimate converges on
    // ~ceil(remaining/linesPerBlock)+1 — well under one-span-per-line.
    val counting2 = new CountingFs(graft.FsIO.local)
    val page2 = Warc.zipnumPrefix(dir, "https://s.org/p/", counting2,
      limit = 120)
    assert(page2.size === 120)
    assert(counting2.spansRequested.get <= 5L,
      s"expected <= 5 blocks for 120 lines at 50/block, " +
        s"read ${counting2.spansRequested}")
  }

  test("zipnumDomain: host + subdomains in one key-ordered page stream over SURT keys") {
    val sparkSession = spark
    import sparkSession.implicits._
    // SURT keys: org,d)/… sorts BELOW org,d,a)/… (')' 0x29 < ',' 0x2c),
    // so host-own captures precede every subdomain's. e.org and
    // dz.org bracket the domain range (dz > d in the reversed form
    // org,dz).
    val rows = (Seq(
      ("g0", "https://d.org/a", "x"), ("g1", "https://d.org/b", "y"),
      ("g0", "https://a.d.org/p", "z"), ("g1", "https://b.d.org/q", "w"),
      ("g0", "https://c.b.d.org/r", "v"),
      ("g1", "https://dz.org/x", "u"), ("g0", "https://e.org/x", "t")))
      .map { case (g, u, b) =>
        (g, u, "2024-01-01T00:00:00Z", "text/plain", b.getBytes("UTF-8"))
      }.toDF("file_group", "url", "warc_date", "content_type", "body")
    val files = Warc.encodeResponses(rows, withCdx = true,
      cdxSurt = true).localCheckpoint(true)
    val dir = java.nio.file.Files.createTempDirectory("graft_zndom")
      .toString
    Warc.writeZipnum(files, dir, shards = 2, blockLines = 2)
    def keys(ls: Seq[String]) = ls.map(_.split(" ")(0))
    // Host + all subdomains, host-own first, then subdomains in key
    // order; the sibling dz.org and unrelated e.org stay out.
    val all = Warc.zipnumDomain(dir, "org,d")
    assert(keys(all) === Seq("org,d)/a", "org,d)/b", "org,d,a)/p",
      "org,d,b)/q", "org,d,b,c)/r"))
    // Paging WALKS the two ranges as one stream: limit=2 pages chain
    // across the host/subdomain boundary with no dup/gap.
    val got = scala.collection.mutable.ArrayBuffer.empty[String]
    var page = Warc.zipnumDomain(dir, "org,d", limit = 2)
    while (page.nonEmpty) {
      got ++= page
      page = Warc.zipnumDomain(dir, "org,d", limit = 2,
        afterLine = page.last)
    }
    assert(got.toSeq === all)
    // A subdomain-range resume never re-reads the host range.
    assert(keys(Warc.zipnumDomain(dir, "org,d", limit = 2,
      afterLine = all(2))) === Seq("org,d,b)/q", "org,d,b,c)/r"))
    // A corrupted resume sorting ABOVE both ranges (a sibling host's
    // line) yields empty — NOT a duplicate replay of the subdomain
    // range (review r17 session pass: afterLine now reaches the
    // subdomain scan unconditionally, whose strictly-after filter
    // kills everything below the corrupt resume).
    assert(Warc.zipnumDomain(dir, "org,d",
      afterLine = "org,dz)/x 20240101000000 {}").isEmpty)
    // And one sorting BELOW both degrades to the full fresh scan.
    assert(keys(Warc.zipnumDomain(dir, "org,d",
      afterLine = "org,a)/x 20240101000000 {}")) === keys(all))
    // Bare-host contract is enforced.
    intercept[IllegalArgumentException] {
      Warc.zipnumDomain(dir, "org,d)")
    }
    // Misses: a domain with no captures at all.
    assert(Warc.zipnumDomain(dir, "org,nothere").isEmpty)
  }

  test("replayCapture: closest-ts body replay, revisit resolution, victim scrub") {
    val sparkSession = spark
    import sparkSession.implicits._
    val rows = (Seq(
      ("g0", "https://r.org/dup", "2024-01-01T00:00:00Z", "AAAA"),
      ("g1", "https://r.org/dup", "2024-02-01T00:00:00Z", "BBBB"),
      ("g2", "https://r.org/dup", "2024-03-01T00:00:00Z", "CCCC")) ++
      (0 until 5).map(i => (s"g${i % 3}", s"https://r.org/p/$i",
        "2024-01-01T00:00:00Z", s"body $i")))
      .map { case (g, u, d, b) =>
        (g, u, d, "text/plain", b.getBytes("UTF-8"))
      }.toDF("file_group", "url", "warc_date", "content_type", "body")
    val files = Warc.encodeResponses(rows, withCdx = true)
      .localCheckpoint(true)
    val arch = java.nio.file.Files.createTempDirectory("graft_rp_arch")
      .toString
    Warc.writeFiles(files, arch)
    val zn = java.nio.file.Files.createTempDirectory("graft_rp_zn")
      .toString
    Warc.writeZipnum(files, zn, shards = 2, blockLines = 2)
    // Basic replay: the archived BODY bytes come back exactly, with
    // the recorded status/mime and the capture's own timestamp.
    val c0 = Warc.replayCapture(zn, arch, "https://r.org/p/0").get
    assert(new String(c0.body, "UTF-8") === "body 0")
    assert(c0.status === 200L && c0.mime === "text/plain")
    assert(c0.timestamp === "20240101000000")
    // Closest-match ts semantics: a mid-February probe lands on the
    // February capture; no ts = latest.
    assert(new String(Warc.replayCapture(zn, arch, "https://r.org/dup",
      ts = "20240215").get.body, "UTF-8") === "BBBB")
    assert(new String(Warc.replayCapture(zn, arch, "https://r.org/dup")
      .get.body, "UTF-8") === "CCCC")
    assert(new String(Warc.replayCapture(zn, arch, "https://r.org/dup",
      ts = "2024").get.body, "UTF-8") === "AAAA") // prefix pads to Jan 1
    // Misses and scrubs return None, never a throw.
    assert(Warc.replayCapture(zn, arch, "https://zz.org/x").isEmpty)
    assert(Warc.replayCapture(zn, arch, "https://r.org/p/0",
      victims = Set("https://r.org/p/0")).isEmpty)

    // REVISIT resolution: call 2 re-delivers call 1's bytes at a /dup
    // URL — the export writes a payload-free revisit whose `refers`
    // names call 1's record; replaying the /dup key must serve the
    // ORIGINAL's body, and a takedown on the original kills the
    // revisit replay too (it points at removed content).
    val expDir = java.nio.file.Files.createTempDirectory("graft_rp_inc")
      .toString
    val store = Warc.revisitStore(spark, s"$expDir-reps",
      tableName = "rp_inc_reps")
    store.reset()
    def call(n: Int, urls: Seq[(String, String)]) = urls.map {
      case (u, b) => (s"c${n}g0", u, s"2024-0$n-01T00:00:00Z",
        "text/plain", b.getBytes("UTF-8"))
    }.toDF("file_group", "url", "warc_date", "content_type", "body")
    Warc.exportIncremental(call(1,
      Seq(("https://inc.org/doc/0", "PAYLOAD-0"))), store, expDir,
      withCdx = true)
    Warc.exportIncremental(call(2,
      Seq(("https://inc.org/dup/0", "PAYLOAD-0"))), store, expDir,
      withCdx = true)
    import org.apache.spark.sql.functions.{col, regexp_extract}
    val cdxFiles = spark.read.format("binaryFile").load(expDir)
      .filter(col("path").endsWith(".cdx"))
      .select(regexp_extract(col("path"), "([^/]+)$", 1).as("path"),
        col("content"))
    val zn2 = java.nio.file.Files.createTempDirectory("graft_rp_zn2")
      .toString
    Warc.writeZipnum(cdxFiles, zn2, shards = 1, blockLines = 2)
    val dup = Warc.replayCapture(zn2, expDir, "https://inc.org/dup/0")
      .get
    assert(new String(dup.body, "UTF-8") === "PAYLOAD-0")
    assert(dup.url === "https://inc.org/doc/0") // the original served
    assert(Warc.replayCapture(zn2, expDir, "https://inc.org/dup/0",
      victims = Set("https://inc.org/doc/0")).isEmpty)
  }

  test("zipnumLookup: positioned reads only — never the rest of the shard; missing shard is empty; stale cluster refuses") {
    val sparkSession = spark
    import sparkSession.implicits._
    // One shard, many small blocks: a lookup must read the summary plus
    // ONLY the probed blocks' ranges (r15 verdict: readAllBytes
    // defeated the summary index at shard scale).
    val rows = (0 until 30).map { i =>
      (s"g${i % 3}", f"https://s.org/p/$i%02d", "2024-01-01T00:00:00Z",
        "text/plain", ("body " * 50 + i).getBytes("UTF-8"))
    }.toDF("file_group", "url", "warc_date", "content_type", "body")
    val files = Warc.encodeResponses(rows, withCdx = true)
      .localCheckpoint(true)
    val expDir = java.nio.file.Files.createTempDirectory("graft_zs_exp")
      .toString
    Warc.writeFiles(files, expDir)
    val dir = java.nio.file.Files.createTempDirectory("graft_zseek")
      .toString
    Warc.writeZipnum(files, dir, shards = 1, blockLines = 2)
    val counting = new CountingFs(graft.FsIO.local)
    val hit = Warc.zipnumLookup(dir, "https://s.org/p/17", counting)
    assert(hit.size === 1 && hit.head.contains("/p/17 "))
    val idxSize = graft.FsIO.local.size(
      graft.FsIO.local.resolve(dir, "cluster.idx"))
    val shardName = graft.FsIO.local.list(dir)
      .find(_.matches("cdx-(?:g\\d+-)?\\d{5}\\.gz")).get
    val shardSize = graft.FsIO.local.size(
      graft.FsIO.local.resolve(dir, shardName))
    // Summary entries name the block lengths; the probed run is ≤ 2
    // blocks (strictly-below start + equal-key continuation).
    val maxBlock = new String(graft.FsIO.local.read(
      graft.FsIO.local.resolve(dir, "cluster.idx")), "UTF-8")
      .split("\n").filter(_.nonEmpty).map(_.split("\t")(3).toInt).max
    assert(counting.bytesRead.get <= idxSize + 2L * maxBlock,
      s"lookup read ${counting.bytesRead.get} bytes — more than " +
        s"summary ($idxSize) + 2 blocks (≤ ${2L * maxBlock})")
    assert(counting.bytesRead.get < idxSize + shardSize,
      "lookup must not read the whole shard")
    // Fresh cluster: verifyExports mode serves.
    assert(Warc.zipnumLookup(dir, "https://s.org/p/17",
      verifyExports = expDir).size === 1)
    // A rewritten source index (what eraseExports does) flips the
    // cluster stale — verify mode REFUSES instead of serving the old
    // attribution lines; the bare mode still reads (the HTTP scrub is
    // the second net there).
    val g1 = graft.FsIO.local.resolve(expDir, "g1.cdx")
    graft.FsIO.local.write(g1, "x rewritten\n".getBytes("UTF-8"))
    assert(Warc.zipnumStale(dir, expDir))
    intercept[IllegalStateException] {
      Warc.zipnumLookup(dir, "https://s.org/p/17", verifyExports = expDir)
    }
    // The prefix scan refuses a stale cluster through the same gate.
    intercept[IllegalStateException] {
      Warc.zipnumPrefix(dir, "https://s.org/p/1", verifyExports = expDir)
    }
    // Geometry survives in the manifest for the rebuild cadence.
    assert(Warc.zipnumGeometry(dir) === Some((1, 2)))
    // A shard deleted out from under the cluster (mid-rebuild race) is
    // an empty answer, never a throw.
    graft.FsIO.local.delete(graft.FsIO.local.resolve(dir, shardName))
    assert(Warc.zipnumLookup(dir, "https://s.org/p/17").isEmpty)
    assert(Warc.zipnumPrefix(dir, "https://s.org/p/1").isEmpty)
  }

  test("exportIncremental: same (url, date) twins in different groups — and exact duplicate rows — replay byte-stably") {
    val sparkSession = spark
    import sparkSession.implicits._
    def dirBytes(dir: String): Map[String, Seq[Byte]] =
      graft.FsIO.local.list(dir).map(n => n ->
        graft.FsIO.local.read(graft.FsIO.local.resolve(dir, n)).toSeq)
        .toMap
    // Row A and row B share digest AND (url, warc_date) but ship to
    // DIFFERENT archives; rows C1/C2 are byte-identical twins in the
    // SAME archive. First run: one response + revisits. Replay (advice
    // r15): the url+date-only self-exemption used to turn B and C2
    // back into full responses — bytes differed and payloads
    // duplicated; the full-identity exemption (archive included) and
    // the rn window keep them revisits.
    val rows = Seq(
      ("a1", "https://t.org/same", "2024-01-01T00:00:00Z", "text/plain",
        "shared body".getBytes("UTF-8")),
      ("b1", "https://t.org/same", "2024-01-01T00:00:00Z", "text/plain",
        "shared body".getBytes("UTF-8")),
      ("c1", "https://t.org/dup", "2024-02-01T00:00:00Z", "text/plain",
        "dup body".getBytes("UTF-8")),
      ("c1", "https://t.org/dup", "2024-02-01T00:00:00Z", "text/plain",
        "dup body".getBytes("UTF-8")))
      .toDF("file_group", "url", "warc_date", "content_type", "body")
    val dir = java.nio.file.Files.createTempDirectory("graft_twin")
      .toString
    val store = Warc.revisitStore(spark,
      java.nio.file.Files.createTempDirectory("graft_twin_reps").toString,
      "twin_reps_spec")
    Warc.exportIncremental(rows, store, dir)
    val first = dirBytes(dir)
    // One response for the shared digest (archive a1), one revisit
    // (archive b1); one response + one revisit for the c1 twins.
    val recs = Warc.records(
      spark.read.format("binaryFile").load(dir)
        .filter(org.apache.spark.sql.functions.col("path")
          .endsWith(".warc.gz"))
        .select(org.apache.spark.sql.functions.col("path"),
          org.apache.spark.sql.functions.col("content").as("bytes")),
      gzipped = true)
    val types = recs.select("warc_type").collect().map(_.getString(0))
    assert(types.count(_ == "response") === 2)
    assert(types.count(_ == "revisit") === 2)
    // REPLAY: byte-identical directory.
    Warc.exportIncremental(rows, store, dir)
    assert(dirBytes(dir) === first)
  }

  test("exportIncremental: encode-pass rep side channel equals the legacy min-over-total-order aggregation (r18 single-body-scan)") {
    val sparkSession = spark
    import sparkSession.implicits._
    import org.apache.spark.sql.functions._
    // Every rep-derivation class at once: a digest duplicated across
    // groups (rep = the total order's FIRST row, group a1), exact
    // duplicate rows, a null body (never a rep), a digest the store
    // already holds from call 1 (never re-recorded, even though call 2
    // re-delivers it at a new URL), and a plain fresh digest.
    def df(rows: Seq[(String, String, String, Array[Byte])]) =
      rows.map { case (g, u, d, b) => (g, u, d, "text/plain", b) }
        .toDF("file_group", "url", "warc_date", "content_type", "body")
    val call1 = df(Seq(
      ("b1", "https://sc.org/z", "2024-01-01T00:00:00Z",
        "shared".getBytes("UTF-8")),
      ("a1", "https://sc.org/a", "2024-01-01T00:00:00Z",
        "shared".getBytes("UTF-8")),
      ("a1", "https://sc.org/dup", "2024-01-01T00:00:00Z",
        "twin".getBytes("UTF-8")),
      ("a1", "https://sc.org/dup", "2024-01-01T00:00:00Z",
        "twin".getBytes("UTF-8")),
      ("a1", "https://sc.org/null", "2024-01-01T00:00:00Z", null)))
    val call2 = df(Seq(
      ("c1", "https://sc.org/re", "2024-02-01T00:00:00Z",
        "shared".getBytes("UTF-8")), // digest already in the store
      ("c1", "https://sc.org/new", "2024-02-01T00:00:00Z",
        "fresh".getBytes("UTF-8"))))
    val dir = java.nio.file.Files.createTempDirectory("graft_repsc")
      .toString
    val store = Warc.revisitStore(spark,
      java.nio.file.Files.createTempDirectory("graft_repsc_s").toString,
      "repsc_spec")
    // The legacy derivation the side channel must reproduce: first row
    // per digest under the (url, date, group, type) total order, null
    // bodies excluded, digests hex like Catalyst sha1().
    def legacy(rows: org.apache.spark.sql.DataFrame) = rows
      .withColumn("_dig", when(col("body").isNotNull, sha1(col("body"))))
      .filter(col("_dig").isNotNull)
      .groupBy(col("_dig").as("digest"))
      .agg(min(struct(col("url"), col("warc_date"), col("file_group"),
        col("content_type"))).as("o"))
      .select(col("digest"), col("o.url").as("url"),
        col("o.warc_date").as("warc_date"),
        concat(col("o.file_group"), lit(".warc.gz")).as("archive"))
    val expected1 = legacy(call1).collect().map(_.toSeq).toSet
    Warc.exportIncremental(call1, store, dir)
    def stored() = store.selectAll
      .select("digest", "url", "warc_date", "archive")
      .collect().map(_.toSeq).toSet
    assert(stored() === expected1)
    // Call 2 records ONLY the fresh digest — the re-delivered shared
    // digest stays attributed to call 1's original.
    val expected2 = expected1 ++
      legacy(call2).filter(col("url") === "https://sc.org/new")
        .collect().map(_.toSeq).toSet
    Warc.exportIncremental(call2, store, dir)
    assert(stored() === expected2)
  }

  test("encodeResponses: stored-original re-delivery that is NOT the digest's in-call winner — all rows revisit, none respond (the pre-r18 window's exact corner)") {
    val sparkSession = spark
    import sparkSession.implicits._
    import org.apache.spark.sql.functions.col
    // The store says digest d's original is u1@arch g1; this call
    // delivers BOTH u1 (the exempt re-delivery) and u0 < u1 (sorts
    // first). The old per-digest window made u0 a revisit of the prior
    // (u1) and the exempt u1 — at rn 2 — a revisit of the window's
    // first row (u0): no response at all. The r18 narrow-proxy
    // decision table must reproduce that corner exactly, not
    // "improve" it.
    val shared = "corner body".getBytes("UTF-8")
    val prior = Seq(
      (graft.sources.Warc.sha1Digest(shared), "", "", ""))
      .toDF("digest", "url", "warc_date", "archive")
      .select(
        // hex digest, like Catalyst sha1() — recompute from bytes.
        org.apache.spark.sql.functions.sha1(
          org.apache.spark.sql.functions.lit(shared)).as("digest"),
        org.apache.spark.sql.functions.lit("https://x.org/u1").as("url"),
        org.apache.spark.sql.functions.lit("2024-01-01T00:00:00Z")
          .as("warc_date"),
        org.apache.spark.sql.functions.lit("g1.warc.gz").as("archive"))
    val rows = Seq(
      ("g1", "https://x.org/u0", "2024-01-01T00:00:00Z", "text/plain",
        shared),
      ("g1", "https://x.org/u1", "2024-01-01T00:00:00Z", "text/plain",
        shared))
      .toDF("file_group", "url", "warc_date", "content_type", "body")
    val files = Warc.encodeResponses(rows, withRevisits = true,
      priorReps = prior)
    val recs = Warc.records(
      files.select(col("path"), col("content").as("bytes")),
      gzipped = true)
      .select("target_uri", "warc_type", "refers_to_uri").collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getString(2)))
      .toMap
    assert(recs("https://x.org/u0") ===
      ("revisit", "https://x.org/u1")) // prior preempts the window
    assert(recs("https://x.org/u1") ===
      ("revisit", "https://x.org/u0")) // exempt but not winner: rn > 1
  }

  test("exportIncremental: cross-call revisits, replay byte-stability, crash-before-rep-append convergence") {
    val sparkSession = spark
    import sparkSession.implicits._
    import org.apache.spark.sql.functions.col
    def rows(group: String, entries: (String, String)*) =
      entries.map { case (u, b) =>
        (group, u, "2024-01-01T00:00:00Z", "text/plain",
          b.getBytes("UTF-8"))
      }.toDF("file_group", "url", "warc_date", "content_type", "body")
    def dirBytes(dir: String): Map[String, Seq[Byte]] = {
      val s = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      try s.toArray.toSeq.map(_.asInstanceOf[java.nio.file.Path])
        .map(p => p.getFileName.toString ->
          java.nio.file.Files.readAllBytes(p).toSeq).toMap
      finally s.close()
    }
    def tmp(tag: String) =
      java.nio.file.Files.createTempDirectory(s"graft_inc_$tag").toString
    val rows1 = rows("a1", "https://e.org/u/1" -> "body X",
      "https://e.org/u/2" -> "body Y")
    val rows2 = rows("b1", "https://e.org/u/3" -> "body X", // dup of u/1
      "https://e.org/u/4" -> "body Z")
    val dir = tmp("main")
    val store = Warc.revisitStore(spark, tmp("reps"), "inc_reps_spec")
    Warc.exportIncremental(rows1, store, dir)
    val afterCall1 = dirBytes(dir)
    // REPLAY of a completed call: the stored originals re-emit as
    // responses (url+date match), bytes identical — never a
    // revisit-of-itself.
    Warc.exportIncremental(rows1, store, dir)
    assert(dirBytes(dir) === afterCall1)
    // Call 2: u/3's bytes duplicate call 1's u/1 — in a different call,
    // where the in-call window can't see it.
    Warc.exportIncremental(rows2, store, dir)
    val recs = Warc.records(
      spark.read.format("binaryFile").load(dir)
        .filter(col("path").endsWith(".warc.gz"))
        .select(col("path"), col("content").as("bytes")),
      gzipped = true)
    val u3 = recs.filter(col("target_uri") === "https://e.org/u/3")
      .collect().head
    assert(u3.getAs[String]("warc_type") === "revisit")
    assert(u3.getAs[String]("refers_to_uri") === "https://e.org/u/1")
    val resolved = Warc.resolveRevisits(recs)
      .select("target_uri", "original_uri").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(resolved("https://e.org/u/3") === "https://e.org/u/1")
    // CRASH WINDOW: archives landed but the rep append didn't (store
    // empty). The retry overwrites byte-identically, records the reps,
    // and the next call converges to the exact same bytes as the
    // clean run.
    val dir3 = tmp("crash")
    val store3 = Warc.revisitStore(spark, tmp("reps3"), "inc_reps_crash")
    Warc.writeFiles(Warc.encodeResponses(rows1, withRevisits = true),
      dir3) // the crashed first call: files on disk, no reps recorded
    Warc.exportIncremental(rows1, store3, dir3) // retry
    Warc.exportIncremental(rows2, store3, dir3)
    assert(dirBytes(dir3) === dirBytes(dir))
  }
}
