package graft.sources

import graft.SparkSpec

/** WARC framing + gzip semantics: hand-built records parse to exact
  * field/payload values, the framing rules (Content-Length, double-CRLF
  * terminator, all-or-nothing on damage) are enforced, the member-walk
  * gzip validates trailers and fails bombs before allocating, and
  * hostile bytes never throw anywhere. */
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
