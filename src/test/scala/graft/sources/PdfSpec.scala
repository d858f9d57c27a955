package graft.sources

import graft.SparkSpec

/** PDF extraction contract: hand-built files parse to exact text
  * (literal escapes, octal, nested parens, hex strings, TJ kerns,
  * EOL-in-literal normalization), FlateDecode round-trips, the stream
  * delimiter beats a lying /Length, unsupported filters are counted
  * not thrown, multi-page order holds, and hostile bytes never throw. */
class PdfSpec extends SparkSpec {

  private def b(s: String): Array[Byte] = s.getBytes("ISO-8859-1")

  private def onePage(content: String): Array[Byte] = b(
    "%PDF-1.4\n" +
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n" +
      s"4 0 obj << /Length ${content.length} >> stream\n$content\nendstream endobj\n" +
      "%%EOF\n")

  test("literal escapes, octal, nesting, hex strings, kerns, EOLs") {
    val d = Pdf.extract(onePage(
      "BT (a \\(nested\\) \\\\ b) Tj ET")).get
    assert(d.text === "a (nested) \\ b")
    // Octal escapes (1-3 digits) and the unknown-escape pass-through.
    assert(Pdf.extract(onePage("BT (\\101\\102\\61 \\q) Tj ET")).get.text ===
      "AB1 q")
    // Balanced UNESCAPED parens are legal inside literals.
    assert(Pdf.extract(onePage("BT (a (inner) b) Tj ET")).get.text ===
      "a (inner) b")
    // Hex strings: case-insensitive, whitespace ignored, odd digit pads.
    assert(Pdf.extract(onePage("BT <48 65 6c 6C 6f> Tj ET")).get.text ===
      "Hello")
    assert(Pdf.extract(onePage("BT <48 4> Tj ET")).get.text === "H@")
    // TJ kern rule: <= -180 is a word gap, smaller is not.
    assert(Pdf.extract(onePage("BT [(a) -200 (b) -179 (c) -181 (d)] TJ ET"))
      .get.text === "a bc d")
    // Unescaped CR / CRLF inside a literal records as LF (7.3.4.2);
    // escaped \r survives as CR.
    assert(Pdf.extract(onePage("BT (x\r\ny\rz\\rw) Tj ET")).get.text ===
      "x\ny\nz\rw")
    // Line continuation: backslash-EOL vanishes.
    assert(Pdf.extract(onePage("BT (ab\\\r\ncd) Tj ET")).get.text === "abcd")
  }

  test("FlateDecode round-trip; delimiter beats lying /Length; bad filter counted") {
    val content = "BT (compressed body) Tj ET"
    val raw = content.getBytes("ISO-8859-1")
    val defl = {
      val d = new java.util.zip.Deflater()
      d.setInput(raw); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end(); out.toByteArray
    }
    val pdf = new java.io.ByteArrayOutputStream()
    pdf.write(b("%PDF-1.4\n" +
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /Contents 4 0 R >> endobj\n" +
      s"4 0 obj << /Length ${defl.length} /Filter /FlateDecode >> stream\n"))
    pdf.write(defl)
    pdf.write(b("\nendstream endobj\n%%EOF\n"))
    val d1 = Pdf.extract(pdf.toByteArray).get
    assert(d1.text === "compressed body")
    assert((d1.streams, d1.streamsDecoded) === ((1, 1)))
    // A /Length wildly disagreeing with the delimiter is ignored: the
    // endstream scan still recovers the body.
    val lying = onePage("BT (trust the delimiter) Tj ET")
    val lied = new String(lying, "ISO-8859-1")
      .replaceFirst("/Length \\d+", "/Length 999999")
    assert(Pdf.extract(b(lied)).get.text === "trust the delimiter")
    // Unsupported filter: stream counted, not decoded, no throw.
    val dct = new String(onePage("raw jpeg bytes"), "ISO-8859-1")
      .replaceFirst(">> stream", "/Filter /DCTDecode >> stream")
    val d2 = Pdf.extract(b(dct)).get
    assert((d2.streams, d2.streamsDecoded, d2.text) === ((1, 0, "")))
  }

  test("multi-page order, contents arrays, page/object counts") {
    val pdf = b("%PDF-1.4\n" +
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 >> endobj\n" +
      "3 0 obj << /Type /Page /Contents [4 0 R] >> endobj\n" +
      "4 0 obj << /Length 19 >> stream\nBT (page one) Tj ET\nendstream endobj\n" +
      "5 0 obj << /Type /Page /Contents 6 0 R >> endobj\n" +
      "6 0 obj << /Length 19 >> stream\nBT (page two) Tj ET\nendstream endobj\n" +
      "%%EOF\n")
    val d = Pdf.extract(pdf).get
    assert(d.pages === 2)
    assert(d.objects === 6)
    assert(d.text === "page one\npage two")
  }

  test("object streams: page dicts inside compressed /ObjStm are found") {
    val pdf = PdfPack.pdfObjStmFile(9L, "hidden page body")
    val d = Pdf.extract(pdf).get
    assert(d.pages === 1) // invisible to the linear scan alone
    assert(d.objects === 5) // 4 linear + 1 contained
    assert(d.text ===
      "d9 says:\nhidden p\nage body\nkern gapx\nesc (x) \\ done")
    // A multi-object stream, uncompressed, with a same-numbered update:
    // contained objects win the .last pick (incremental convention).
    val stmBody = "7 0 8 14\n<< /A (one) >><< /Type /Page >>"
    val pdf2 = b("%PDF-1.5\n" +
      s"6 0 obj << /Type /ObjStm /N 2 /First 9 >> stream\n$stmBody\nendstream endobj\n" +
      "7 0 obj << /A (zero) >> endobj\n")
    val info = Pdf.extract(pdf2).get
    assert(info.objects === 4) // 2 linear + 2 contained
    assert(info.pages === 1) // object 8's page dict counted
    // Malformed header: stream skipped, no throw.
    val bad = b("%PDF-1.5\n6 0 obj << /Type /ObjStm /N 2 /First 4 >> " +
      "stream\nxx\nendstream endobj\n")
    assert(Pdf.extract(bad).get.objects === 1)
  }

  test("/ToUnicode CMaps: bfchar/bfrange forms, code lengths, overlap, damage") {
    // bfchar + incrementing bfrange + array bfrange + multi-unit dst.
    val cm = Pdf.parseCMap(b(
      """1 begincodespacerange <0000> <FFFF> endcodespacerange
        |2 beginbfchar <0020> <0020> <0077> <00660069> endbfchar
        |2 beginbfrange <0041> <005A> <0391>
        |<0061> <0063> [<03B1> <03B2> <03B3>] endbfrange""".stripMargin)).get
    def d2(codes: Int*): Array[Byte] =
      codes.flatMap(c => Seq(((c >> 8) & 0xff).toByte, (c & 0xff).toByte)).toArray
    assert(cm.decode(d2(0x41, 0x20, 0x5a)) === "Α Ϊ")
    assert(cm.decode(d2(0x61, 0x62, 0x63)) === "αβγ")
    assert(cm.decode(d2(0x77)) === "fi") // multi-unit destination
    assert(cm.decode(d2(0x1234)) === "�") // in-space, unmapped
    // Overlapping entries: the LATER mapping wins (writers patch last).
    val over = Pdf.parseCMap(b(
      """1 begincodespacerange <0000> <FFFF> endcodespacerange
        |1 beginbfrange <0041> <005A> <0391> endbfrange
        |1 beginbfchar <0041> <0058> endbfchar""".stripMargin)).get
    assert(over.decode(d2(0x41)) === "X")
    assert(over.decode(d2(0x42)) === "Β") // rest of the range holds
    // Mixed code lengths: a 1-byte and a 2-byte codespace coexist; the
    // byte stream segments by range containment.
    val mixed = Pdf.parseCMap(b(
      """2 begincodespacerange <00> <7F> <8000> <FFFF> endcodespacerange
        |2 beginbfchar <41> <0058> <8001> <0059> endbfchar""".stripMargin)).get
    assert(mixed.decode(Array[Byte](0x41, 0x80.toByte, 0x01, 0x41)) === "XYX")
    // Malformed inputs: no mapping → None; truncation keeps the parsed
    // prefix; garbage never throws.
    assert(Pdf.parseCMap(Array[Byte](0, 31, 127, 0)) === None)
    assert(Pdf.parseCMap(b("2 beginbfchar <0041>")) === None)
    val trunc = Pdf.parseCMap(b(
      "1 beginbfchar <0041> <0058> endbfchar 9 beginbfrange <00")).get
    assert(trunc.decode(d2(0x41)) === "X")
    // Range-span bomb cap: a 4-byte range wider than 65 536 is refused.
    assert(Pdf.parseCMap(b(
      "1 beginbfrange <00000000> <7FFFFFFF> <0041> endbfrange")) === None)
  }

  test("/ToUnicode end to end: Tf switching, stream-spanning state, failed CMaps counted") {
    val d = Pdf.extract(PdfPack.pdfCmapFile(7L, "plain tail")).get
    assert(d.text === "Α٧Ϊ\nαβγ\nfi �\nw:plain tail")
    assert((d.fontsCmap, d.fontsCmapFailed) === ((1, 0)))
    // Every fifth doc declares a /ToUnicode whose stream is garbage:
    // its line falls back to WinAnsi and the failure is COUNTED.
    val bad = Pdf.extract(PdfPack.pdfCmapFile(10L, "t")).get
    assert(bad.text.endsWith("w:t\nwin 10"))
    assert((bad.fontsCmap, bad.fontsCmapFailed) === ((1, 1)))
    // Font state must span a /Contents ARRAY: Tf lands in stream one,
    // the show string in stream two — one graphics state per page.
    val cmapBody = "1 begincodespacerange <0000> <FFFF> endcodespacerange\n" +
      "1 beginbfchar <0041> <0396> endbfchar"
    val split = b("%PDF-1.4\n" +
      "3 0 obj << /Type /Page /Resources << /Font << /G 5 0 R >> >> " +
      "/Contents [4 0 R 6 0 R] >> endobj\n" +
      "4 0 obj << /Length 12 >> stream\nBT /G 9 Tf \nendstream endobj\n" +
      "6 0 obj << /Length 14 >> stream\n<0041> Tj ET\nendstream endobj\n" +
      "5 0 obj << /Type /Font /ToUnicode 7 0 R >> endobj\n" +
      s"7 0 obj << /Length ${cmapBody.length} >> stream\n$cmapBody\nendstream endobj\n")
    assert(Pdf.extract(split).get.text === "Ζ")
    // Inherited /Resources: the font dict lives on the PAGES node, the
    // page inherits through /Parent.
    val inherited = b("%PDF-1.4\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 " +
      "/Resources << /Font << /G 5 0 R >> >> >> endobj\n" +
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n" +
      "4 0 obj << /Length 24 >> stream\nBT /G 9 Tf <0041> Tj ET\nendstream endobj\n" +
      "5 0 obj << /Type /Font /ToUnicode 7 0 R >> endobj\n" +
      s"7 0 obj << /Length ${cmapBody.length} >> stream\n$cmapBody\nendstream endobj\n")
    assert(Pdf.extract(inherited).get.text === "Ζ")
    // INLINE font dicts count once per distinct dict, like CRef fonts:
    // TWO pages inherit ONE pages-node /Resources whose font is an
    // inline dict (no object number) declaring a /ToUnicode that
    // resolves fine — pdf_fonts_cmap must be 1, not per-page-inflated
    // (advice r12); same instance-dedup for the FAILED counter, pinned
    // with a second doc whose inline /ToUnicode ref dangles.
    def twoPageInline(toUni: String): Array[Byte] = b("%PDF-1.4\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R 8 0 R] /Count 2 " +
      s"/Resources << /Font << /G << /Type /Font /ToUnicode $toUni >> >> >> >> endobj\n" +
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n" +
      "8 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n" +
      "4 0 obj << /Length 24 >> stream\nBT /G 9 Tf <0041> Tj ET\nendstream endobj\n" +
      s"7 0 obj << /Length ${cmapBody.length} >> stream\n$cmapBody\nendstream endobj\n")
    val inlineOk = Pdf.extract(twoPageInline("7 0 R")).get
    assert(inlineOk.text === "Ζ\nΖ")
    assert((inlineOk.fontsCmap, inlineOk.fontsCmapFailed) === ((1, 0)))
    val inlineBad = Pdf.extract(twoPageInline("9 0 R")).get // dangling ref
    assert((inlineBad.fontsCmap, inlineBad.fontsCmapFailed) === ((0, 1)))
  }

  test("xref streams: type-1/type-2/free liveness beats document order; torture edges counted") {
    // The fixture's correct reading exists ONLY via the xref stream: a
    // type-2 entry picks the real page among two ObjStm copies, a
    // type-1 offset the unshadowed content, a type-0 mark drops a
    // freed decoy page. (Stream: FlateDecode + PNG Up predictor.)
    val good = Pdf.extract(PdfPack.pdfXrefFile(1L, "alpha")).get
    assert(good.text === "xref alpha")
    assert(good.pages === 1)
    assert((good.xrefSections, good.xrefFailed) === ((1, 0)))
    // No-xref variant: document order reads it identically, no
    // sections, no failures (and legacy ASCII `xref` tables never
    // count as failed sections either).
    val plain = Pdf.extract(PdfPack.pdfXrefFile(3L, "beta")).get
    assert(plain.text === "xref beta")
    assert((plain.xrefSections, plain.xrefFailed) === ((0, 0)))

    val bytes = PdfPack.pdfXrefFile(1L, "alpha")
    def mutated(find: String, repl: String): Array[Byte] = {
      require(find.length == repl.length, "offset-preserving edits only")
      new String(bytes, "ISO-8859-1").replace(find, repl)
        .getBytes("ISO-8859-1")
    }
    // Edits INSIDE the xref dict may change length — every recorded
    // offset and the startxref VALUE point before it.
    def mutatedFree(find: String, repl: String): Array[Byte] =
      new String(bytes, "ISO-8859-1").replace(find, repl)
        .getBytes("ISO-8859-1")
    // Truncated /W (two fields): the section is unusable — COUNTED,
    // and liveness falls back to document order, which picks every
    // decoy (2 pages incl. the freed one, the wrong text) — exactly
    // the failure class the xref exists to prevent.
    val truncW = Pdf.extract(mutated("/W [1 3 1]", "/W [1 3  ]")).get
    assert((truncW.xrefSections, truncW.xrefFailed) === ((0, 1)))
    assert(truncW.pages === 2)
    assert(truncW.text === "wrong 1\nwrong 1")
    // An out-of-range field width is equally unusable.
    val wideW = Pdf.extract(mutated("/W [1 3 1]", "/W [1 3 9]")).get
    assert((wideW.xrefSections, wideW.xrefFailed) === ((0, 1)))
    // A LYING /Index declaring more rows than the stream holds clamps
    // to the data present — the entries that exist still govern.
    val lieIx = Pdf.extract(mutatedFree("/Index [0 9]", "/Index [0 10]")).get
    assert(lieIx.text === "xref alpha")
    assert((lieIx.pages, lieIx.xrefSections, lieIx.xrefFailed) === ((1, 1, 0)))
    // …including a BOMB /Index (~1e12 declared rows): the loop is
    // bounded by the rows the body actually holds, so this returns
    // promptly instead of spinning the task for hours (review r13).
    val bomb = Pdf.extract(
      mutatedFree("/Index [0 9]", "/Index [0 888888888888]")).get
    assert(bomb.text === "xref alpha")
    assert((bomb.pages, bomb.xrefSections, bomb.xrefFailed) === ((1, 1, 0)))
    // An ILLEGAL /Predictor value (3–9 are not in §7.4.4.4) must fail
    // the section honestly, never mis-decode-and-count-parsed.
    val badPred = Pdf.extract(
      mutatedFree("/Predictor 12", "/Predictor 5")).get
    assert((badPred.xrefSections, badPred.xrefFailed) === ((0, 1)))
    assert(badPred.text === "wrong 1\nwrong 1")
    // A lying startxref (no object header there): counted, fallback.
    val off = new String(bytes, "ISO-8859-1")
      .split("startxref\n")(1).split("\n")(0)
    val lieSx = Pdf.extract(mutated(s"startxref\n$off",
      s"startxref\n${"0" * off.length}")).get
    assert((lieSx.xrefSections, lieSx.xrefFailed) === ((0, 1)))
    assert(lieSx.text === "wrong 1\nwrong 1")
    // /Info follows the SAME liveness: the xref's type-1 entry picks
    // the real title revision (the /Info REFERENCE itself comes from
    // the XRef dict — 1.5+ files have no `trailer` keyword), while the
    // no-xref fallback honestly reads the last revision in the file.
    assert(Pdf.docInfo(bytes).get("Title") === "real title 1")
    // With the chain unusable there is NO /Info reference at all (no
    // keyword trailer, and the XRef dict is only trusted when its
    // section parses): resolution falls to the documented heuristic —
    // the first Info-shaped object in document order.
    assert(Pdf.docInfo(mutated("/W [1 3 1]", "/W [1 3  ]"))
      .get("Title") === "real title 1")
    // A DECOY XRef-shaped dict appended late (unreachable from the
    // startxref chain) must not supply /Info — only the parsed chain's
    // newest section does (review r13).
    val decoyed = bytes ++
      b("99 0 obj << /Type /XRef /Info 6 0 R >> endobj\n")
    assert(Pdf.docInfo(decoyed).get("Title") === "real title 1")

    // HYBRID-REFERENCE (§7.5.8.4, advice r13): startxref lands on a
    // CLASSIC ASCII table whose trailer carries the authoritative
    // /XRefStm pointer — 1.5-era writers' back-compat shape. The walk
    // must continue at the stream (liveness + /Info), not silently
    // fall back to document order.
    val full = new String(bytes, "ISO-8859-1")
    val sxAt = full.lastIndexOf("startxref\n")
    val streamOff = full.substring(sxAt + 10).trim.split("\n")(0)
    val head = bytes.take(sxAt)
    def tail(trailerDict: String): Array[Byte] = b(
      s"xref\n0 1\n0000000000 65535 f \ntrailer\n$trailerDict\n" +
        s"startxref\n${head.length}\n%%EOF\n")
    val hybrid = head ++
      tail(s"<< /Size 9 /Root 9 0 R /XRefStm $streamOff >>")
    val hd = Pdf.extract(hybrid).get
    assert(hd.text === "xref alpha")
    assert(hd.pages === 1)
    assert((hd.xrefSections, hd.xrefFailed) === ((1, 0)))
    assert(Pdf.docInfo(hybrid).get("Title") === "real title 1")
    // Control: the SAME classic tail WITHOUT /XRefStm is a legitimate
    // pre-1.5 stop — document order, decoys and all — proving the
    // /XRefStm hop above is what picked the correct revisions.
    val classic = Pdf.extract(
      head ++ tail("<< /Size 9 /Root 9 0 R >>")).get
    assert(classic.text === "wrong 1\nwrong 1")
    assert((classic.xrefSections, classic.xrefFailed) === ((0, 0)))
    // review r14: the trailer hop follows the section GRAMMAR, never a
    // windowed text search — a table whose own trailer is absent
    // (truncated write) must stop classic even when an OLDER revision's
    // `trailer` carrying an /XRefStm sits within scan distance; a text
    // search would latch onto it and follow the wrong chain.
    val decoyTrailer = head ++ b(
      "xref\n0 1\n0000000000 65535 f \n%%EOF\nleftover bytes\n" +
        s"trailer\n<< /Size 9 /Root 9 0 R /XRefStm $streamOff >>\n" +
        s"startxref\n${head.length}\n%%EOF\n")
    val dt = Pdf.extract(decoyTrailer).get
    assert(dt.text === "wrong 1\nwrong 1")
    assert((dt.xrefSections, dt.xrefFailed) === ((0, 0)))

    // The predictor family itself: identity, TIFF-2, PNG Sub/Up/Paeth.
    assert(Pdf.unpredict(Array[Byte](1, 2, 3), 1, 2).toSeq === Seq(1, 2, 3))
    assert(Pdf.unpredict(Array[Byte](10, 5, 3, 1), 2, 2).toSeq ===
      Seq(10, 15, 3, 4))
    assert(Pdf.unpredict(Array[Byte](1, 10, 5), 12, 2).toSeq ===
      Seq(10, 15)) // Sub row
    assert(Pdf.unpredict(
      Array[Byte](0, 10, 20, 2, 5, 5), 12, 2).toSeq ===
      Seq(10, 20, 15, 25)) // None then Up
    assert(Pdf.unpredict(
      Array[Byte](0, 10, 20, 4, 1, 2), 12, 2).toSeq ===
      Seq(10, 20, 11, 22)) // Paeth row over (left, up, ul)
    assert(Pdf.unpredict(Array[Byte](9, 1, 2), 12, 2) === null) // bad filter
    assert(Pdf.unpredict(Array[Byte](0, 1), 12, 2) === null) // ragged rows
  }

  test("incremental updates: same-numbered objects extract once, last wins") {
    // The page appears twice (original + appended update pointing at a
    // DIFFERENT content stream): one page, the UPDATED text only.
    val pdf = b("%PDF-1.4\n" +
      "3 0 obj << /Type /Page /Contents 4 0 R >> endobj\n" +
      "4 0 obj << /Length 19 >> stream\nBT (stale text) Tj ET\nendstream endobj\n" +
      "5 0 obj << /Length 21 >> stream\nBT (current text) Tj ET\nendstream endobj\n" +
      "3 0 obj << /Type /Page /Contents 5 0 R >> endobj\n%%EOF\n")
    val d = Pdf.extract(pdf).get
    assert(d.pages === 1)
    assert(d.text === "current text")
    // TAB is legal PDF whitespace in the 'N G obj' header.
    val tabbed = b("%PDF-1.4\n3 0\tobj << /Type /Page /Contents 4 0 R >> " +
      "endobj\n4 0 obj << /Length 15 >> stream\nBT (tabbed) Tj ET\nendstream endobj\n")
    assert(Pdf.extract(tabbed).get.text === "tabbed")
  }

  test("pdfDate: spec forms, defaults, offsets, garbage") {
    assert(Pdf.pdfDate("D:20240102150405Z") === "2024-01-02T15:04:05Z")
    assert(Pdf.pdfDate("D:20240102150405+05'30'") ===
      "2024-01-02T15:04:05+05:30")
    assert(Pdf.pdfDate("D:20240102150405-08'00'") ===
      "2024-01-02T15:04:05-08:00")
    // Missing trailing fields default per spec.
    assert(Pdf.pdfDate("D:2024") === "2024-01-01T00:00:00")
    assert(Pdf.pdfDate("D:202403") === "2024-03-01T00:00:00")
    assert(Pdf.pdfDate("20240102") === "2024-01-02T00:00:00") // D: optional
    assert(Pdf.pdfDate("not a date") === null)
    assert(Pdf.pdfDate(null) === null)
  }

  test("docInfo: trailer /Info resolution, UTF-16BE titles, fallback") {
    val pdf = PdfPack.pdfFile(6L, "body text", compress = false,
      hexFirst = false, withInfo = true)
    val info = Pdf.docInfo(pdf).get
    assert(info("Title") === "Tïtle 6") // UTF-16BE-BOM hex string
    assert(info("Author") === "Author 6")
    assert(Pdf.pdfDate(info("CreationDate")) === "2024-01-07T06:07:08Z")
    // No trailer: the keyed-object fallback still finds the dict.
    val noTrailer = b("%PDF-1.4\n" +
      "1 0 obj << /Title (Orphan) /CreationDate (D:2023) >> endobj\n")
    assert(Pdf.docInfo(noTrailer).get("Title") === "Orphan")
    assert(Pdf.docInfo(b("%PDF-1.4\nno info here")) === None)
  }

  test("hostile bytes never throw; non-PDF returns None") {
    assert(Pdf.extract(null).isEmpty)
    assert(Pdf.extract("not a pdf at all, no objects".getBytes).isEmpty)
    val rnd = new scala.util.Random(23)
    for (_ <- 1 to 300) {
      val cs = Array.fill(rnd.nextInt(400))(
        "0123 objendstrm<>()[]/\\%BTjQq".charAt(rnd.nextInt(29)).toByte)
      Pdf.extract(cs) // must not throw
    }
    // Truncated mid-stream: no endstream delimiter -> stream dropped,
    // no throw, structure still reported.
    val trunc = b("%PDF-1.4\n3 0 obj << /Type /Page /Contents 4 0 R >> " +
      "endobj\n4 0 obj << /Length 99 >> stream\nBT (cut")
    val d = Pdf.extract(trunc).get
    assert(d.pages === 1)
    assert(d.streams === 0)
  }
}
