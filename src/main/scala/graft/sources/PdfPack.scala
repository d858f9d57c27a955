package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryPack

/** PDF extraction coverage: each document becomes a GENUINE small PDF
  * (header, catalog/pages/page/font objects, a content stream carrying
  * the text through Tj/TJ operators, xref + trailer) — half of them
  * with the content stream genuinely FlateDecode-compressed, a third
  * carrying the first line as a hex string — and [[Pdf.extractText]]
  * must recover the exact text, page/object/stream counts included.
  * DuckDB re-derives everything from the raw text with no PDF anywhere.
  * The torture edges (escapes, octal, nesting, lying /Length, broken
  * xref, unsupported filters, fuzz) are spec-pinned in `PdfSpec`. */
object PdfPack extends QueryPack {

  /** Escape a string for a PDF literal `(…)`: the three specials plus
    * CR (an UNESCAPED EOL inside a literal records as LF per
    * §7.3.4.2 — escaping preserves it exactly). */
  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
      .replace("\r", "\\r")

  private def hexStr(s: String): String =
    "<" + s.map(c => f"${c.toInt}%02X").mkString + ">"

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def utf16Hex(s: String): String =
    "<FEFF" + s.map(c => f"${c.toInt}%04X").mkString + ">"

  /** The shared content-stream construction (q_pdf_text's contract). */
  private def contentFor(id: Long, text: String,
                         hexFirst: Boolean): Array[Byte] = {
    val half = text.length / 2
    val l1 =
      if (hexFirst) hexStr(s"d$id says:") else "(" + esc(s"d$id says:") + ")"
    ("BT /F1 12 Tf 72 720 Td " + l1 + " Tj " +
      "0 -14 Td (" + esc(text.substring(0, half)) + ") Tj " +
      "0 -14 Td (" + esc(text.substring(half)) + ") Tj ET\n" +
      "BT [(kern) -200 (gap) -10 (x)] TJ " +
      "0 -14 Td (esc \\(x\\) \\\\ done) Tj ET").getBytes("ISO-8859-1")
  }

  /** A complete, genuinely-structured one-page PDF around `text`. */
  private[graft] def pdfFile(id: Long, text: String,
                               compress: Boolean, hexFirst: Boolean,
                               withInfo: Boolean = false): Array[Byte] = {
    val content = contentFor(id, text, hexFirst)
    val stream = if (compress) deflate(content) else content
    val filter = if (compress) " /Filter /FlateDecode" else ""
    val sb = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = sb.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    w("3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
      "/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >> endobj\n")
    w(s"4 0 obj << /Length ${stream.length}$filter >> stream\n")
    sb.write(stream)
    w("\nendstream endobj\n")
    w("5 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica " +
      "/Encoding /WinAnsiEncoding >> endobj\n")
    if (withInfo) {
      // UTF-16BE-with-BOM title for every third doc (the common /Info
      // encoding), PDFDoc literal otherwise; date in both offset forms.
      val title =
        if (id % 3 == 0) utf16Hex(s"Tïtle $id")
        else "(" + esc(s"Title $id") + ")"
      val day = f"${id % 28 + 1}%02d"
      val date =
        if (id % 2 == 0) s"D:202401${day}060708Z"
        else s"D:202401${day}060708+05'30'"
      w(s"6 0 obj << /Title $title /Author (Author $id) " +
        s"/Producer (graft) /CreationDate ($date) >> endobj\n")
      w("trailer << /Root 1 0 R /Info 6 0 R /Size 7 >>\n%%EOF\n")
    } else
      w("trailer << /Root 1 0 R /Size 6 >>\n%%EOF\n")
    sb.toByteArray
  }

  /** A MODERN-layout PDF: the page dict lives inside a compressed
    * object stream (`/Type /ObjStm` — the PDF 1.5+ shape most writers
    * emit), only catalog/pages/ObjStm/content-stream objects are
    * visible to the linear scan. A reader without ObjStm expansion
    * extracts zero pages from this file. */
  private[graft] def pdfObjStmFile(id: Long, text: String): Array[Byte] = {
    val content = contentFor(id, text, hexFirst = false)
    val pageDict = "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"
    val header = "3 0\n"
    val stmBody = (header + pageDict).getBytes("ISO-8859-1")
    val stm = deflate(stmBody)
    val sb = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = sb.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.5\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    w(s"6 0 obj << /Type /ObjStm /N 1 /First ${header.length} " +
      s"/Length ${stm.length} /Filter /FlateDecode >> stream\n")
    sb.write(stm)
    w("\nendstream endobj\n")
    w(s"4 0 obj << /Length ${content.length} >> stream\n")
    sb.write(content)
    w("\nendstream endobj\n")
    w("trailer << /Root 1 0 R /Size 7 >>\n%%EOF\n")
    sb.toByteArray
  }

  /** A /ToUnicode CMap covering the §9.10.3 forms: a 2-byte codespace,
    * bfchar entries (one with a MULTI-UNIT destination — the ligature
    * shape), an incrementing bfrange into Greek, a second into
    * Arabic-Indic digits, and the ARRAY-form bfrange. */
  private def cmapSource: String =
    """/CIDInit /ProcSet findresource begin
      |12 dict begin
      |begincmap
      |/CMapName /graft-ToUnicode def
      |1 begincodespacerange
      |<0000> <FFFF>
      |endcodespacerange
      |2 beginbfchar
      |<0020> <0020>
      |<0077> <00660069>
      |endbfchar
      |3 beginbfrange
      |<0041> <005A> <0391>
      |<0030> <0039> <0660>
      |<0061> <0063> [<03B1> <03B2> <03B3>]
      |endbfrange
      |endcmap
      |CMapName currentdict /CMap defineresource pop
      |end end""".stripMargin

  /** A PDF whose page text flows through an EMBEDDED-font /ToUnicode
    * CMap (2-byte codes — the subset-embedded shape modern writers
    * emit): line 1 maps A/digits/Z through the Greek and Arabic-Indic
    * bfranges, line 2 the array-form bfrange, line 3 a multi-unit
    * ligature destination + an in-codespace-but-unmapped code (must
    * surface as U+FFFD, never silently dropped), line 4 switches to a
    * CMap-less font — WinAnsi fallback mid-page. Every fifth doc adds
    * a font whose DECLARED /ToUnicode stream is garbage: its line must
    * fall back to WinAnsi and count in `pdf_fonts_cmap_failed`. The
    * CMap stream itself is Flate-compressed for odd ids. */
  private[graft] def pdfCmapFile(id: Long, text: String): Array[Byte] = {
    def hex2(s: String): String =
      "<" + s.map(c => f"${c.toInt}%04X").mkString + ">"
    val withBad = id % 5 == 0
    val content =
      ("BT /F1 12 Tf 72 720 Td " + hex2("A" + id.toString + "Z") + " Tj " +
        "0 -14 Td " + hex2("abc") + " Tj " +
        "0 -14 Td <00770020 1234> Tj ET\n" +
        "BT /F2 12 Tf 0 -14 Td (w:" + esc(text) + ") Tj ET" +
        (if (withBad) s"\nBT /F3 12 Tf 0 -14 Td (win $id) Tj ET" else ""))
        .getBytes("ISO-8859-1")
    val cmapRaw = cmapSource.getBytes("ISO-8859-1")
    val cmap = if (id % 2 == 1) deflate(cmapRaw) else cmapRaw
    val cmapFilter = if (id % 2 == 1) " /Filter /FlateDecode" else ""
    val sb = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = sb.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    w("3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
      "/Resources << /Font << /F1 5 0 R /F2 7 0 R" +
      (if (withBad) " /F3 8 0 R" else "") +
      " >> >> /Contents 4 0 R >> endobj\n")
    w(s"4 0 obj << /Length ${content.length} >> stream\n")
    sb.write(content)
    w("\nendstream endobj\n")
    w("5 0 obj << /Type /Font /Subtype /Type0 /BaseFont /Graft-Embedded " +
      "/ToUnicode 6 0 R >> endobj\n")
    w(s"6 0 obj << /Length ${cmap.length}$cmapFilter >> stream\n")
    sb.write(cmap)
    w("\nendstream endobj\n")
    w("7 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica " +
      "/Encoding /WinAnsiEncoding >> endobj\n")
    if (withBad) {
      w("8 0 obj << /Type /Font /Subtype /Type0 /BaseFont /Graft-Bad " +
        "/ToUnicode 9 0 R >> endobj\n")
      w("9 0 obj << /Length 4 >> stream\n")
      sb.write(Array[Byte](0x00, 0x1f, 0x7f.toByte, 0x00))
      w("\nendstream endobj\n")
      w("trailer << /Root 1 0 R /Size 10 >>\n%%EOF\n")
    } else
      w("trailer << /Root 1 0 R /Size 8 >>\n%%EOF\n")
    sb.toByteArray
  }

  /** A PDF whose CORRECT reading exists only through its cross-
    * reference STREAM (r12 verdict #5). Document order lies three ways:
    *
    *  - the live page dict (obj 3) has TWO ObjStm-contained copies —
    *    the real one (→ /Contents 4) in ObjStm 2, a decoy (→ /Contents
    *    6, "wrong …") in the LATER ObjStm 7 that last-wins would pick;
    *    the xref's TYPE-2 entry (stm 2, index 0) designates the real
    *    copy;
    *  - the live content (obj 4, "xref …") is SHADOWED by a later
    *    direct revision ("shadow …"); the TYPE-1 entry's byte offset
    *    designates the earlier real one;
    *  - a second page dict (obj 5 → the wrong contents) sits in the
    *    file but its number is marked FREE (type 0) — document order
    *    would count a second page and extract the wrong text.
    *
    * The xref stream itself is FlateDecode + PNG Up predictor
    * (/DecodeParms /Predictor 12 — what real writers emit), W [1 3 1].
    * Every third doc builds WITHOUT the xref machinery or decoys (a
    * clean pre-1.5 shape) pinning the fallback: same text, zero
    * sections. */
  private[graft] def pdfXrefFile(id: Long, text: String): Array[Byte] = {
    val content = s"BT (xref ${esc(text)}) Tj ET".getBytes("ISO-8859-1")
    val sb = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = sb.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.5\n")
    if (id % 3 == 0) {
      // The no-xref variant: one ObjStm page + the content, nothing to
      // disambiguate — document-order liveness must read it perfectly.
      val hdr = "3 0\n"
      val body = (hdr + "<< /Type /Page /Contents 4 0 R >>")
        .getBytes("ISO-8859-1")
      val stm = deflate(body)
      w(s"4 0 obj << /Length ${content.length} >> stream\n")
      sb.write(content)
      w("\nendstream endobj\n")
      w(s"2 0 obj << /Type /ObjStm /N 1 /First ${hdr.length} " +
        s"/Length ${stm.length} /Filter /FlateDecode >> stream\n")
      sb.write(stm)
      w("\nendstream endobj\n")
      w("trailer << /Root 1 0 R /Size 5 >>\n%%EOF\n")
      return sb.toByteArray
    }
    val offReal4 = sb.size()
    w(s"4 0 obj << /Length ${content.length} >> stream\n")
    sb.write(content)
    w("\nendstream endobj\n")
    val hdr2 = "3 0\n"
    val body2 = (hdr2 + "<< /Type /Page /Contents 4 0 R >>")
      .getBytes("ISO-8859-1")
    val stm2 = deflate(body2)
    val offStm2 = sb.size()
    w(s"2 0 obj << /Type /ObjStm /N 1 /First ${hdr2.length} " +
      s"/Length ${stm2.length} /Filter /FlateDecode >> stream\n")
    sb.write(stm2)
    w("\nendstream endobj\n")
    val body7 = (hdr2 + "<< /Type /Page /Contents 6 0 R >>")
      .getBytes("ISO-8859-1")
    val stm7 = deflate(body7)
    val offStm7 = sb.size()
    w(s"7 0 obj << /Type /ObjStm /N 1 /First ${hdr2.length} " +
      s"/Length ${stm7.length} /Filter /FlateDecode >> stream\n")
    sb.write(stm7)
    w("\nendstream endobj\n")
    val shadow = s"BT (shadow $id) Tj ET"
    w(s"4 0 obj << /Length ${shadow.length} >> stream\n$shadow" +
      "\nendstream endobj\n")
    val wrong = s"BT (wrong $id) Tj ET"
    val offObj6 = sb.size()
    w(s"6 0 obj << /Length ${wrong.length} >> stream\n$wrong" +
      "\nendstream endobj\n")
    w("5 0 obj << /Type /Page /Contents 6 0 R >> endobj\n")
    // /Info: the REAL revision first, a later decoy shadowing it —
    // metadata follows the same xref liveness as text (and the /Info
    // REFERENCE itself lives in the XRef dict: 1.5+ files have no
    // `trailer` keyword).
    val offInfo = sb.size()
    w(s"8 0 obj << /Title (real title $id) >> endobj\n")
    w(s"8 0 obj << /Title (shadow title $id) >> endobj\n")
    val offX1 = sb.size()
    // W [1 3 1] → 5-byte rows; PNG Up predictor (filter byte 2), the
    // shape real writers emit.
    def row(t: Int, f2: Long, f3: Int): Array[Byte] = Array(
      t.toByte, ((f2 >> 16) & 0xff).toByte, ((f2 >> 8) & 0xff).toByte,
      (f2 & 0xff).toByte, f3.toByte)
    val rows = Array(
      row(0, 0L, 0), row(1, offX1.toLong, 0), row(1, offStm2.toLong, 0),
      row(2, 2L, 0), row(1, offReal4.toLong, 0), row(0, 0L, 0),
      row(1, offObj6.toLong, 0), row(1, offStm7.toLong, 0),
      row(1, offInfo.toLong, 0))
    val filtered = new java.io.ByteArrayOutputStream()
    var prev = new Array[Byte](5)
    for (r <- rows) {
      filtered.write(2) // PNG Up
      for (c <- 0 until 5)
        filtered.write((r(c) - prev(c)) & 0xff)
      prev = r
    }
    val xstm = deflate(filtered.toByteArray)
    w(s"1 0 obj << /Type /XRef /Size 9 /W [1 3 1] /Index [0 9] " +
      s"/Root 9 0 R /Info 8 0 R /Filter /FlateDecode " +
      s"/DecodeParms << /Predictor 12 /Columns 5 >> " +
      s"/Length ${xstm.length} >> stream\n")
    sb.write(xstm)
    w("\nendstream endobj\n")
    w(s"startxref\n$offX1\n%%EOF\n")
    sb.toByteArray
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map(
      // Embedded-font /ToUnicode text (r12): the CMap decode path end
      // to end — Greek/Arabic-Indic bfranges, array form, multi-unit
      // ligature, U+FFFD for unmapped, WinAnsi fallback on Tf switch,
      // and the failed-CMap counter. DuckDB re-derives the non-Latin
      // text from the construction with chr()/translate arithmetic.
      "q_pdf_cmap" -> { (s, dir) =>
        import s.implicits._
        val pdfs = table(s, dir, "documents")
          .filter(col("text").isNotNull)
          .select(col("doc_id"), col("text")).transform(graft.Tables.spread).as[(Long, String)]
          .map { case (id, text) => (id, pdfCmapFile(id, text)) }
          .toDF("doc_id", "bytes")
        Pdf.extractText(pdfs)
          .select(col("doc_id"), col("pdf_pages"), col("pdf_fonts_cmap"),
            col("pdf_fonts_cmap_failed"), col("pdf_text"))
      },
      // Cross-reference-STREAM liveness (r12 verdict #5): the fixture's
      // correct reading exists only through the xref — a type-2 entry
      // picks the real page among two ObjStm copies, a type-1 offset
      // picks the unshadowed content revision, a type-0 free mark drops
      // a decoy page — and document order gets every one of those
      // wrong. The no-xref variant (every third doc) pins the fallback.
      "q_pdf_xref" -> { (s, dir) =>
        import s.implicits._
        val pdfs = table(s, dir, "documents")
          .filter(col("text").isNotNull)
          .select(col("doc_id"), col("text")).transform(graft.Tables.spread).as[(Long, String)]
          .map { case (id, text) => (id, pdfXrefFile(id, text)) }
          .toDF("doc_id", "bytes")
        Pdf.extractText(pdfs)
          .select(col("doc_id"), col("pdf_pages"), col("pdf_objects"),
            col("pdf_text"), col("pdf_xref_sections"),
            col("pdf_xref_failed"))
      },
      "q_pdf_text" -> { (s, dir) =>
        import s.implicits._
        val pdfs = table(s, dir, "documents")
          .filter(col("text").isNotNull)
          .select(col("doc_id"), col("text")).transform(graft.Tables.spread).as[(Long, String)]
          .map { case (id, text) =>
            (id, pdfFile(id, text, compress = id % 2 == 1,
              hexFirst = id % 3 == 0))
          }.toDF("doc_id", "bytes")
        Pdf.extractText(pdfs)
          .select(col("doc_id"), col("pdf_pages"), col("pdf_objects"),
            col("pdf_streams"), col("pdf_streams_decoded"), col("pdf_text"))
      },
      // Document-information dictionary via the trailer's /Info ref:
      // UTF-16BE-BOM titles every third doc, PDF date strings in both
      // the Z and +HH'mm' offset forms parsed to ISO-8601.
      "q_pdf_meta" -> { (s, dir) =>
        import s.implicits._
        val pdfs = table(s, dir, "documents")
          .filter(col("text").isNotNull)
          .select(col("doc_id"), col("text")).transform(graft.Tables.spread).as[(Long, String)]
          .map { case (id, text) =>
            (id, pdfFile(id, text, compress = id % 2 == 1,
              hexFirst = false, withInfo = true))
          }.toDF("doc_id", "bytes")
        Pdf.withInfo(pdfs)
          .select(col("doc_id"), col("pdf_title"), col("pdf_author"),
            col("pdf_created"))
      },
      // Object-stream layout (r11): the page dict hidden inside a
      // compressed /ObjStm — the modern-writer shape. Same text
      // contract as q_pdf_text's literal variant; the page is only
      // findable via ObjStm expansion (4 linear objects + 1 contained).
      "q_pdf_objstm" -> { (s, dir) =>
        import s.implicits._
        val pdfs = table(s, dir, "documents")
          .filter(col("text").isNotNull)
          .select(col("doc_id"), col("text")).transform(graft.Tables.spread).as[(Long, String)]
          .map { case (id, text) => (id, pdfObjStmFile(id, text)) }
          .toDF("doc_id", "bytes")
        Pdf.extractText(pdfs)
          .select(col("doc_id"), col("pdf_pages"), col("pdf_objects"),
            col("pdf_streams"), col("pdf_streams_decoded"), col("pdf_text"))
      }
    )

  /** The content construction round-trips by design: line 1 is the
    * id-tagged header (hex or literal — same decoded text), lines 2-3
    * split the document text at its midpoint, the second text block
    * contributes the TJ kern sentence ('-200 thousandths' crosses the
    * word-gap threshold, '-10' does not) and the escape line. */
  override def oracles: Map[String, String] = Map(
    // Xref liveness closed-form: ONE page (the freed decoy never
    // counts), the UNSHADOWED content revision's text, 11 discovered
    // objects (9 direct — incl. both /Info revisions — + 2
    // ObjStm-contained copies of the page) on xref docs vs 3 on the
    // no-xref variant, exactly one parsed section and zero failures.
    "q_pdf_xref" ->
      """SELECT doc_id,
        |  CAST(1 AS BIGINT) AS pdf_pages,
        |  CAST(CASE WHEN doc_id % 3 = 0 THEN 3 ELSE 11 END AS BIGINT)
        |    AS pdf_objects,
        |  'xref ' || text AS pdf_text,
        |  CAST(CASE WHEN doc_id % 3 = 0 THEN 0 ELSE 1 END AS BIGINT)
        |    AS pdf_xref_sections,
        |  CAST(0 AS BIGINT) AS pdf_xref_failed
        |FROM documents WHERE text IS NOT NULL""".stripMargin,
    // The CMap construction round-trips closed-form: A→Α (913),
    // digits→Arabic-Indic (1632+d), Z→913+25, abc→αβγ (945..947),
    // <0077>→'fi', <0020>→' ', unmapped <1234>→U+FFFD (65533), then
    // the WinAnsi font's literal, then every fifth doc's failed-CMap
    // fallback line.
    "q_pdf_cmap" ->
      """SELECT doc_id,
        |  CAST(1 AS BIGINT) AS pdf_pages,
        |  CAST(1 AS BIGINT) AS pdf_fonts_cmap,
        |  CAST(CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END AS BIGINT)
        |    AS pdf_fonts_cmap_failed,
        |  chr(913) ||
        |  translate(CAST(doc_id AS VARCHAR), '0123456789',
        |    chr(1632)||chr(1633)||chr(1634)||chr(1635)||chr(1636)||
        |    chr(1637)||chr(1638)||chr(1639)||chr(1640)||chr(1641)) ||
        |  chr(938) || chr(10) ||
        |  chr(945) || chr(946) || chr(947) || chr(10) ||
        |  'fi ' || chr(65533) || chr(10) ||
        |  'w:' || text ||
        |  CASE WHEN doc_id % 5 = 0
        |    THEN chr(10) || 'win ' || CAST(doc_id AS VARCHAR)
        |    ELSE '' END AS pdf_text
        |FROM documents WHERE text IS NOT NULL""".stripMargin,
    "q_pdf_text" ->
      """SELECT doc_id,
        |  CAST(1 AS BIGINT) AS pdf_pages,
        |  CAST(5 AS BIGINT) AS pdf_objects,
        |  CAST(1 AS BIGINT) AS pdf_streams,
        |  CAST(1 AS BIGINT) AS pdf_streams_decoded,
        |  'd' || CAST(doc_id AS VARCHAR) || ' says:' || chr(10) ||
        |  left(text, length(text) // 2) || chr(10) ||
        |  substring(text, length(text) // 2 + 1) || chr(10) ||
        |  'kern gapx' || chr(10) || 'esc (x) \ done' AS pdf_text
        |FROM documents WHERE text IS NOT NULL""".stripMargin,
    "q_pdf_objstm" ->
      """SELECT doc_id,
        |  CAST(1 AS BIGINT) AS pdf_pages,
        |  CAST(5 AS BIGINT) AS pdf_objects,
        |  CAST(1 AS BIGINT) AS pdf_streams,
        |  CAST(1 AS BIGINT) AS pdf_streams_decoded,
        |  'd' || CAST(doc_id AS VARCHAR) || ' says:' || chr(10) ||
        |  left(text, length(text) // 2) || chr(10) ||
        |  substring(text, length(text) // 2 + 1) || chr(10) ||
        |  'kern gapx' || chr(10) || 'esc (x) \ done' AS pdf_text
        |FROM documents WHERE text IS NOT NULL""".stripMargin,
    "q_pdf_meta" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0
        |    THEN 'T' || chr(239) || 'tle ' || CAST(doc_id AS VARCHAR)
        |    ELSE 'Title ' || CAST(doc_id AS VARCHAR) END AS pdf_title,
        |  'Author ' || CAST(doc_id AS VARCHAR) AS pdf_author,
        |  '2024-01-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') ||
        |  'T06:07:08' ||
        |  CASE WHEN doc_id % 2 = 0 THEN 'Z' ELSE '+05:30' END
        |    AS pdf_created
        |FROM documents WHERE text IS NOT NULL""".stripMargin
  )
}
