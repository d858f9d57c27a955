package graft.sources

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** PDF text extraction — after HTML, the second-largest text source a
  * web corpus ingests (every academic/government/report crawl is PDF-
  * heavy), as pure byte arithmetic over opaque binary columns: no
  * parser library exists in the sandbox and none is used.
  *
  * Scope is the honest, deterministic core of the format (ISO 32000):
  *
  *   - Objects are found by a LINEAR `N G obj … endobj` scan rather
  *     than the xref table — deliberately: real-world crawled PDFs have
  *     broken/linearized/incremental xrefs so often that every serious
  *     reader ships exactly this scan as its repair path; running it
  *     unconditionally gives one code path for intact and damaged
  *     files, and never trusts declared offsets into untrusted bytes.
  *   - COS syntax: dictionaries, arrays, names, numbers, booleans,
  *     literal `(…)` strings (nesting + all §7.3.4.2 escapes + octal)
  *     and hex `<…>` strings, indirect references, streams (length by
  *     the `endstream` delimiter, not the /Length entry — /Length is
  *     frequently an indirect ref or a lie in crawled files).
  *   - /FlateDecode content streams inflate via `java.util.zip`
  *     (zlib-wrapped or raw, auto-detected) under the same output cap
  *     discipline as [[Warc.gunzip]]; other filters (DCT, LZW, …)
  *     leave the stream undecodable and COUNTED, never a throw.
  *   - Text comes from BT…ET blocks: `Tj`/`'`/`"` emit their string,
  *     `TJ` emits its array's strings with the standard kern-to-space
  *     rule (a negative adjustment ≤ −180 thousandths of an em is a
  *     word gap), `Td`/`TD`/`T*`/`'`/`"` start a new line. `Tf` tracks
  *     the live font: strings of a font carrying a parseable
  *     /ToUnicode CMap (r12 — bfchar + bfrange, 1–4-byte codes,
  *     codespace ranges; the shape every subset-embedding writer
  *     emits) decode through it — the non-Latin / embedded-font path;
  *     all other strings decode as PDFDocEncoding/WinAnsi (≈ cp1252
  *     for the printable range), the encoding of unembedded Latin
  *     text. A font whose DECLARED /ToUnicode is missing/undecodable/
  *     unparseable falls back to WinAnsi and is COUNTED
  *     (`fontsCmapFailed`), never a throw and never silent mojibake.
  *
  * Scale: one narrow per-partition byte pass per document, no shuffle,
  * same caps-and-coded-failure discipline as the WARC/HTML/media
  * decoders. */
object Pdf {

  /** One extracted document: page count (objects with `/Type /Page`),
    * object count, decoded-stream ratio, the text of every content
    * stream in object order, and the font-CMap coverage counters —
    * `fontsCmap` fonts decoded show strings through a parsed
    * /ToUnicode CMap, `fontsCmapFailed` fonts DECLARED a /ToUnicode
    * whose stream was missing/undecodable/unparseable (those fall back
    * to WinAnsi and are counted, never thrown — the text_coverage
    * honesty rule applied to fonts). */
  final case class PdfDoc(pages: Int, objects: Int,
                          streams: Int, streamsDecoded: Int,
                          text: String,
                          fontsCmap: Int = 0, fontsCmapFailed: Int = 0,
                          /** Cross-reference-STREAM sections parsed /
                            * declared-but-unusable (truncated W, bad
                            * filter, lying offset) — when ≥ 1 section
                            * parses, object liveness follows the xref
                            * (r12 verdict #5) instead of document
                            * order. */
                          xrefSections: Int = 0, xrefFailed: Int = 0)

  // ---------------------------------------------------------------
  // COS object model (only what extraction needs).
  private sealed trait Cos
  private case class CNum(v: Double) extends Cos
  private case class CName(v: String) extends Cos
  private case class CStr(bytes: Array[Byte]) extends Cos
  private case class CArr(items: Vector[Cos]) extends Cos
  private case class CDict(m: Map[String, Cos]) extends Cos
  private case class CRef(num: Int) extends Cos
  private case object CNull extends Cos

  private final class P(val b: Array[Byte]) {
    var i = 0
    def n: Int = b.length
    @inline def peek: Int = if (i < n) b(i) & 0xff else -1
    @inline def ws(c: Int): Boolean =
      c == ' ' || c == '\r' || c == '\n' || c == '\t' || c == 0 || c == 0x0c
    def skipWs(): Unit = {
      var go = true
      while (go) {
        while (i < n && ws(peek)) i += 1
        if (peek == '%') { // comment to EOL
          while (i < n && peek != '\r' && peek != '\n') i += 1
        } else go = false
      }
    }
    def matches(s: String): Boolean =
      i + s.length <= n && {
        var k = 0
        while (k < s.length && (b(i + k) & 0xff) == s.charAt(k)) k += 1
        k == s.length
      }
  }

  /** Parse one COS object at the cursor. Depth-capped; never throws on
    * hostile bytes (returns CNull and advances at least one byte). */
  private def parseObj(p: P, depth: Int): Cos = {
    if (depth > 32) { p.i += 1; return CNull }
    p.skipWs()
    val c = p.peek
    if (c < 0) CNull
    else if (c == '<' && p.i + 1 < p.n && (p.b(p.i + 1) & 0xff) == '<') {
      p.i += 2
      var m = Map.empty[String, Cos]
      var go = true
      while (go) {
        p.skipWs()
        if (p.peek < 0) go = false
        else if (p.matches(">>")) { p.i += 2; go = false }
        else if (p.peek == '/') {
          val k = parseName(p)
          val v = parseObj(p, depth + 1)
          m = m.updated(k, v)
        } else { p.i += 1 } // junk key: skip a byte, stay lenient
      }
      CDict(m)
    } else if (c == '<') { // hex string
      p.i += 1
      val out = new java.io.ByteArrayOutputStream()
      var hi = -1
      var go = true
      while (go && p.i < p.n) {
        val h = p.b(p.i) & 0xff
        p.i += 1
        if (h == '>') go = false
        else {
          val v = Character.digit(h, 16)
          if (v >= 0) {
            if (hi < 0) hi = v
            else { out.write((hi << 4) | v); hi = -1 }
          }
        }
      }
      if (hi >= 0) out.write(hi << 4) // odd count: trailing zero nibble
      CStr(out.toByteArray)
    } else if (c == '(') { // literal string, nesting + escapes
      p.i += 1
      val out = new java.io.ByteArrayOutputStream()
      var nest = 1
      while (nest > 0 && p.i < p.n) {
        val h = p.b(p.i) & 0xff
        p.i += 1
        if (h == '\\' && p.i < p.n) {
          val e = p.b(p.i) & 0xff
          p.i += 1
          e match {
            case 'n' => out.write('\n')
            case 'r' => out.write('\r')
            case 't' => out.write('\t')
            case 'b' => out.write('\b')
            case 'f' => out.write('\f')
            case '(' => out.write('(')
            case ')' => out.write(')')
            case '\\' => out.write('\\')
            case '\r' => // line continuation: \CRLF or \CR swallowed
              if (p.peek == '\n') p.i += 1
            case '\n' => // line continuation
            case d if d >= '0' && d <= '7' => // 1-3 octal digits
              var v = d - '0'
              var k = 0
              while (k < 2 && p.i < p.n && {
                val o = p.b(p.i) & 0xff; o >= '0' && o <= '7'
              }) { v = (v << 3) | ((p.b(p.i) & 0xff) - '0'); p.i += 1; k += 1 }
              out.write(v & 0xff)
            case other => out.write(other) // unknown escape: literal
          }
        } else if (h == '(') { nest += 1; out.write('(') }
        else if (h == ')') { nest -= 1; if (nest > 0) out.write(')') }
        else if (h == '\r') { // §7.3.4.2: unescaped EOL records as 0A
          if (p.peek == '\n') p.i += 1
          out.write('\n')
        } else out.write(h)
      }
      CStr(out.toByteArray)
    } else if (c == '/') CName(parseName(p))
    else if (c == '[') {
      p.i += 1
      val items = Vector.newBuilder[Cos]
      var go = true
      while (go) {
        p.skipWs()
        if (p.peek < 0) go = false
        else if (p.peek == ']') { p.i += 1; go = false }
        else items += parseObj(p, depth + 1)
      }
      CArr(items.result())
    } else if (c == '+' || c == '-' || c == '.' || (c >= '0' && c <= '9')) {
      val start = p.i
      p.i += 1
      while (p.i < p.n && {
        val h = p.b(p.i) & 0xff
        (h >= '0' && h <= '9') || h == '.' || h == '+' || h == '-'
      }) p.i += 1
      val numEnd = p.i
      val s = new String(p.b, start, numEnd - start, "US-ASCII")
      val v = try s.toDouble catch { case _: NumberFormatException => 0.0 }
      // `N G R` indirect reference lookahead (both non-negative ints).
      if (v >= 0 && v == math.floor(v)) {
        val save = p.i
        p.skipWs()
        val gs = p.i
        var gEnd = gs
        while (gEnd < p.n && {
          val h = p.b(gEnd) & 0xff; h >= '0' && h <= '9'
        }) gEnd += 1
        if (gEnd > gs) {
          var j = gEnd
          while (j < p.n && p.ws(p.b(j) & 0xff)) j += 1
          if (j < p.n && (p.b(j) & 0xff) == 'R' &&
            (j + 1 >= p.n || !isRegular(p.b(j + 1) & 0xff))) {
            p.i = j + 1
            return CRef(v.toInt)
          }
        }
        p.i = save
      }
      CNum(v)
    } else if (p.matches("true")) { p.i += 4; CNum(1) }
    else if (p.matches("false")) { p.i += 5; CNum(0) }
    else if (p.matches("null")) { p.i += 4; CNull }
    else { p.i += 1; CNull }
  }

  @inline private def isRegular(c: Int): Boolean =
    !(c == ' ' || c == '\r' || c == '\n' || c == '\t' || c == 0 ||
      c == 0x0c || c == '/' || c == '(' || c == ')' || c == '<' ||
      c == '>' || c == '[' || c == ']' || c == '{' || c == '}' || c == '%')

  private def parseName(p: P): String = {
    p.i += 1 // the '/'
    val sb = new java.lang.StringBuilder
    while (p.i < p.n && isRegular(p.b(p.i) & 0xff)) {
      val c = p.b(p.i) & 0xff
      p.i += 1
      if (c == '#' && p.i + 1 < p.n) { // #hh escape in names
        val h1 = Character.digit(p.b(p.i) & 0xff, 16)
        val h2 = Character.digit(p.b(p.i + 1) & 0xff, 16)
        if (h1 >= 0 && h2 >= 0) { sb.append(((h1 << 4) | h2).toChar); p.i += 2 }
        else sb.append('#')
      } else sb.append(c.toChar)
    }
    sb.toString
  }

  /** One indirect object: number, its parsed value, and — when a
    * stream follows the dict — the stream's raw byte range. `off` is
    * the byte offset of the object HEADER (the object number's first
    * digit — what a type-1 xref entry points at; −1 for
    * ObjStm-contained objects); `srcStm`/`srcIdx` are the containing
    * object stream's number and the object's index within it (what a
    * type-2 entry names; −1/−1 for directly-scanned objects). The
    * provenance exists so XREF-STREAM liveness (r12 verdict #5) can
    * pick the REVISION the cross-reference designates instead of the
    * blind last-in-document-order rule. */
  private final case class IndObj(num: Int, value: Cos,
                                  streamFrom: Int, streamUntil: Int,
                                  off: Int = -1, srcStm: Int = -1,
                                  srcIdx: Int = -1)

  /** Linear `N G obj … endobj` scan (the universal repair path). */
  private def scanObjects(b: Array[Byte]): Vector[IndObj] = {
    val out = Vector.newBuilder[IndObj]
    val n = b.length
    var i = 0
    var count = 0
    while (i + 3 < n && count < 100000) {
      // find "obj" preceded by `N G `
      if ((b(i) & 0xff) == 'o' && (b(i + 1) & 0xff) == 'b' &&
        (b(i + 2) & 0xff) == 'j' &&
        (i + 3 >= n || !isRegular(b(i + 3) & 0xff)) &&
        i > 0 && !isRegular(b(i - 1) & 0xff)) {
        // walk back over `G` and `N`, across any PDF whitespace (the
        // full §7.2.3 set — TAB/FF/NUL are legal token separators).
        @inline def pws(j: Int): Boolean = {
          val c = b(j) & 0xff
          c == ' ' || c == '\r' || c == '\n' || c == '\t' || c == 0 ||
            c == 0x0c
        }
        var j = i - 1
        while (j > 0 && pws(j)) j -= 1
        val gEnd = j + 1
        while (j >= 0 && (b(j) & 0xff) >= '0' && (b(j) & 0xff) <= '9') j -= 1
        val gStart = j + 1
        if (gEnd > gStart) {
          while (j > 0 && pws(j)) j -= 1
          val nEnd = j + 1
          while (j >= 0 && (b(j) & 0xff) >= '0' && (b(j) & 0xff) <= '9') j -= 1
          val nStart = j + 1
          if (nEnd > nStart && nEnd - nStart <= 9) {
            val num = new String(b, nStart, nEnd - nStart, "US-ASCII").toInt
            val p = new P(b)
            p.i = i + 3
            val value = parseObj(p, 0)
            p.skipWs()
            var sFrom = -1
            var sUntil = -1
            if (p.matches("stream")) {
              p.i += 6
              if (p.peek == '\r') p.i += 1
              if (p.peek == '\n') p.i += 1
              sFrom = p.i
              // delimiter-scan for `endstream` (never trust /Length)
              var k = sFrom
              var found = -1
              while (found < 0 && k + 9 <= n) {
                if ((b(k) & 0xff) == 'e' && (b(k + 1) & 0xff) == 'n' &&
                  (b(k + 2) & 0xff) == 'd' && (b(k + 3) & 0xff) == 's' &&
                  (b(k + 4) & 0xff) == 't' && (b(k + 5) & 0xff) == 'r' &&
                  (b(k + 6) & 0xff) == 'e' && (b(k + 7) & 0xff) == 'a' &&
                  (b(k + 8) & 0xff) == 'm') found = k
                else k += 1
              }
              if (found >= 0) {
                // A declared /Length CONSISTENT with the delimiter
                // position wins (a compressed stream may genuinely end
                // in an EOL byte the heuristic would strip); otherwise
                // strip the EOL preceding endstream. Never trust a
                // /Length that disagrees with the delimiter.
                val hint = value match {
                  case CDict(m) => m.get("Length") match {
                    case Some(CNum(v))
                      if v >= 0 && v == math.floor(v) &&
                        sFrom + v.toLong <= found &&
                        found - (sFrom + v.toLong) <= 2 => Some(v.toInt)
                    case _ => None
                  }
                  case _ => None
                }
                sUntil = hint match {
                  case Some(len) => sFrom + len
                  case None =>
                    var u = found
                    if (u > sFrom && (b(u - 1) & 0xff) == '\n') u -= 1
                    if (u > sFrom && (b(u - 1) & 0xff) == '\r') u -= 1
                    u
                }
                p.i = found + 9
              }
            }
            out += IndObj(num, value, sFrom, sUntil, off = nStart)
            count += 1
            i = p.i
          } else i += 1
        } else i += 1
      } else i += 1
    }
    out.result()
  }

  /** Inflate a /FlateDecode stream body: zlib-wrapped or raw deflate,
    * auto-detected, output-capped. */
  private[sources] def flate(b: Array[Byte], from: Int, until: Int,
                             maxOut: Int): Option[Array[Byte]] = {
    if (until <= from) return Some(Array.empty)
    def run(raw: Boolean): Option[Array[Byte]] = {
      val inf = new java.util.zip.Inflater(raw)
      try {
        inf.setInput(b, from, until - from)
        val out = new java.io.ByteArrayOutputStream(
          math.min((until - from).toLong * 4 + 64, maxOut.toLong).toInt)
        val buf = new Array[Byte](8192)
        var total = 0L
        while (!inf.finished()) {
          val got = inf.inflate(buf)
          if (got == 0) {
            if (!inf.finished()) return None
          } else {
            total += got
            if (total > maxOut) return None
            out.write(buf, 0, got)
          }
        }
        Some(out.toByteArray)
      } catch {
        case _: java.util.zip.DataFormatException => None
        case scala.util.control.NonFatal(_) => None
      } finally inf.end()
    }
    run(raw = false).orElse(run(raw = true))
  }

  /** PDFDocEncoding/WinAnsi byte → char: ASCII identity, the cp1252
    * 0x80–0x9F printables, latin-1 above — the encoding of unembedded
    * Latin-text PDFs. Control bytes map to space. */
  private def decodeByte(c: Int): Char = c match {
    case 0x80 => '€'; case 0x82 => '‚'; case 0x83 => 'ƒ'
    case 0x84 => '„'; case 0x85 => '…'; case 0x86 => '†'
    case 0x87 => '‡'; case 0x88 => 'ˆ'; case 0x89 => '‰'
    case 0x8a => 'Š'; case 0x8b => '‹'; case 0x8c => 'Œ'
    case 0x8e => 'Ž'; case 0x91 => '‘'; case 0x92 => '’'
    case 0x93 => '“'; case 0x94 => '”'; case 0x95 => '•'
    case 0x96 => '–'; case 0x97 => '—'; case 0x98 => '˜'
    case 0x99 => '™'; case 0x9a => 'š'; case 0x9b => '›'
    case 0x9c => 'œ'; case 0x9e => 'ž'; case 0x9f => 'Ÿ'
    case c0 if c0 < 0x20 && c0 != '\n' && c0 != '\r' && c0 != '\t' => ' '
    case other => other.toChar
  }

  private def decodeStr(bytes: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(bytes.length)
    var i = 0
    while (i < bytes.length) { sb.append(decodeByte(bytes(i) & 0xff)); i += 1 }
    sb.toString
  }

  // ---------------------------------------------------------------
  // /ToUnicode CMaps (§9.10.3): the map from a font's character CODES
  // to Unicode that subset-embedded fonts carry — without it their
  // show strings are private glyph indices, not text. Parsing is pure
  // byte arithmetic over the CMap's PostScript-ish token stream,
  // reusing the COS value parser (hex strings, numbers, arrays).

  /** A parsed /ToUnicode CMap: codespace ranges (code byte-length, lo,
    * hi) and the (byte-length, code) → Unicode-string mapping. */
  private[sources] final case class CMapData(
      spaces: Vector[(Int, Long, Long)], map: Map[(Int, Long), String]) {

    private val lens: Vector[Int] =
      (spaces.map(_._1) ++ map.keysIterator.map(_._1)).distinct.sorted.toVector

    @inline private def codeAt(b: Array[Byte], i: Int, len: Int): Long = {
      var v = 0L
      var k = 0
      while (k < len) { v = (v << 8) | (b(i + k) & 0xff); k += 1 }
      v
    }

    /** Decode one show string: at each position the code length is the
      * first declared codespace range (shortest first) containing the
      * next bytes — the spec's prefix-match rule reduced to whole-code
      * containment, which is exact for the byte-uniform ranges real
      * /ToUnicode CMaps declare. Codes outside every range consume the
      * shortest declared length; unmapped codes emit U+FFFD (visible-
      * but-marked beats silently dropped — the REPLACE discipline). */
    def decode(bytes: Array[Byte]): String = {
      if (lens.isEmpty) return decodeStr(bytes)
      val sb = new java.lang.StringBuilder(bytes.length)
      var i = 0
      while (i < bytes.length) {
        var len = 0
        var li = 0
        while (len == 0 && li < lens.length) {
          val l = lens(li)
          if (i + l <= bytes.length) {
            val c = codeAt(bytes, i, l)
            if (spaces.exists(s => s._1 == l && c >= s._2 && c <= s._3) ||
              (spaces.isEmpty && map.contains((l, c)))) len = l
          }
          li += 1
        }
        if (len == 0) len = math.min(lens.head, bytes.length - i)
        if (len <= 0) return sb.toString
        map.get((len, codeAt(bytes, i, len))) match {
          case Some(s) => sb.append(s)
          case None => sb.append('�')
        }
        i += len
      }
      sb.toString
    }
  }

  /** A hex-string CMap destination as a Unicode string: even lengths
    * are UTF-16BE code units (the §9.10.3 form), a single byte is its
    * code point; empty/odd-tailed forms keep the whole-unit prefix. */
  private def cmapDst(bytes: Array[Byte]): String =
    if (bytes.length >= 2)
      new String(bytes, 0, bytes.length & ~1,
        java.nio.charset.StandardCharsets.UTF_16BE)
    else if (bytes.length == 1) String.valueOf((bytes(0) & 0xff).toChar)
    else ""

  /** Parse a /ToUnicode CMap stream: `begincodespacerange`,
    * `beginbfchar` (src → dst pairs) and `beginbfrange` (lo hi dst,
    * dst a hex string whose LAST UTF-16 unit increments along the
    * range, or the array form with one dst per code). Later entries
    * OVERWRITE earlier ones (writers emit patch entries last). Bomb
    * caps: codes ≤ 4 bytes, ranges ≤ 65 536 codes, ≤ 100 000 total
    * mappings. None when the bytes yield no mapping at all — a
    * declared-but-useless CMap, counted by the caller. Never throws. */
  private[sources] def parseCMap(b: Array[Byte]): Option[CMapData] = {
    if (b == null || b.isEmpty) return None
    try {
      val p = new P(b)
      val spaces = Vector.newBuilder[(Int, Long, Long)]
      val map = scala.collection.mutable.LinkedHashMap.empty[(Int, Long), String]
      var entries = 0
      val MaxEntries = 100000
      val stack = scala.collection.mutable.ArrayBuffer.empty[Cos]
      @inline def codeOf(s: Array[Byte]): Long = {
        var v = 0L
        var k = 0
        while (k < s.length) { v = (v << 8) | (s(k) & 0xff); k += 1 }
        v
      }
      while (p.i < p.n && entries < MaxEntries) {
        p.skipWs()
        if (p.i < p.n) {
          val c = p.peek
          if (c == '(' || c == '<' || c == '[' || c == '/' ||
            c == '+' || c == '-' || c == '.' || (c >= '0' && c <= '9')) {
            stack += parseObj(p, 0)
          } else {
            val start = p.i
            while (p.i < p.n && isRegular(p.b(p.i) & 0xff)) p.i += 1
            if (p.i == start) p.i += 1
            else new String(p.b, start, p.i - start, "US-ASCII") match {
              case "endcodespacerange" =>
                stack.grouped(2).foreach {
                  case scala.collection.mutable.ArrayBuffer(
                    CStr(lo), CStr(hi))
                    if lo.length == hi.length &&
                      lo.length >= 1 && lo.length <= 4 =>
                    spaces += ((lo.length, codeOf(lo), codeOf(hi)))
                  case _ => ()
                }
                stack.clear()
              case "endbfchar" =>
                stack.grouped(2).foreach {
                  case scala.collection.mutable.ArrayBuffer(
                    CStr(src), CStr(dst))
                    if src.length >= 1 && src.length <= 4 =>
                    map((src.length, codeOf(src))) = cmapDst(dst)
                    entries += 1
                  case _ => ()
                }
                stack.clear()
              case "endbfrange" =>
                stack.grouped(3).foreach {
                  case scala.collection.mutable.ArrayBuffer(
                    CStr(lo), CStr(hi), dst)
                    if lo.length == hi.length &&
                      lo.length >= 1 && lo.length <= 4 &&
                      codeOf(hi) >= codeOf(lo) &&
                      codeOf(hi) - codeOf(lo) <= 65535 =>
                    val l0 = codeOf(lo)
                    val span = (codeOf(hi) - l0).toInt
                    dst match {
                      case CStr(base) if base.nonEmpty =>
                        val s0 = cmapDst(base)
                        var k = 0
                        while (k <= span && entries < MaxEntries) {
                          val s =
                            if (s0.isEmpty) ""
                            else s0.substring(0, s0.length - 1) +
                              (s0.charAt(s0.length - 1) + k).toChar
                          map((lo.length, l0 + k)) = s
                          entries += 1
                          k += 1
                        }
                      case CArr(items) =>
                        var k = 0
                        while (k <= span && k < items.length &&
                          entries < MaxEntries) {
                          items(k) match {
                            case CStr(d) =>
                              map((lo.length, l0 + k)) = cmapDst(d)
                              entries += 1
                            case _ => ()
                          }
                          k += 1
                        }
                      case _ => ()
                    }
                  case _ => ()
                }
                stack.clear()
              case _ =>
                // Any other operator (begin…, def, findresource, CID
                // ranges, usecmap, …) delimits: operands before it are
                // not ours.
                stack.clear()
            }
          }
        }
      }
      val sp = spaces.result()
      if (map.isEmpty) None else Some(CMapData(sp, map.toMap))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Per-page text state threaded through a page's (possibly many)
    * content streams — PDF graphics state persists across the
    * `/Contents` array boundary, so the font selected at the end of
    * stream k is live at the start of stream k+1. */
  private[sources] final class TextState {
    var cmap: Option[CMapData] = None
    var inText: Boolean = false
    var pendingNl: Boolean = false
  }

  /** Extract the text of one decoded content stream: BT…ET blocks,
    * Tj/'/"/TJ emitters, Td/TD/T* line breaks, TJ kern ≤ −180 → space.
    * `Tf` switches the live font: show strings of a font with a parsed
    * /ToUnicode CMap decode through it, all others through WinAnsi.
    * Operand stack discipline: operands push, operators consume. */
  private[sources] def contentText(content: Array[Byte],
                                   out: java.lang.StringBuilder,
                                   fonts: Map[String, CMapData] = Map.empty,
                                   state: TextState = new TextState): Unit = {
    val p = new P(content)
    import state.{inText, pendingNl}
    val stack = scala.collection.mutable.ArrayBuffer.empty[Cos]
    def emit(s: String): Unit = {
      if (pendingNl && out.length > 0) out.append('\n')
      pendingNl = false
      out.append(s)
    }
    def dec(s: Array[Byte]): String = state.cmap match {
      case Some(cm) => cm.decode(s)
      case None => decodeStr(s)
    }
    while (p.i < p.n) {
      p.skipWs()
      if (p.i >= p.n) return
      val c = p.peek
      if (c == '(' || c == '<' || c == '[' || c == '/' ||
        c == '+' || c == '-' || c == '.' || (c >= '0' && c <= '9')) {
        stack += parseObj(p, 0)
      } else {
        // operator token
        val start = p.i
        while (p.i < p.n && isRegular(p.b(p.i) & 0xff)) p.i += 1
        if (p.i == start) p.i += 1
        else {
          val op = new String(p.b, start, p.i - start, "US-ASCII")
          op match {
            case "BT" => inText = true; pendingNl = out.length > 0
            case "ET" => inText = false
            case "Tf" =>
              // /Name size Tf — the font name is the SECOND operand
              // from the top. Fonts without a parsed CMap (no
              // /ToUnicode, or a failed one) reset to WinAnsi.
              if (stack.length >= 2) stack(stack.length - 2) match {
                case CName(n) => state.cmap = fonts.get(n)
                case _ => ()
              }
            case "Tj" if inText =>
              stack.lastOption.collect { case CStr(s) => emit(dec(s)) }
            case "'" if inText =>
              pendingNl = true
              stack.lastOption.collect { case CStr(s) => emit(dec(s)) }
            case "\"" if inText =>
              pendingNl = true
              stack.lastOption.collect { case CStr(s) => emit(dec(s)) }
            case "TJ" if inText =>
              stack.lastOption.collect { case CArr(items) =>
                val sb = new java.lang.StringBuilder
                items.foreach {
                  case CStr(s) => sb.append(dec(s))
                  case CNum(v) if v <= -180 => sb.append(' ')
                  case _ => ()
                }
                emit(sb.toString)
              }
            case "Td" | "TD" | "T*" if inText => pendingNl = true
            case _ => ()
          }
          stack.clear()
        }
      }
    }
  }

  /** Objects stored INSIDE object streams (`/Type /ObjStm`, §7.5.7):
    * since PDF 1.5 most writers pack non-stream objects — page dicts
    * included — into compressed object streams, so a reader with only
    * the linear scan extracts zero pages from a modern PDF. Each
    * ObjStm's body is `N` white-space-separated (objnum, offset) pairs
    * followed, at `/First`, by the serialized objects; contained
    * objects carry no stream of their own (streams cannot nest).
    * Contained objects are appended AFTER the linear ones, so a
    * same-numbered contained object wins the `.last` pick — the
    * incremental-update convention. Malformed headers/offsets skip
    * that stream, never throw. */
  private def expandObjStms(bytes: Array[Byte], objs: Vector[IndObj],
                            maxInflate: Int): Vector[IndObj] = {
    val extra = Vector.newBuilder[IndObj]
    objs.foreach { o =>
      o.value match {
        case CDict(m) if m.get("Type").contains(CName("ObjStm")) &&
          o.streamFrom >= 0 && o.streamUntil >= o.streamFrom =>
          val nOpt = m.get("N").collect {
            case CNum(v) if v >= 0 && v <= 100000 => v.toInt
          }
          val firstOpt = m.get("First").collect {
            case CNum(v) if v >= 0 => v.toInt
          }
          val body = m.get("Filter") match {
            case Some(CName("FlateDecode")) |
                 Some(CArr(Vector(CName("FlateDecode")))) =>
              flate(bytes, o.streamFrom, o.streamUntil, maxInflate)
            case None => Some(java.util.Arrays.copyOfRange(bytes,
              o.streamFrom, o.streamUntil))
            case _ => None
          }
          for (n <- nOpt; first <- firstOpt; b <- body
               if first <= b.length) {
            val hp = new P(b)
            var k = 0
            var ok = true
            while (ok && k < n) {
              val num = parseObj(hp, 0)
              val off = parseObj(hp, 0)
              (num, off) match {
                case (CNum(nv), CNum(ov))
                  if nv >= 0 && ov >= 0 && first + ov <= b.length &&
                    nv == math.floor(nv) && ov == math.floor(ov) =>
                  val op = new P(b)
                  op.i = first + ov.toInt
                  extra += IndObj(nv.toInt, parseObj(op, 0), -1, -1,
                    srcStm = o.num, srcIdx = k)
                case _ => ok = false
              }
              k += 1
            }
          }
        case _ => ()
      }
    }
    objs ++ extra.result()
  }

  /** All indirect objects: the linear scan plus the contents of every
    * object stream. */
  private def allObjects(bytes: Array[Byte],
                         maxInflate: Int): Vector[IndObj] =
    expandObjStms(bytes, scanObjects(bytes), maxInflate)

  // ---------------------------------------------------------------
  // Cross-reference STREAMS (§7.5.8, r12 verdict #5): since PDF 1.5 the
  // authoritative object table is a /Type /XRef stream — binary rows of
  // /W-sized fields over /Index-declared object ranges, usually
  // FlateDecode + PNG Up predictor. The linear scan stays the DISCOVERY
  // path (it finds every revision, intact or damaged); the xref adds
  // REVISION LIVENESS: which copy of a multiply-written object number
  // is current (type 1 = the one at this byte offset; type 2 = the one
  // at this index of this object stream) and which numbers are FREE
  // (type 0 — deleted objects whose stale bodies still sit in the
  // file). Without it, last-in-document-order picks shadowed revisions
  // on incrementally-updated files. Sections that fail to parse are
  // COUNTED and liveness falls back to document order — same honesty
  // rule as every other decoder boundary in this file.

  /** One cross-reference entry: `tpe` 0 free / 1 offset / 2 in-ObjStm;
    * `f2`,`f3` per §7.5.8.3. */
  private final case class XrefEntry(tpe: Int, f2: Long, f3: Long)

  private final case class XrefInfo(entries: Map[Int, XrefEntry],
                                    sections: Int, failed: Int,
                                    /** /Info ref from the NEWEST parsed
                                      * section's dict (−1 when none) —
                                      * xref-stream files carry the
                                      * trailer fields there. */
                                    infoRef: Int = -1)

  /** Undo a PNG row predictor (/DecodeParms /Predictor ≥ 10): each row
    * is one filter-type byte + `rowLen` data bytes; bpp is 1 for xref
    * streams (8-bit "samples", /Colors /BitsPerComponent defaults).
    * Returns the concatenated unfiltered rows; null on malformed
    * shapes. Predictor 2 (TIFF horizontal) also handled; 1 = identity. */
  private[sources] def unpredict(data: Array[Byte], predictor: Int,
                                 rowLen: Int): Array[Byte] = {
    if (predictor <= 1) return data
    if (rowLen <= 0) return null
    if (predictor == 2) { // TIFF: left-delta per byte (bpp = 1)
      val out = data.clone()
      var i = 0
      while (i < out.length) {
        if (i % rowLen != 0)
          out(i) = ((out(i) + out(i - 1)) & 0xff).toByte
        i += 1
      }
      return out
    }
    // 3–9 are not legal /Predictor values (§7.4.4.4 allows 1, 2,
    // 10–15): treating them as PNG would mis-decode yet COUNT the
    // section as parsed — reject so the failure is honest.
    if (predictor < 10) return null
    // PNG family: rows of (filterByte + rowLen data bytes).
    if (data.length % (rowLen + 1) != 0) return null
    val rows = data.length / (rowLen + 1)
    val out = new Array[Byte](rows * rowLen)
    var r = 0
    while (r < rows) {
      val ft = data(r * (rowLen + 1)) & 0xff
      var c = 0
      while (c < rowLen) {
        val x = data(r * (rowLen + 1) + 1 + c) & 0xff
        val left = if (c > 0) out(r * rowLen + c - 1) & 0xff else 0
        val up = if (r > 0) out((r - 1) * rowLen + c) & 0xff else 0
        val ul =
          if (r > 0 && c > 0) out((r - 1) * rowLen + c - 1) & 0xff else 0
        val v = ft match {
          case 0 => x
          case 1 => x + left
          case 2 => x + up
          case 3 => x + (left + up) / 2
          case 4 => // Paeth
            val p = left + up - ul
            val pa = math.abs(p - left)
            val pb = math.abs(p - up)
            val pc = math.abs(p - ul)
            x + (if (pa <= pb && pa <= pc) left
            else if (pb <= pc) up else ul)
          case _ => return null // unknown filter type: malformed row
        }
        out(r * rowLen + c) = (v & 0xff).toByte
        c += 1
      }
      r += 1
    }
    out
  }

  /** Parse ONE xref-stream section (an IndObj whose dict says
    * /Type /XRef): W-sized binary rows over /Index subsections. None
    * when the stream is not a parseable section (truncated W, missing
    * body, undecodable filter) — the FAILED count. Lying /Index
    * subsections clamp to the rows actually present. Returns the
    * section's entries (first-wins within the section) and its /Prev
    * offset. */
  private def parseXrefSection(bytes: Array[Byte], o: IndObj,
                               maxInflate: Int)
      : Option[(Vector[(Int, XrefEntry)], Option[Long], Int)] = {
    val m = o.value match {
      case CDict(d) if d.get("Type").contains(CName("XRef")) => d
      case _ => return None
    }
    if (o.streamFrom < 0 || o.streamUntil < o.streamFrom) return None
    val ws = m.get("W") match {
      case Some(CArr(items)) if items.length >= 3 =>
        items.take(3).map {
          case CNum(v) if v >= 0 && v <= 8 && v == math.floor(v) => v.toInt
          case _ => -1
        }
      case _ => return None // truncated/absent W: unusable section
    }
    if (ws.exists(_ < 0)) return None
    val rowLen = ws.sum
    if (rowLen <= 0) return None
    val size = m.get("Size") match {
      case Some(CNum(v)) if v >= 0 => v.toLong
      case _ => return None
    }
    val raw0 = m.get("Filter") match {
      case Some(CName("FlateDecode")) |
           Some(CArr(Vector(CName("FlateDecode")))) =>
        flate(bytes, o.streamFrom, o.streamUntil, maxInflate)
      case None => Some(java.util.Arrays.copyOfRange(bytes,
        o.streamFrom, o.streamUntil))
      case _ => None // unsupported xref filter: counted, honest
    }
    val predictor = m.get("DecodeParms").orElse(m.get("DP")) match {
      case Some(CDict(dp)) => dp.get("Predictor") match {
        case Some(CNum(v)) if v >= 1 => v.toInt
        case _ => 1
      }
      case _ => 1
    }
    val data = raw0 match {
      case None => return None
      case Some(r) =>
        val u = unpredict(r, predictor, rowLen)
        if (u == null) return None else u
    }
    val index: Seq[(Long, Long)] = m.get("Index") match {
      case Some(CArr(items)) if items.length % 2 == 0 =>
        items.grouped(2).toSeq.map {
          case Vector(CNum(s), CNum(n)) if s >= 0 && n >= 0 =>
            (s.toLong, n.toLong)
          case _ => (-1L, -1L)
        }
      case _ => Seq((0L, size))
    }
    if (index.exists(_._1 < 0)) return None
    val avail = data.length / rowLen
    val out = Vector.newBuilder[(Int, XrefEntry)]
    // A lying /Index (or /Size) declaring more rows than the body holds
    // CLAMPS to the data actually present — the loop is bounded by
    // `avail`, never by the declared counts (a declared 9e12-row
    // subsection must not spin the task for hours; nothing past the
    // data can be emitted anyway). Counted rows only, never a read past
    // the end, never a throw.
    var row = 0
    val subsections = index.iterator
    while (row < avail && subsections.hasNext) {
      val (start, n) = subsections.next()
      var k = 0L
      while (k < n && row < avail) {
        if (start + k <= Int.MaxValue) {
          var p = row * rowLen
          @inline def field(w: Int): Long = {
            var v = 0L
            var i = 0
            while (i < w) { v = (v << 8) | (data(p) & 0xff); p += 1; i += 1 }
            v
          }
          val t = if (ws(0) == 0) 1L else field(ws(0))
          val f2 = field(ws(1))
          val f3 = field(ws(2))
          if (t >= 0 && t <= 2)
            out += ((start + k).toInt -> XrefEntry(t.toInt, f2, f3))
        }
        row += 1
        k += 1
      }
    }
    val prev = m.get("Prev") match {
      case Some(CNum(v)) if v >= 0 => Some(v.toLong)
      case _ => None
    }
    val infoRef = m.get("Info") match {
      case Some(CRef(r)) => r
      case _ => -1
    }
    Some((out.result(), prev, infoRef))
  }

  /** Walk the xref-stream chain from the trailing `startxref` pointer
    * through /Prev links (newest first — earlier sections win per
    * object number), resolving each offset against the SCANNED objects
    * (an offset that lands on no scanned header is a failed section:
    * declared offsets into untrusted bytes are matched, never blindly
    * parsed). None when the file has no usable startxref → xref-stream
    * head at all — the pre-1.5 / damaged-tail case, where document
    * order remains the only liveness signal. */
  private def xrefLiveness(bytes: Array[Byte], objs: Vector[IndObj],
                           maxInflate: Int): Option[XrefInfo] = {
    // Last `startxref` in the tail wins (incremental updates append).
    val n = bytes.length
    var sx = -1
    var i = n - 9
    while (sx < 0 && i >= 0) {
      if ((bytes(i) & 0xff) == 's' && {
        val w = "startxref"
        var k = 0
        while (k < 9 && (bytes(i + k) & 0xff) == w.charAt(k)) k += 1
        k == 9
      }) sx = i
      else i -= 1
    }
    if (sx < 0) return None
    val p = new P(bytes)
    p.i = sx + 9
    val firstOff = parseObj(p, 0) match {
      case CNum(v) if v >= 0 && v == math.floor(v) => v.toLong
      case _ => return None
    }
    val byOff = objs.iterator.filter(_.off >= 0)
      .map(o => (o.off.toLong, o)).toMap
    val entries = scala.collection.mutable.HashMap.empty[Int, XrefEntry]
    val seen = scala.collection.mutable.HashSet.empty[Long]
    var sections = 0
    var failed = 0
    var infoRef = -1
    // Worklist, newest-first: an xref-stream section pushes its /Prev;
    // a classic table pushes its /XRefStm BEFORE its /Prev (the hybrid
    // stream completes THIS section, so its entries must win over the
    // older chain — first-wins map order is visit order).
    var queue: List[Long] = List(firstOff)
    var hops = 0
    while (queue.nonEmpty && hops < 64) {
      val off = queue.head
      queue = queue.tail
      if (!seen.add(off)) () // /Prev loop: stop
      else if (off + 4 <= n && (bytes(off.toInt) & 0xff) == 'x' &&
        (bytes(off.toInt + 1) & 0xff) == 'r' &&
        (bytes(off.toInt + 2) & 0xff) == 'e' &&
        (bytes(off.toInt + 3) & 0xff) == 'f') {
        // An OLD-STYLE ASCII `xref` table. Pre-1.5 files end here —
        // their liveness stays document order (classic tables carry no
        // type-2 entries and the linear scan already finds every
        // revision they could name). But HYBRID-REFERENCE files
        // (§7.5.8.4, the 1.5-era back-compat shape) put the
        // authoritative /XRefStm pointer in this table's trailer dict
        // — stopping here silently fell back to document order and
        // could keep shadowed/freed revisions the stream corrects
        // (advice r13). The walk is the EXACT section grammar, not a
        // windowed text search (review r14: searching for the literal
        // `trailer` up to 1 MiB ahead could latch onto an OLDER
        // section's trailer — wrong /XRefStm chain, stale liveness —
        // and silently dropped the hop for tables past the window):
        // subsection headers are `start count` lines followed by
        // exactly `count` 20-byte entries (§7.5.4), and `trailer` must
        // follow THIS section. A table that breaks the grammar (the
        // 19-byte single-EOL writers) degrades to the plain classic
        // stop — document-order liveness, the pre-hybrid behavior —
        // never to a mismatched chain.
        var t = off.toInt + 4
        var found = -1
        var damaged = false
        @inline def isWs(b: Int): Boolean =
          b == ' ' || b == '\r' || b == '\n' || b == '\t' || b == 0 ||
            b == '\f'
        @inline def uint(): Long = {
          var v = -1L
          while (t < n && (bytes(t) & 0xff) >= '0' &&
            (bytes(t) & 0xff) <= '9' && v < (1L << 40)) {
            v = (if (v < 0) 0L else v) * 10 + ((bytes(t) & 0xff) - '0')
            t += 1
          }
          // Hitting the 2^40 cap IS damage (advice r14): returning the
          // truncated value would leave the number's remaining digits in
          // place for the NEXT parse to consume — a pathological header
          // could then read as a small valid subsection and the walk
          // would advance over arbitrary bytes instead of degrading to
          // the classic stop. No real xref start/count approaches 2^40.
          if (v >= (1L << 40)) damaged = true
          v
        }
        while (found < 0 && !damaged) {
          while (t < n && isWs(bytes(t) & 0xff)) t += 1
          if (t + 7 <= n && (bytes(t) & 0xff) == 't' &&
            (bytes(t + 1) & 0xff) == 'r' && (bytes(t + 2) & 0xff) == 'a' &&
            (bytes(t + 3) & 0xff) == 'i' && (bytes(t + 4) & 0xff) == 'l' &&
            (bytes(t + 5) & 0xff) == 'e' && (bytes(t + 6) & 0xff) == 'r')
            found = t
          else {
            val start = uint()
            while (t < n && (bytes(t) & 0xff) == ' ') t += 1
            val count = uint()
            if (start < 0 || count < 0 || count > (n - t) / 20L)
              damaged = true
            else {
              // Whitespace after the header lands on the first entry's
              // leading digit; entries are a fixed 20-byte stride.
              while (t < n && isWs(bytes(t) & 0xff)) t += 1
              t += (count * 20L).toInt
              if (t > n) damaged = true
            }
          }
        }
        if (found >= 0) {
          val tp = new P(bytes)
          tp.i = found + 7
          parseObj(tp, 0) match {
            case CDict(td) =>
              val xs = td.get("XRefStm") match {
                case Some(CNum(v)) if v >= 0 && v == math.floor(v) =>
                  List(v.toLong)
                case _ => Nil
              }
              val pv = td.get("Prev") match {
                case Some(CNum(v)) if v >= 0 && v == math.floor(v) =>
                  List(v.toLong)
                case _ => Nil
              }
              queue = xs ::: pv ::: queue
            case _ => () // damaged trailer: classic stop, not a failure
          }
        }
      } else if (off >= n) {
        failed += 1 // startxref/Prev points past the file: lies
      } else byOff.get(off) match {
        case None => failed += 1 // startxref/Prev lies: no header there
        case Some(o) => parseXrefSection(bytes, o, maxInflate) match {
          case None => failed += 1 // declared /Type /XRef, unusable
          case Some((secEntries, prev, secInfo)) =>
            sections += 1
            // Newest section wins — for /Info exactly as for entries
            // (review r13: a decoy XRef dict appended late in the file,
            // unreachable from the chain, must never supply /Info).
            if (infoRef < 0 && secInfo >= 0) infoRef = secInfo
            secEntries.foreach { case (num, e) =>
              if (!entries.contains(num)) entries.update(num, e)
            }
            prev.foreach(pv => queue = pv :: queue)
        }
      }
      hops += 1
    }
    if (sections == 0 && failed == 0) None
    else Some(XrefInfo(entries.toMap, sections, failed, infoRef))
  }

  /** The live revision per object number: the xref entry's designated
    * copy when one parses (type 1 by header offset, type 2 by
    * (ObjStm, index) provenance, type 0 drops the number), document
    * order (`.last`) for numbers the xref does not govern or whose
    * designated copy is missing. */
  private def chooseLive(objs: Vector[IndObj],
                         xref: Option[XrefInfo]): Map[Int, IndObj] = {
    val byNum = objs.groupBy(_.num)
    val xentries = xref.map(_.entries).getOrElse(Map.empty)
    byNum.flatMap { case (num, versions) =>
      xentries.get(num) match {
        case Some(XrefEntry(0, _, _)) => None // freed: no live revision
        case Some(XrefEntry(1, off, _)) =>
          Some(num -> versions.find(_.off.toLong == off)
            .getOrElse(versions.last))
        case Some(XrefEntry(2, stm, idx)) =>
          Some(num -> versions
            .find(v => v.srcStm.toLong == stm && v.srcIdx.toLong == idx)
            .orElse(versions.find(_.srcStm.toLong == stm))
            .getOrElse(versions.last))
        case _ => Some(num -> versions.last)
      }
    }
  }

  /** Parse one PDF and extract its text. None only when the bytes have
    * no PDF shape at all (no `%PDF` header AND no indirect objects). */
  def extract(bytes: Array[Byte],
              maxInflate: Int = 64 * 1024 * 1024): Option[PdfDoc] =
    extractWithTitle(bytes, maxInflate).map(_._1)

  /** [[extract]] plus the /Info Title from the SAME parse — the crawl
    * ingest path needs both, and [[docInfo]] would re-run the whole
    * object scan + ObjStm inflation. */
  def extractWithTitle(bytes: Array[Byte],
                       maxInflate: Int = 64 * 1024 * 1024)
      : Option[(PdfDoc, String)] = {
    if (bytes == null || bytes.length < 8) return None
    try {
      val objs = allObjects(bytes, maxInflate)
      val hasHeader = bytes.length >= 4 && bytes(0) == '%' &&
        bytes(1) == 'P' && bytes(2) == 'D' && bytes(3) == 'F'
      if (objs.isEmpty && !hasHeader) return None
      var pages = 0
      var streams = 0
      var decoded = 0
      val text = new java.lang.StringBuilder
      // Content streams are extracted for PAGE objects' /Contents refs,
      // in page order; dangling refs are skipped (counted via coverage).
      // Liveness: the xref-stream chain designates the current revision
      // per object number (and drops freed numbers) when it parses;
      // document order (last wins) otherwise — the universal repair
      // path stays the discovery mechanism either way.
      val xinfo = xrefLiveness(bytes, objs, maxInflate)
      val byNum = chooseLive(objs, xinfo)
      // Duplicate same-numbered objects (incremental updates append a
      // new version) must count and extract ONCE, the live version
      // winning — iterate in document order but skip superseded (or
      // freed) instances.
      val live = objs.filter(o => byNum.get(o.num).exists(_ eq o))
      def contentRefs(v: Cos): Seq[Int] = v match {
        case CDict(m) => m.get("Contents").toSeq.flatMap {
          case CRef(r) => Seq(r)
          case CArr(items) => items.collect { case CRef(r) => r }
          case _ => Seq.empty
        }
        case _ => Seq.empty
      }
      def resolve(v: Cos): Cos = v match {
        case CRef(r) => byNum.get(r).map(_.value).getOrElse(CNull)
        case x => x
      }
      // A stream's decoded body (FlateDecode or unfiltered); None for a
      // missing endstream delimiter or an unsupported filter. Shared by
      // content streams and /ToUnicode CMap streams.
      def streamRaw(co: IndObj): Option[Array[Byte]] =
        if (co.streamFrom < 0 || co.streamUntil < co.streamFrom) None
        else (co.value match {
          case CDict(cm) => cm.get("Filter")
          case _ => None
        }) match {
          case Some(CName("FlateDecode")) |
               Some(CArr(Vector(CName("FlateDecode")))) =>
            flate(bytes, co.streamFrom, co.streamUntil, maxInflate)
          case None => Some(java.util.Arrays.copyOfRange(bytes,
            co.streamFrom, co.streamUntil))
          case _ => None // unsupported filter: counted, honest
        }
      // Font-object → parsed /ToUnicode CMap, cached per font object so
      // fonts shared across pages parse once. The Boolean records
      // whether a /ToUnicode was DECLARED — declared-but-unusable is
      // the fontsCmapFailed count.
      val fontCache =
        scala.collection.mutable.HashMap.empty[Int, (Boolean, Option[CMapData])]
      def cmapOfDict(fm: Map[String, Cos]): (Boolean, Option[CMapData]) =
        fm.get("ToUnicode") match {
          case Some(CRef(t)) =>
            (true, byNum.get(t).flatMap(streamRaw).flatMap(parseCMap))
          case Some(_) => (true, None) // non-ref forms: unsupported
          case None => (false, None)
        }
      def fontCMap(num: Int): (Boolean, Option[CMapData]) =
        fontCache.getOrElseUpdate(num, resolve(CRef(num)) match {
          case CDict(fm) => cmapOfDict(fm)
          case _ => (false, None)
        })
      // Inline font dicts (no object number) cache BY INSTANCE: a
      // /Resources dict inherited through the pages tree resolves to
      // the same parsed CDict for every page, so without this an
      // inherited inline font would inflate the counters once per page
      // while CRef fonts count once per document (advice r12). A
      // per-page EMBEDDED copy is a distinct instance — a distinct
      // declaration — and still counts per copy.
      val inlineFontCache =
        new java.util.IdentityHashMap[Map[String, Cos],
          (Boolean, Option[CMapData])]()
      var fontsDirectOk = 0
      var fontsDirectFailed = 0
      // The page's /Font resources (walking the /Parent chain for
      // inherited /Resources — the pages-tree convention) as a
      // name → parsed-CMap map; fonts without one fall back to WinAnsi
      // inside contentText.
      def pageFonts(page: Cos): Map[String, CMapData] = {
        var cur = page
        var res: Option[Map[String, Cos]] = None
        var hops = 0
        while (res.isEmpty && hops < 8) {
          cur match {
            case CDict(m) =>
              res = resolve(m.getOrElse("Resources", CNull)) match {
                case CDict(r) => Some(r)
                case _ => None
              }
              if (res.isEmpty) {
                cur = m.get("Parent").map(resolve).getOrElse(CNull)
                hops += 1
              }
            case _ => hops = 8
          }
        }
        res.map(r => resolve(r.getOrElse("Font", CNull))).collect {
          case CDict(fd) => fd.flatMap {
            case (name, CRef(r)) => fontCMap(r)._2.map(name -> _)
            case (name, CDict(fm)) => // inline font dict (rare)
              val cached =
                if (inlineFontCache.containsKey(fm)) inlineFontCache.get(fm)
                else {
                  val v = cmapOfDict(fm)
                  inlineFontCache.put(fm, v)
                  if (v._1 && v._2.isEmpty) fontsDirectFailed += 1
                  if (v._2.isDefined) fontsDirectOk += 1
                  v
                }
              cached._2.map(name -> _)
            case _ => None
          }
        }.getOrElse(Map.empty)
      }
      live.foreach { o =>
        o.value match {
          case CDict(m) if m.get("Type").contains(CName("Page")) =>
            pages += 1
            val fonts = pageFonts(o.value)
            // ONE text state across this page's content streams — the
            // /Contents array concatenates into a single stream, so the
            // font selected in stream k is live in stream k+1.
            val st = new TextState
            contentRefs(o.value).foreach { r =>
              byNum.get(r).foreach { co =>
                // A stream with no endstream delimiter (truncated
                // capture) has no recoverable body: not counted.
                if (co.streamFrom >= 0 && co.streamUntil >= co.streamFrom) {
                  streams += 1
                  streamRaw(co).foreach { raw =>
                    decoded += 1
                    contentText(raw, text, fonts, st)
                  }
                }
              }
            }
          case _ => ()
        }
      }
      val fontsCmap = fontCache.valuesIterator.count(_._2.isDefined) +
        fontsDirectOk
      val fontsCmapFailed = fontCache.valuesIterator
        .count(v => v._1 && v._2.isEmpty) + fontsDirectFailed
      val title = infoFrom(bytes, objs, xinfo).flatMap(_.get("Title")).orNull
      Some((PdfDoc(pages, objs.size, streams, decoded, text.toString,
        fontsCmap, fontsCmapFailed,
        xinfo.map(_.sections).getOrElse(0),
        xinfo.map(_.failed).getOrElse(0)), title))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** PDF TEXT STRINGS (§7.9.2.2) carry an optional UTF-16BE BOM —
    * /Info values (titles, authors) use it constantly; without it the
    * bytes are PDFDocEncoding. */
  private def decodeTextString(bytes: Array[Byte]): String =
    if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xfe &&
      (bytes(1) & 0xff) == 0xff)
      new String(bytes, 2, bytes.length - 2,
        java.nio.charset.StandardCharsets.UTF_16BE)
    else decodeStr(bytes)

  /** Parse a PDF date string (§7.9.4, `D:YYYYMMDDHHmmSSOHH'mm'`) to
    * ISO-8601; missing trailing fields default per spec (month/day 01,
    * time 00, offset absent). Null when the shape is not a date. */
  def pdfDate(s: String): String = {
    if (s == null) return null
    val t0 = s.trim
    val t = if (t0.startsWith("D:")) t0.substring(2) else t0
    if (t.length < 4 || !t.substring(0, 4).forall(_.isDigit)) return null
    @inline def part(from: Int, len: Int, dflt: String): String =
      if (t.length >= from + len && t.substring(from, from + len)
        .forall(_.isDigit)) t.substring(from, from + len) else dflt
    val y = t.substring(0, 4)
    val mo = part(4, 2, "01")
    val d = part(6, 2, "01")
    val h = part(8, 2, "00")
    val mi = part(10, 2, "00")
    val se = part(12, 2, "00")
    val tz =
      if (t.length > 14) t.charAt(14) match {
        case 'Z' => "Z"
        case c @ ('+' | '-') if t.length >= 20 &&
          t.substring(15, 17).forall(_.isDigit) &&
          t.charAt(17) == '\'' &&
          t.substring(18, 20).forall(_.isDigit) =>
          s"$c${t.substring(15, 17)}:${t.substring(18, 20)}"
        case _ => ""
      } else ""
    s"$y-$mo-${d}T$h:$mi:$se$tz"
  }

  /** The document-information dictionary (`trailer /Info N 0 R`):
    * Title / Author / Subject / Producer / CreationDate / ModDate as
    * decoded strings. Falls back, when no trailer resolves (linearized
    * or damaged tail), to the first object carrying any of those keys
    * and no /Type. None when nothing is found. */
  def docInfo(bytes: Array[Byte]): Option[Map[String, String]] = {
    if (bytes == null || bytes.length < 8) return None
    try {
      val objs = allObjects(bytes, 64 * 1024 * 1024)
      infoFrom(bytes, objs, xrefLiveness(bytes, objs, 64 * 1024 * 1024))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** The /Info resolution given already-parsed objects (the trailer
    * scan itself is cheap — no inflation). `xref` carries the
    * cross-reference liveness when the caller already walked it
    * ([[extractWithTitle]]); [[docInfo]] walks it itself — an
    * incrementally-updated /Info object resolves to the revision the
    * xref designates, not blindly to the last copy in the file (the
    * same r13 liveness rule the text path follows). The trailer-dict
    * /Info REFERENCE still takes the last trailer (incremental updates
    * append trailers; that part of the format has no xref-stream
    * equivalent to defer to). */
  private def infoFrom(bytes: Array[Byte],
                       objs: Vector[IndObj],
                       xref: Option[XrefInfo]): Option[Map[String, String]] = {
    {
      val byNum = chooseLive(objs, xref)
      val InfoKeys = Seq("Title", "Author", "Subject", "Producer",
        "CreationDate", "ModDate")
      def strings(v: Cos): Map[String, String] = v match {
        case CDict(m) =>
          InfoKeys.flatMap(k => m.get(k).collect {
            case CStr(b) => k -> decodeTextString(b)
          }).toMap
        case _ => Map.empty
      }
      // trailer dicts, last one wins (incremental updates append).
      var infoRef = -1
      var i = 0
      val n = bytes.length
      while (i + 7 <= n) {
        if ((bytes(i) & 0xff) == 't' && {
          var k = 0
          val w = "trailer"
          while (k < 7 && (bytes(i + k) & 0xff) == w.charAt(k)) k += 1
          k == 7
        }) {
          val p = new P(bytes)
          p.i = i + 7
          parseObj(p, 0) match {
            case CDict(m) => m.get("Info") match {
              case Some(CRef(r)) => infoRef = r
              case _ => ()
            }
            case _ => ()
          }
          i = p.i
        } else i += 1
      }
      // Xref-stream PDFs (1.5+) have NO `trailer` keyword — the
      // /Type /XRef stream's dict IS the trailer and carries /Info
      // (r13). Keyword trailers keep precedence (legacy files; an
      // appended classic trailer supersedes); else the /Info comes
      // from the NEWEST section of the PARSED xref chain — never from
      // a document-order scan of XRef-shaped dicts, which a decoy
      // appended late in the file (unreachable from startxref) would
      // win (review r13). Files with no usable chain keep the
      // heuristic fallback below.
      if (infoRef < 0) infoRef = xref.map(_.infoRef).getOrElse(-1)
      // A freed /Info number (type-0 in the live chain) means the
      // metadata was DELETED by an incremental update: resurrecting
      // the stale revision through the heuristic would read exactly
      // the object the xref says is gone (review r13).
      val infoFreed = infoRef >= 0 &&
        xref.exists(_.entries.get(infoRef).exists(_.tpe == 0))
      if (infoFreed) return None
      val fromTrailer = if (infoRef >= 0)
        byNum.get(infoRef).map(o => strings(o.value)).filter(_.nonEmpty)
      else None
      fromTrailer.orElse {
        objs.iterator.map(o => (o.value, strings(o.value))).collectFirst {
          case (CDict(m), s) if s.nonEmpty && !m.contains("Type") => s
        }
      }
    }
  }

  /** DataFrame form of [[docInfo]]: appends `pdf_title`, `pdf_author`,
    * `pdf_created` (ISO-8601 via [[pdfDate]]); nulls when absent. One
    * narrow per-partition pass. */
  def withInfo(df: DataFrame, bytesCol: String = "bytes"): DataFrame = {
    val bi = df.schema.fieldIndex(bytesCol)
    val schema = df.schema
      .add("pdf_title", StringType).add("pdf_author", StringType)
      .add("pdf_created", StringType)
    df.mapPartitions { it =>
      it.map { row =>
        val info = docInfo(row.getAs[Array[Byte]](bi)).getOrElse(Map.empty)
        Row.fromSeq(row.toSeq :+ info.get("Title").orNull :+
          info.get("Author").orNull :+
          info.get("CreationDate").map(pdfDate).orNull)
      }
    }(Encoders.row(schema))
  }

  /** DataFrame form: appends `pdf_pages`, `pdf_objects`, `pdf_streams`,
    * `pdf_streams_decoded` and `pdf_text` per payload; non-PDF bytes
    * yield a coded `pdf_pages = −1` row (kept, never dropped). One
    * narrow per-partition pass. */
  def extractText(df: DataFrame, bytesCol: String = "bytes",
                  maxInflate: Int = 64 * 1024 * 1024): DataFrame = {
    val bi = df.schema.fieldIndex(bytesCol)
    val schema = df.schema
      .add("pdf_pages", LongType).add("pdf_objects", LongType)
      .add("pdf_streams", LongType).add("pdf_streams_decoded", LongType)
      .add("pdf_text", StringType)
      .add("pdf_fonts_cmap", LongType).add("pdf_fonts_cmap_failed", LongType)
      .add("pdf_xref_sections", LongType).add("pdf_xref_failed", LongType)
    df.mapPartitions { it =>
      it.map { row =>
        extract(row.getAs[Array[Byte]](bi), maxInflate) match {
          case Some(d) =>
            Row.fromSeq(row.toSeq :+ d.pages.toLong :+ d.objects.toLong :+
              d.streams.toLong :+ d.streamsDecoded.toLong :+ d.text :+
              d.fontsCmap.toLong :+ d.fontsCmapFailed.toLong :+
              d.xrefSections.toLong :+ d.xrefFailed.toLong)
          case None =>
            Row.fromSeq(row.toSeq :+ -1L :+ 0L :+ 0L :+ 0L :+ null :+
              0L :+ 0L :+ 0L :+ 0L)
        }
      }
    }(Encoders.row(schema))
  }
}
