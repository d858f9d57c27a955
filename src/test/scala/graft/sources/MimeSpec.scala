package graft.sources

import graft.SparkSpec

/** Content-sniffing contract: the magic table, the tag-shaped-text
  * rules (leading whitespace, case-insensitivity, the terminator
  * requirement), the binary-byte scan, and Content-Type essence. */
class MimeSpec extends SparkSpec {

  private def b(s: String): Array[Byte] = s.getBytes("UTF-8")

  test("sniff: magic table") {
    assert(Mime.sniff(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a, 0)
      .map(_.toByte)) === "image/png")
    assert(Mime.sniff(Array(0xff, 0xd8, 0xff, 0xe0).map(_.toByte)) ===
      "image/jpeg")
    assert(Mime.sniff(b("GIF89a") ++ Array[Byte](1, 0)) === "image/gif")
    assert(Mime.sniff(b("RIFF1234WEBPVP8 ")) === "image/webp")
    assert(Mime.sniff(b("RIFF1234WAVEfmt ")) === "audio/wav")
    assert(Mime.sniff(b("BM") ++ new Array[Byte](8)) === "image/bmp")
    assert(Mime.sniff(b("OggS") ++ new Array[Byte](4)) === "application/ogg")
    assert(Mime.sniff(b("fLaC")) === "audio/flac")
    assert(Mime.sniff(b("ID3") ++ new Array[Byte](4)) === "audio/mpeg")
    assert(Mime.sniff(b("????ftypisom")) === "video/mp4")
    assert(Mime.sniff(Array(0x1f, 0x8b, 0x08).map(_.toByte)) ===
      "application/gzip")
    assert(Mime.sniff(b("PK") ++ Array[Byte](3, 4)) === "application/zip")
    assert(Mime.sniff(b("%PDF-1.7 x")) === "application/pdf")
    assert(Mime.sniff(b("II") ++ Array[Byte](0x2a, 0)) === "image/tiff")
    // A too-short prefix of a magic is not a match.
    assert(Mime.sniff(Array(0x89.toByte, 'P'.toByte)) !==
      "image/png")
  }

  test("sniff: tag-shaped text, terminators, xml, binary scan") {
    assert(Mime.sniff(b("\n\t  <!DOCTYPE html><html>")) === "text/html")
    assert(Mime.sniff(b("<HtMl><body>x</body>")) === "text/html")
    assert(Mime.sniff(b("<b>bold</b>")) === "text/html")
    assert(Mime.sniff(b("<!-- c -->hi")) === "text/html")
    // '<binary' has no terminator after the 'b' tag: NOT html.
    assert(Mime.sniff(b("<binary gunk")) === "text/plain")
    assert(Mime.sniff(b("<?xml version=\"1.0\"?><r/>")) === "text/xml")
    assert(Mime.sniff(b("plain old text")) === "text/plain")
    assert(Mime.sniff(b("text with a ") ++ Array[Byte](0x00) ++ b("hole")) ===
      "application/octet-stream")
    assert(Mime.sniff(Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++
      b("bom text")) === "text/plain")
    assert(Mime.sniff(Array.empty[Byte]) === "application/octet-stream")
    assert(Mime.sniff(null) === null)
  }

  test("essence: params stripped, lowercased, null-safe") {
    assert(Mime.essence("Text/HTML; charset=UTF-8") === "text/html")
    assert(Mime.essence("application/pdf") === "application/pdf")
    assert(Mime.essence("  ;") === null)
    assert(Mime.essence(null) === null)
  }
}
