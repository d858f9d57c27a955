package graft.sources

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/** WARC (ISO 28500 — the Common Crawl wire format) ingestion: the record
  * layer a 100 TB web-text pipeline actually reads, as pure byte/text
  * arithmetic over opaque binary columns — no parser library.
  *
  * [[Warc.gunzip]] is the real DEFLATE path via `java.util.zip` (Java SE,
  * zero added dependencies), with a hard output cap so a crafted
  * zip bomb fails as None before it can balloon executor memory —
  * untrusted bytes never throw and never allocate past the cap.
  * Concatenated gzip members decompress as one stream (the `.warc.gz`
  * convention compresses each record as its own member precisely so
  * readers can split work without decompressing the whole file).
  *
  * [[Warc.warcRecords]] parses the record framing: `WARC/1.x` version
  * line, `Name: value` header lines to the blank line, `Content-Length`
  * payload framing, and the mandatory double-CRLF record terminator.
  * [[Warc.records]] is the DataFrame form — one narrow per-partition
  * pass exploding each payload into its records with the
  * classification headers as typed columns; no shuffle, no driver
  * collect. `gzipped = true` front-runs [[Warc.gunzip]] for `.warc.gz`
  * payloads.
  */
object Warc {

  /** Decompressed gzip stream, or None for anything malformed, truncated,
    * or — the untrusted-bytes guard — larger than `maxOut` when inflated
    * (a zip bomb announces itself by crossing the cap, not by OOMing the
    * executor). Concatenated members read as one stream. */
  def gunzip(bytes: Array[Byte],
             maxOut: Int = 64 * 1024 * 1024): Option[Array[Byte]] = {
    if (bytes == null || bytes.length < 18) return None
    if ((bytes(0) & 0xff) != 0x1f || (bytes(1) & 0xff) != 0x8b) return None
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val out = new java.io.ByteArrayOutputStream(
        math.min(bytes.length * 4, maxOut))
      val buf = new Array[Byte](8192)
      var total = 0L
      var n = in.read(buf)
      while (n > 0) {
        total += n
        if (total > maxOut) return None // bomb guard — fail before growing
        out.write(buf, 0, n)
        n = in.read(buf)
      }
      Some(out.toByteArray)
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** One parsed WARC record: version, headers (original case preserved in
    * values, names matched case-insensitively), and the payload's exact
    * byte range in the input buffer. */
  final case class WarcRecord(version: String, headers: Map[String, String],
                              payloadOffset: Int, payloadLength: Int) {
    def header(name: String): Option[String] =
      headers.collectFirst {
        case (k, v) if k.equalsIgnoreCase(name) => v
      }
  }

  /** All records of a WARC file — the framing walk every WARC reader
    * performs: version line, header lines to the blank line,
    * `Content-Length` bytes of payload, double-CRLF terminator, repeat.
    * None unless at least ONE record parses; junk after the last whole
    * record ends the walk cleanly (the trailing-bytes rule the other
    * container walks use). Capped at 1M records; untrusted bytes never
    * throw. */
  def warcRecords(bytes: Array[Byte]): Option[Vector[WarcRecord]] = {
    if (bytes == null || bytes.length < 12) return None
    val n = bytes.length
    /** Next CRLF at/after `from`, or -1. */
    def eol(from: Int): Int = {
      var i = from
      while (i + 1 < n) {
        if (bytes(i) == '\r' && bytes(i + 1) == '\n') return i
        i += 1
      }
      -1
    }
    def ascii(from: Int, until: Int): String =
      new String(bytes, from, until - from, "ISO-8859-1")
    val out = Vector.newBuilder[WarcRecord]
    var i = 0
    var count = 0
    var ok = true
    while (ok && count <= 1000000 && i < n) {
      val ve = eol(i)
      if (ve < 0 || !ascii(i, math.min(i + 5, n)).equals("WARC/")) {
        ok = false // junk after the last record (or not WARC at all)
      } else {
        val version = ascii(i, ve)
        var p = ve + 2
        var headers = Map.newBuilder[String, String]
        var contentLength = -1L
        var bad = false
        var inHeaders = true
        while (inHeaders && !bad) {
          val he = eol(p)
          if (he < 0) bad = true
          else if (he == p) { inHeaders = false; p += 2 } // blank line
          else {
            val line = ascii(p, he)
            val colon = line.indexOf(':')
            if (colon <= 0) bad = true
            else {
              val k = line.substring(0, colon).trim
              val v = line.substring(colon + 1).trim
              headers += (k -> v)
              if (k.equalsIgnoreCase("Content-Length")) {
                if (v.nonEmpty && v.forall(_.isDigit) && v.length <= 18)
                  contentLength = v.toLong
                else bad = true
              }
              p = he + 2
            }
          }
        }
        if (bad || contentLength < 0 ||
          p.toLong + contentLength + 4 > n) ok = false
        else {
          val payloadOff = p
          val after = p + contentLength.toInt
          // Mandatory record terminator: CRLF CRLF.
          if (!(bytes(after) == '\r' && bytes(after + 1) == '\n' &&
            bytes(after + 2) == '\r' && bytes(after + 3) == '\n')) ok = false
          else {
            out += WarcRecord(version, headers.result(), payloadOff,
              contentLength.toInt)
            count += 1
            i = after + 4
          }
        }
      }
    }
    val r = out.result()
    if (count > 1000000 || r.isEmpty) None else Some(r)
  }

  /** DataFrame record explode: each payload row yields one row per WARC
    * record with (record_ix, warc_version, warc_type, target_uri,
    * content_length, payload); unparseable payloads yield ONE row with
    * record_ix −1 and nulls (never dropped silently — the count audit
    * stays possible). `gzipped = true` decompresses first (`.warc.gz`).
    * Narrow per-partition pass, no shuffle. */
  def records(df: DataFrame, bytesCol: String = "bytes",
              gzipped: Boolean = false): DataFrame = {
    val bi = df.schema.fieldIndex(bytesCol)
    val schema = df.schema
      .add("record_ix", LongType).add("warc_version", StringType)
      .add("warc_type", StringType).add("target_uri", StringType)
      .add("content_length", LongType).add("payload", BinaryType)
    df.mapPartitions { it =>
      it.flatMap { row =>
        val raw = row.getAs[Array[Byte]](bi)
        val b = if (gzipped) gunzip(raw).orNull else raw
        val parsed = if (b == null) None else warcRecords(b)
        parsed match {
          case Some(recs) =>
            recs.iterator.zipWithIndex.map { case (r, ix) =>
              Row.fromSeq(row.toSeq :+ ix.toLong :+ r.version :+
                r.header("WARC-Type").orNull :+
                r.header("WARC-Target-URI").orNull :+
                r.payloadLength.toLong :+
                java.util.Arrays.copyOfRange(b, r.payloadOffset,
                  r.payloadOffset + r.payloadLength))
            }
          case None =>
            Iterator.single(Row.fromSeq(row.toSeq :+ -1L :+ null :+ null :+
              null :+ null :+ null))
        }
      }
    }(Encoders.row(schema))
  }
}
