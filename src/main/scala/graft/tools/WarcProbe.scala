package graft.tools

import graft.sources.{Warc, WarcPack}

/** Single-core throughput probe for the WARC ingest layer (r10): build a
  * realistic multi-record `.warc.gz`-shaped buffer (per-record gzip
  * members, ~1 KB response payloads — the Common Crawl shape), then time
  * [[graft.sources.Warc.gunzip]] + [[graft.sources.Warc.warcRecords]]
  * over repeated passes and report MB/s of compressed input per core —
  * the number that divides into a cluster's aggregate ingest rate.
  * Results go to SCALE.md. Not part of the driver contract; no Spark
  * session (the DataFrame form is a narrow per-partition map over
  * exactly this code). */
object WarcProbe {
  def main(args: Array[String]): Unit = {
    val records = if (args.nonEmpty) args(0).toInt else 20000
    val payloadBytes = if (args.length > 1) args(1).toInt else 1024
    val rnd = new scala.util.Random(42)
    // One gzip member per record — the .warc.gz convention.
    val members = (0 until records).map { i =>
      val body = new Array[Byte](payloadBytes)
      rnd.nextBytes(body)
      // Printable-ish payloads compress like text; mask to ASCII range.
      var k = 0
      while (k < body.length) { body(k) = ((body(k) & 0x3f) + 32).toByte; k += 1 }
      WarcPack.gzipBytes(WarcPack.warcFile(i.toLong, body))
    }
    val blob: Array[Byte] = Array.concat(members: _*)
    val inflated = Warc.gunzip(blob, maxOut = Int.MaxValue).get
    println(f"[warcprobe] $records%d records, compressed ${blob.length / 1e6}%.1f MB, " +
      f"inflated ${inflated.length / 1e6}%.1f MB")
    def pass(): (Double, Int) = {
      val t0 = System.nanoTime()
      val b = Warc.gunzip(blob, maxOut = Int.MaxValue).get
      val rs = Warc.warcRecords(b).get
      ((System.nanoTime() - t0) / 1e9, rs.length)
    }
    pass() // warm-up (JIT)
    val times = (1 to 3).map(_ => pass())
    require(times.forall(_._2 == records * 2), "record count mismatch")
    val best = times.map(_._1).min
    println(f"[warcprobe] gunzip+parse best of 3: $best%.2f s = " +
      f"${blob.length / 1e6 / best}%.1f MB/s compressed " +
      f"(${inflated.length / 1e6 / best}%.1f MB/s inflated) per core")
  }
}
