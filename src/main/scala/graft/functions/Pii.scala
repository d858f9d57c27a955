package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction over text columns — the scrubbing pass a
  * training-data pipeline runs before anything leaves the raw zone.
  *
  * All patterns are deliberately RE2-safe (no backreferences, no
  * lookaround) so the SAME pattern string runs under Spark's Java regex
  * and RE2-based engines (DuckDB, Go services) with identical matches —
  * redaction must be reproducible by the audit side, not just the
  * pipeline side. Everything here is built-in `regexp_*` functions:
  * narrow, codegen'd, zero shuffle.
  */
object Pii {

  /** user@host.tld — conservative: requires a dotted TLD of letters. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4 (unvalidated octet range — a scrubber over-redacts
    * rather than leaking 999.1.1.1-style near-addresses). */
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Long digit runs (account / phone / government ids): 9+ digits. */
  val LongNumRe = "\\b\\d{9,}\\b"

  /** Number of matches of `re` in `c` (0 for no match, null-safe). */
  def countMatches(c: Column, re: String): Column =
    size(regexp_extract_all(c, lit(re), lit(0)))

  /** Redact in fixed order — email first (its local part may contain
    * digits that would otherwise half-match the number patterns), then
    * IPv4 (dotted digits), then bare long numbers. Each class gets a
    * distinct token so downstream loss-analysis can count what was
    * removed without re-scanning originals. */
  def redact(c: Column): Column = {
    val e = regexp_replace(c, EmailRe, "<EMAIL>")
    val i = regexp_replace(e, Ipv4Re, "<IP>")
    regexp_replace(i, LongNumRe, "<NUM>")
  }
}
