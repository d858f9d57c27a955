package graft

import org.scalatest.funsuite.AnyFunSuite

/** Static guards for [[Bench]]'s stdout contract. The driver keeps only a
  * 2000-char TAIL of combined stdout+stderr; the results line must fit with
  * slack for sbt's trailing "[success]" line and stray late log lines.
  * Round 7 shipped a 1820-char line the driver recorded as `parsed: null` —
  * this spec makes headline growth fail `sbt test` BEFORE a round ships,
  * and Bench's runtime gate (hard exit at >1500) backstops format drift
  * this spec's template might miss.
  */
class BenchSpec extends AnyFunSuite {

  /** The cross-round-comparable original queries — must never rotate out. */
  private val original14 = Seq(
    "q_count_by_key", "q_bucket_counts", "q_bucket_counts_fine",
    "q_rename_project", "q_append_count_json", "q_decode_bucket",
    "q_store_select_all", "q_store_sql", "q_text_stats", "q_ngram_counts",
    "q_dedup_near", "q_knn_topk", "q_knn_bucketed", "q_sql_join_agg")

  test("every bench name resolves and secondary is a headline subset") {
    val unknown = Bench.headline.filterNot(SparkEntry.queries.contains)
    assert(unknown.isEmpty, s"bench names not in SparkEntry.queries: $unknown")
    assert(Bench.headline.distinct.size == Bench.headline.size,
      "duplicate headline names")
    assert(Bench.secondary.distinct.size == Bench.secondary.size,
      "duplicate secondary names")
    val stray = Bench.secondary.filterNot(Bench.headline.contains)
    assert(stray.isEmpty, s"secondary names not in headline: $stray")
  }

  test("the original 14 cross-round queries stay in the reported headline") {
    val reported = Bench.headline.filterNot(Bench.secondary.contains)
    val missing = original14.filterNot(reported.contains)
    assert(missing.isEmpty, s"original-14 queries rotated out: $missing")
  }

  test("worst-case results line fits the driver tail budget with slack") {
    // Mirror of Bench.main's line template with pessimistic widths: every
    // query at a 4-char value (99.9 — wider than -1 and than any recorded
    // timing), 7-digit stream rows, 4-digit streaming seconds. If this
    // template drifts from Bench.main, the runtime >1500 hard gate still
    // fires — but this assert is the one that fails in `sbt test`, a round
    // earlier.
    val reported = Bench.headline.filterNot(Bench.secondary.contains)
    val qs = reported.map(n => s""""$n":99.9""").mkString("{", ",", "}")
    val line =
      s"""{"metric":"total","value":999.9,"unit":"sec","queries":$qs,"errors":{},""" +
      s""""stream_rows":9999999,"stream_sec":9999.9,"stream_rows_per_s":9999999.9,""" +
      s""""stream_sessions_rows":9999999,"stream_sessions_sec":9999.9,""" +
      s""""stream_sessions_rows_per_s":9999999.9,""" +
      s""""stream_dedup_rows":9999999,"stream_dedup_sec":9999.9,""" +
      s""""stream_dedup_rows_per_s":9999999.9,""" +
      s""""stream_join_rows":9999999,"stream_join_sec":9999.9,""" +
      s""""stream_join_rows_per_s":9999999.9,"sf":"/root/testdata/sf0.1"}"""
    assert(line.length <= 1450,
      s"worst-case results line is ${line.length} chars (> 1450 spec budget; " +
        "runtime hard gate is 1500) — rotate queries into Bench.secondary")
  }
}
