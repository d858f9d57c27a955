package graft.store

import java.nio.file.Files
import graft.SparkSpec
import graft.operators.Dedup
import graft.plans.GraftExtensions

/** The durable PPJoin index must be RESULT-IDENTICAL to the
  * rebuild-per-call incremental form (same scoring core, frozen tables
  * round-tripped through parquet), recover its latest snapshot across a
  * process restart from the directory listing alone, and refuse to score
  * against an empty or partial index. */
class PrefixIndexStoreSpec extends SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("graft_pidx").toString

  private def docs = {
    val sparkSession = spark
    import sparkSession.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "the quick brown fox jumps over the lazy cat tonight"),
      (3L, "completely unrelated text about parquet generations here"),
      (4L, "another unrelated document mentioning spark and scala"),
      (5L, "the quick brown fox jumps over the lazy dog tonight again"),
      (6L, "fresh batch document with the quick brown fox jumps over the lazy dog tonight"),
      (7L, "fresh batch document with nothing in common whatsoever")
    ).toDF("doc_id", "text")
  }

  private def pairs(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1),
      BigDecimal(r.getDouble(2)).setScale(9, BigDecimal.RoundingMode.HALF_UP)))
      .toSet

  test("stored-index scoring equals the rebuild-per-call incremental form") {
    GraftExtensions.register(spark)
    val corpus = docs.filter("doc_id <= 5")
    val batch = docs.filter("doc_id >= 6")
    val store = new PrefixIndexStore(spark, tmp(), threshold = 0.3,
      name = "pidx_eq")
    store.snapshot(corpus)
    val stored = pairs(store.scoreBatch(batch))
    val rebuilt = pairs(Dedup.prefixJaccardIncremental(corpus, batch, 0.3))
    assert(stored === rebuilt)
    assert(stored.nonEmpty) // fixture must actually exercise the join
  }

  test("snapshot survives restart: a NEW store instance on the same path scores identically") {
    GraftExtensions.register(spark)
    val path = tmp()
    val corpus = docs.filter("doc_id <= 5")
    val batch = docs.filter("doc_id >= 6")
    val s1 = new PrefixIndexStore(spark, path, threshold = 0.3, name = "pidx_a")
    val g = s1.snapshot(corpus)
    val before = pairs(s1.scoreBatch(batch))
    // "Restart": fresh instance, state from the directory listing only.
    val s2 = new PrefixIndexStore(spark, path, threshold = 0.3, name = "pidx_b")
    assert(s2.latestSnapshot === Some(g))
    assert(pairs(s2.scoreBatch(batch)) === before)
  }

  test("re-snapshot advances the generation; scoring follows the latest corpus") {
    GraftExtensions.register(spark)
    val store = new PrefixIndexStore(spark, tmp(), threshold = 0.3,
      name = "pidx_gen")
    val batch = docs.filter("doc_id >= 6")
    val g0 = store.snapshot(docs.filter("doc_id <= 2"))
    val narrow = pairs(store.scoreBatch(batch))
    val g1 = store.snapshot(docs.filter("doc_id <= 5"))
    assert(g1 === g0 + 1)
    val full = pairs(store.scoreBatch(batch))
    assert(full === pairs(Dedup.prefixJaccardIncremental(
      docs.filter("doc_id <= 5"), batch, 0.3)))
    // Doc 5 is only in the second snapshot — the latest index must see it.
    assert(full.exists(_._2 == 5L) && !narrow.exists(_._2 == 5L))
    // Pinned older snapshot still serves its own corpus.
    assert(pairs(store.scoreBatch(batch, snapshotId = Some(g0))) === narrow)
  }

  test("scoring a retention-expired snapshot fails loud, never empty-dedup") {
    GraftExtensions.register(spark)
    // keepSnapshots=2, ParquetStore auto-clean every 10 appends ⇒ after 11
    // snapshots only the last two survive; snapshot 1 is gone from disk.
    val store = new PrefixIndexStore(spark, tmp(), threshold = 0.3,
      name = "pidx_ret", keepSnapshots = 2L)
    val corpus = docs.filter("doc_id <= 5")
    val batch = docs.filter("doc_id >= 6")
    val g0 = (1 to 11).map(_ => store.snapshot(corpus)).head
    val ex = intercept[IllegalStateException] {
      store.scoreBatch(batch, snapshotId = Some(g0))
    }
    assert(ex.getMessage.contains("expired"))
    // The surviving latest snapshot still scores correctly.
    assert(pairs(store.scoreBatch(batch)) ===
      pairs(Dedup.prefixJaccardIncremental(corpus, batch, 0.3)))
  }

  test("empty store refuses to score (loud, not empty-result)") {
    val store = new PrefixIndexStore(spark, tmp(), threshold = 0.3,
      name = "pidx_empty")
    intercept[IllegalStateException] {
      store.scoreBatch(docs.filter("doc_id >= 6"))
    }
    intercept[IllegalStateException] {
      store.appendDocs(docs.filter("doc_id <= 2")) // append needs a base
    }
  }

  test("append-only growth: deltas under the frozen order score exactly like a full index") {
    GraftExtensions.register(spark)
    val store = new PrefixIndexStore(spark, tmp(), threshold = 0.3,
      name = "pidx_append", keepSnapshots = 100L)
    val batch = docs.filter("doc_id >= 6")
    store.snapshot(docs.filter("doc_id <= 2"))
    store.appendDocs(docs.filter("doc_id = 3"))
    store.appendDocs(docs.filter("doc_id IN (4, 5)"))
    // Complete ⇒ the RESULT is a pure function of (corpus, batch,
    // threshold) — identical to the one-shot rebuild over the full corpus
    // even though the frozen base order differs from the true df order.
    val got = pairs(store.scoreBatch(batch))
    val want = pairs(Dedup.prefixJaccardIncremental(
      docs.filter("doc_id <= 5"), batch, 0.3))
    assert(got === want)
    assert(got.exists(_._2 == 5L), "delta-only docs must be matchable")
    // …and independent of HOW the same corpus was split into deltas.
    val store2 = new PrefixIndexStore(spark, tmp(), threshold = 0.3,
      name = "pidx_append2", keepSnapshots = 100L)
    store2.snapshot(docs.filter("doc_id <= 4"))
    store2.appendDocs(docs.filter("doc_id = 5"))
    assert(pairs(store2.scoreBatch(batch)) === want)
    // A restarted instance resolves the base chain from disk alone.
    val reopened = new PrefixIndexStore(spark,
      store.path, threshold = 0.3, name = "pidx_append_re")
    assert(pairs(reopened.scoreBatch(batch)) === want)
    // Re-snapshot resets the base: scoring at the new head reads ONLY the
    // fresh snapshot, not stale deltas.
    val g2 = store2.snapshot(docs.filter("doc_id <= 2"))
    assert(store2.baseOf(g2) === g2)
    assert(!pairs(store2.scoreBatch(batch)).exists(_._2 == 5L))
  }

  test("retention holes in the append chain fail loud, never partial-corpus dedup") {
    GraftExtensions.register(spark)
    // keepSnapshots=2 with default cleanFreq=10: after the 10th append the
    // BASE snapshot is deleted while recent deltas survive — scoring must
    // refuse the broken chain instead of silently matching a partial corpus.
    val store = new PrefixIndexStore(spark, tmp(), threshold = 0.3,
      name = "pidx_holes", keepSnapshots = 2L)
    store.snapshot(docs.filter("doc_id <= 4"))
    // Whichever side notices first — an appendDocs finding its base gone,
    // or scoreBatch finding the chain holed — the failure is loud and
    // names the remedy.
    val ex = intercept[IllegalStateException] {
      (1 to 10).foreach(_ => store.appendDocs(docs.filter("doc_id = 5")))
      store.scoreBatch(docs.filter("doc_id >= 6"))
    }
    assert(ex.getMessage.contains("re-snapshot"))
  }
}
