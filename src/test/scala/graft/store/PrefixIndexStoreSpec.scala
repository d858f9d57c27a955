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

  test("retention is keyed to FULL snapshots: appends never expire their own base (ADVICE r9)") {
    GraftExtensions.register(spark)
    // r9 passed keepSnapshots as a ParquetStore cleanInterval, which counts
    // GENERATIONS — ~9 appendDocs at the default cleanFreq=10 deleted the
    // live base out from under its append chain. Now retention only drops
    // whole superseded snapshots, so an arbitrarily long append chain at
    // DEFAULTS keeps working.
    val store = new PrefixIndexStore(spark, tmp(), threshold = 0.3,
      name = "pidx_chain", keepSnapshots = 2L)
    store.snapshot(docs.filter("doc_id <= 2"))
    (3 to 5).foreach(i => store.appendDocs(docs.filter(s"doc_id = $i")))
    (1 to 10).foreach(_ => store.appendDocs(docs.filter("doc_id = 999"))) // empty deltas
    val batch = docs.filter("doc_id >= 6")
    assert(pairs(store.scoreBatch(batch)) ===
      pairs(Dedup.prefixJaccardIncremental(docs.filter("doc_id <= 5"), batch, 0.3)))
    // Re-snapshots still retire OLD snapshots with their whole chains —
    // THREE more full snapshots push the first (and its 13 deltas) past
    // the keepSnapshots=2 window AND the one-snapshot grace (r11): the
    // first clean that would delete it is lagged one cycle for
    // concurrent readers.
    val g1 = store.snapshot(docs.filter("doc_id <= 5"))
    val g2 = store.snapshot(docs.filter("doc_id <= 5"))
    val g3 = store.snapshot(docs.filter("doc_id <= 5"))
    assert(store.fullSnapshots === Seq(g1, g2, g3))
    val ex = intercept[IllegalStateException] {
      store.scoreBatch(batch, snapshotId = Some(1L))
    }
    assert(ex.getMessage.contains("expired") || ex.getMessage.contains("manifest"))
    // A base deleted OUT-OF-BAND (disk corruption, manual rm) still fails
    // loud at scoring, never silently dedups against a partial corpus.
    val store2 = new PrefixIndexStore(spark, tmp(), threshold = 0.3,
      name = "pidx_holes2", keepSnapshots = 2L)
    val b0 = store2.snapshot(docs.filter("doc_id <= 4"))
    store2.appendDocs(docs.filter("doc_id = 5"))
    deleteDir(java.nio.file.Paths.get(store2.path, "prefix", s"rst_id=$b0"))
    val ex2 = intercept[IllegalStateException] { store2.scoreBatch(batch) }
    assert(ex2.getMessage.contains("re-snapshot"))
    // …including a dfs-ONLY hole: the base dfs generation IS the frozen
    // order — scoring without it would re-rank the batch against nothing
    // and silently miss pairs (r10 guard).
    val store3 = new PrefixIndexStore(spark, tmp(), threshold = 0.3,
      name = "pidx_holes3", keepSnapshots = 2L)
    val c0 = store3.snapshot(docs.filter("doc_id <= 4"))
    store3.appendDocs(docs.filter("doc_id = 5"))
    deleteDir(java.nio.file.Paths.get(store3.path, "dfs", s"rst_id=$c0"))
    val ex3 = intercept[IllegalStateException] { store3.scoreBatch(batch) }
    assert(ex3.getMessage.contains("frozen order"))
  }

  private def deleteDir(dir: java.nio.file.Path): Unit = {
    val s = Files.walk(dir)
    try s.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(p => { Files.deleteIfExists(p); () })
    finally s.close()
  }

  test("crash BETWEEN appends self-heals: orphans are GC'd, the next snapshot succeeds") {
    GraftExtensions.register(spark)
    val path = tmp()
    val corpus = docs.filter("doc_id <= 5")
    val batch = docs.filter("doc_id >= 6")
    val store = new PrefixIndexStore(spark, path, threshold = 0.3,
      name = "pidx_crash")
    val g = store.snapshot(corpus)
    val committed = pairs(store.scoreBatch(batch))
    // Simulate a crash between the three lockstep appends: the NEXT
    // generation exists in the hashed store (first append completed) but
    // not in dfs/prefix, and no commit manifest was written. This is the
    // exact on-disk state the r9 code failed loud on, demanding a manual
    // rebuild.
    val sparkSession = spark
    import sparkSession.implicits._
    Seq((999L, Array(1L, 2L, 3L))).toDF("cid", "hs")
      .write.parquet(s"$path/hashed/rst_id=${g + 1}")
    // Reads keep serving the last COMMITTED snapshot (same instance and
    // a restarted one).
    assert(store.latestSnapshot === Some(g))
    assert(pairs(store.scoreBatch(batch)) === committed)
    val reopened = new PrefixIndexStore(spark, path, threshold = 0.3,
      name = "pidx_crash_re")
    assert(reopened.latestSnapshot === Some(g))
    assert(pairs(reopened.scoreBatch(batch)) === committed)
    // The next write recovers WITHOUT manual intervention: the orphan is
    // GC'd, counters realign, and the new snapshot lands as g+1.
    val g2 = reopened.snapshot(corpus)
    assert(g2 === g + 1)
    assert(pairs(reopened.scoreBatch(batch)) === committed)
    // The orphan's fake doc 999 must be gone, not resurrected into g+1.
    assert(!pairs(reopened.scoreBatch(batch)).exists(_._2 == 999L))
    // Same self-healing through the append path on a fresh crash.
    Seq((998L, Array(1L, 2L))).toDF("cid", "hs")
      .write.parquet(s"$path/hashed/rst_id=${g2 + 1}")
    val g3 = reopened.appendDocs(docs.filter("doc_id = 5"))
    assert(g3 === g2 + 1)
    assert(!pairs(reopened.scoreBatch(batch)).exists(_._2 == 998L))
    // A crash INSIDE commit() (manifest written, rename not reached)
    // strands a `.tmp_<g>` staging file that committedIds filters out —
    // the next write's recovery must sweep it, not let crash debris
    // accumulate for the life of the store.
    val stranded = java.nio.file.Paths.get(path, "_commits", s".tmp_${g3 + 1}")
    java.nio.file.Files.writeString(stranded, s"${g3 + 1}\n")
    val g4 = reopened.appendDocs(docs.filter("doc_id = 4"))
    assert(g4 === g3 + 1)
    assert(!java.nio.file.Files.exists(stranded))
  }

  test("legacy pre-manifest directories are adopted, not invalidated") {
    GraftExtensions.register(spark)
    val path = tmp()
    val corpus = docs.filter("doc_id <= 5")
    val batch = docs.filter("doc_id >= 6")
    val store = new PrefixIndexStore(spark, path, threshold = 0.3,
      name = "pidx_legacy")
    val g = store.snapshot(corpus)
    store.appendDocs(docs.filter("doc_id = 5"))
    val before = pairs(store.scoreBatch(batch))
    // Strip the manifests — the r9 on-disk layout.
    deleteDir(java.nio.file.Paths.get(path, "_commits"))
    val reopened = new PrefixIndexStore(spark, path, threshold = 0.3,
      name = "pidx_legacy_re")
    assert(reopened.latestSnapshot === Some(g + 1))
    assert(pairs(reopened.scoreBatch(batch)) === before)
  }

  /** Drift fixture for the pruning-decay probe. Every doc is 12 words =
    * 10 distinct word-3-gram shingles; at t=0.8 the prefix keeps each
    * doc's 3 RAREST shingles under the governing df order.
    *
    *   - Base: 40 texts × 2 exact copies (their shingles df=2) + one doc
    *     carrying phrase P = "alpha beta gamma delta epsilon" (P's
    *     shingles df=1 — the rarest thing in the base order).
    *   - Drifted docs (deltas AND probe batches): P + the 7-word tail of
    *     a base text, disjoint tail ranges per family. Under the FROZEN
    *     base order P (df=1) beats the tails (df=2) into every prefix →
    *     all (probe × delta) pairs become candidates. Under a FRESH order
    *     P is common (df ≈ #drifted docs) and the corpus-known tails
    *     (df 2-3) take the prefix slots → the same distribution stops
    *     colliding. That flip is exactly the pruning decay the probe must
    *     measure and the re-snapshot must cure. */
  private def word(i: Int, k: Int) = s"c${i}x$k"
  private def baseText(i: Int) = (0 until 12).map(word(i, _)).mkString(" ")
  private def drifted(i: Int) =
    "alpha beta gamma delta epsilon " + (5 until 12).map(word(i, _)).mkString(" ")
  private def df(rows: Seq[(Long, String)]) = {
    val sparkSession = spark
    import sparkSession.implicits._
    rows.toDF("doc_id", "text")
  }

  test("pruningDecay: accumulated drift trips the re-snapshot trigger; a re-snapshot restores it") {
    GraftExtensions.register(spark)
    val store = new PrefixIndexStore(spark, tmp(), threshold = 0.8,
      name = "pidx_decay", keepSnapshots = 3L)
    val base = df((0 until 40).flatMap(i => Seq(
      (2L * i, baseText(i)), (2L * i + 1, baseText(i)))) :+ (999L, drifted(100)))
    val deltas = df((0 until 20).map(m => (3000L + m, drifted(m))))
    val probe = df((0 until 10).map(k => (9000L + k, drifted(20 + k))))
    val freshDeltas = df((0 until 20).map(m => (5000L + m, drifted(30 + m / 2))))
    store.snapshot(base)
    // No deltas: ratio is 1 by definition, trigger quiet.
    val d0 = store.pruningDecay(probe)
    assert(d0.deltaDocs === 0L && d0.ratio === 1.0)
    assert(!store.shouldResnapshot(probe))
    // 20 drifted docs under the frozen order: P is still ranked rarest, so
    // every (probe, delta) pair becomes a candidate — the measured
    // disproportion the r9 scaladoc only DESCRIBED.
    store.appendDocs(deltas)
    val d1 = store.pruningDecay(probe)
    assert(d1.deltaCandidates >= 150L,
      s"drifted deltas must blow up candidates, got $d1")
    assert(d1.ratio > 3.0, s"decay ratio must trip the trigger, got $d1")
    assert(store.shouldResnapshot(probe))
    // Candidates are pruning WASTE, not matches — scoring stays exact and
    // empty throughout (probe docs are below threshold vs everything).
    assert(store.scoreBatch(probe).count() === 0L)
    // Re-snapshot re-ranks P as common; the SAME drifted distribution now
    // appends without candidate blowup — the trigger goes quiet.
    store.snapshot(base.union(deltas))
    store.appendDocs(freshDeltas)
    val d2 = store.pruningDecay(probe)
    assert(d2.deltaDocs === 20L)
    assert(d2.deltaCandidates < d1.deltaCandidates / 10,
      s"fresh order must collapse candidate volume, got $d2 vs $d1")
    assert(d2.ratio <= 3.0, s"fresh order must restore pruning, got $d2")
    assert(!store.shouldResnapshot(probe))
    // Still exact after the churn.
    assert(store.scoreBatch(probe).count() === 0L)
  }
test("grace retention: a pinned reader survives one concurrent snapshot+clean cycle (r11)") {
    GraftExtensions.register(spark)
    val dir = tmp()
    val writer = new PrefixIndexStore(spark, dir, threshold = 0.3,
      name = "pidx_gw", keepSnapshots = 1L)
    val corpus = docs.filter("doc_id <= 5")
    val batch = docs.filter("doc_id >= 6")
    val g0 = writer.snapshot(corpus)
    // A reader in "another process": a second, read-only instance on
    // the same path (the contract is single-WRITER, readers free).
    val reader = new PrefixIndexStore(spark, dir, threshold = 0.3,
      name = "pidx_gr", keepSnapshots = 1L)
    val expect = pairs(Dedup.prefixJaccardIncremental(corpus, batch, 0.3))
    assert(pairs(reader.scoreBatch(batch, snapshotId = Some(g0))) === expect)
    // One full snapshot+clean cycle on the writer: g0 exits the
    // keepSnapshots=1 window but stays on disk as the grace snapshot —
    // the pinned reader still scores against a complete chain.
    writer.snapshot(corpus)
    assert(pairs(reader.scoreBatch(batch, snapshotId = Some(g0))) === expect)
    // A second cycle retires it: the longer-pinned reader fails LOUD,
    // never against a partial corpus.
    writer.snapshot(corpus)
    val ex = intercept[IllegalStateException] {
      reader.scoreBatch(batch, snapshotId = Some(g0))
    }
    assert(ex.getMessage.contains("expired") ||
      ex.getMessage.contains("manifest"))
    // Un-pinned, the reader follows the latest committed generation.
    assert(pairs(reader.scoreBatch(batch)) === expect)
  }
}
