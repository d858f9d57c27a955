package graft.store

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.types._
import graft.SparkSpec

/** WRITER FENCING (r17): the single-writer contract, enforced. A
  * successor opening the store fenced claims a strictly higher epoch;
  * the stale handle's next mutation — ANY mutator — throws
  * [[FencedWriterException]] and changes nothing, instead of
  * interleaving generation swaps with the successor's. A crashed
  * writer needs no release step (fencing, not locking: takeover is
  * just a higher claim), and the fencing state is invisible unless
  * opted into. */
class FencingSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("k", StringType), StructField("n", LongType)))

  private def tmp(): String =
    Files.createTempDirectory("graft_fence").toString

  private def batch(rows: (String, Long)*) = {
    val sparkSession = spark
    import sparkSession.implicits._
    rows.toDF("k", "n")
  }

  private def openFenced(path: String, name: String) =
    new ParquetStore(spark, schema, path, tableName = name,
      cleanFreq = 1000L, fenced = true)

  test("takeover fences the stale writer out of every mutator, mutating nothing") {
    val path = tmp()
    val a = openFenced(path, "fence_a")
    a.append(batch("a" -> 1L, "b" -> 2L))
    a.recordAppliedFloor("lineage", 1L)

    // Successor: sees the predecessor's data (counter restored from the
    // listing) and takes over without any release step from `a`.
    val b = openFenced(path, "fence_b")
    assert(b.currentRstId === 2L)
    b.append(batch("c" -> 3L))

    val before = b.selectAll.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(before === Set(("a", 1L, 1L), ("b", 2L, 1L), ("c", 3L, 2L)))

    // Every stale-handle mutator must refuse — commit-side fencing, so
    // the check runs before anything is staged, deleted, or renamed.
    val muts: Seq[(String, () => Any)] = Seq(
      "append" -> (() => a.append(batch("x" -> 9L))),
      "merge" -> (() => a.merge(batch("a" -> 9L), Seq("k"))),
      "eraseKeys" -> (() => a.eraseKeys(batch("a" -> 1L), Seq("k"))),
      "clean" -> (() => a.clean(1L)),
      "cleanBelow" -> (() => a.cleanBelow(100L)),
      "truncateAbove" -> (() => a.truncateAbove(0L)),
      "compact" -> (() => a.compact(1L)),
      "collapseToLatest" -> (() => a.collapseToLatest(Seq("k"), 0)),
      "reset" -> (() => a.reset()),
      "recordAppliedFloor" -> (() => a.recordAppliedFloor("lineage", 2L)),
      "releaseAppliedFloor" -> (() => a.releaseAppliedFloor("lineage")))
    muts.foreach { case (name, m) =>
      val e = intercept[FencedWriterException](m())
      assert(e.heldEpoch === 1L && e.liveEpoch === 2L, name)
    }
    // Nothing moved: the successor's view is byte-stable through all
    // eleven refusals, and the floor file survived the refused release.
    val after = b.selectAll.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(after === before)
    assert(b.appliedFloor === Some(1L))
    // A fenced-OUT handle can still READ (fencing gates commits only).
    assert(a.selectAll.count() === 3L)
  }

  test("default (unfenced) stores write no fencing state at all") {
    val path = tmp()
    val s = new ParquetStore(spark, schema, path, tableName = "fence_off",
      cleanFreq = 1000L)
    s.append(batch("a" -> 1L))
    assert(!Files.exists(Paths.get(path, ".writer_epochs")))
  }

  test("claim race: a swept staging (missing-source rename) retries above the winner") {
    // The winner's post-claim sweep deletes every .claim_* stray —
    // including a concurrent loser's still-pending temp — so the
    // loser's rename fails with a MISSING SOURCE, not an existing
    // target. The retry loop must treat both as "lost the race"
    // (review r17 session pass: only the target-exists shape was
    // caught, so the primary concurrent-open path crashed).
    val dir = tmp()
    val inner = graft.FsIO.local
    val fs = new graft.FsIO {
      var first = true
      def resolve(d: String, n: String) = inner.resolve(d, n)
      def exists(p: String) = inner.exists(p)
      def isDirectory(p: String) = inner.isDirectory(p)
      def mkdirs(d: String) = inner.mkdirs(d)
      def list(d: String) = inner.list(d)
      def size(p: String) = inner.size(p)
      def read(p: String) = inner.read(p)
      def readRange(p: String, o: Long, l: Int) = inner.readRange(p, o, l)
      def readRanges(p: String, s: Seq[(Long, Int)]) = inner.readRanges(p, s)
      def write(p: String, b: Array[Byte]) = inner.write(p, b)
      def atomicSwap(s: String, t: String) = inner.atomicSwap(s, t)
      def delete(p: String) = inner.delete(p)
      def deleteRecursively(p: String) = inner.deleteRecursively(p)
      def rename(src: String, target: String): Unit =
        if (first) {
          first = false
          // Concurrent winner: lands epoch.1 and sweeps our staging
          // between our write and our rename.
          inner.write(inner.resolve(
            inner.resolve(dir, ".writer_epochs"), "epoch.1"),
            "winner".getBytes)
          inner.delete(src)
          throw new java.nio.file.NoSuchFileException(src)
        } else inner.rename(src, target)
    }
    val fence = new WriterFence(dir, "race-loser", fs)
    assert(fence.epoch === 2L) // retried above the winner, not crashed
    intercept[FencedWriterException] {
      new WriterFence(dir, "late", fs); fence.check()
    }
  }

  test("claim resumes above a foreign epoch and sweeps crashed claim staging") {
    val path = tmp()
    val epochs = Paths.get(path, ".writer_epochs")
    Files.createDirectories(epochs)
    // A predecessor's claim, plus the torn staging of a claimant that
    // died mid-claim (dot-prefixed — never parsed as an epoch, so it
    // can only waste bytes, and the next winner sweeps it).
    Files.write(epochs.resolve("epoch.41"), "old writer".getBytes)
    Files.write(epochs.resolve(".claim_deadbeef"), "torn".getBytes)
    val s = openFenced(path, "fence_resume")
    s.append(batch("a" -> 1L))
    val names = Files.list(epochs).toArray.toSeq
      .map(_.asInstanceOf[java.nio.file.Path].getFileName.toString).sorted
    assert(names === Seq("epoch.41", "epoch.42"))
  }

  test("WriterFence coordinates non-store directories (the zipnum rebuild pattern)") {
    // The cluster/export dirs carry the same one-writer contract as
    // the stores; a rebuild coordinator claims a fence on the dir and
    // check()s before each commit-side step.
    val dir = tmp()
    val a = new WriterFence(dir, "rebuild-a")
    assert(a.epoch === 1L)
    a.check() // sole claimant: serves
    val b = new WriterFence(dir, "rebuild-b")
    assert(b.epoch === 2L)
    b.check()
    val e = intercept[FencedWriterException](a.check())
    assert(e.heldEpoch === 1L && e.liveEpoch === 2L)
    // The fencing state never collides with payload names (dot-dir).
    assert(Files.list(Paths.get(dir)).toArray.toSeq
      .map(_.asInstanceOf[java.nio.file.Path].getFileName.toString) ===
      Seq(".writer_epochs"))
  }

  test("PrefixIndexStore: the three-store lockstep group is fenced as ONE unit") {
    graft.plans.GraftExtensions.register(spark)
    val sparkSession = spark
    import sparkSession.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "the quick brown fox jumps over the lazy cat tonight"),
      (3L, "completely unrelated text about parquet generations here"))
      .toDF("doc_id", "text")
    val path = tmp()
    val a = new PrefixIndexStore(spark, path, threshold = 0.3,
      name = "pidx_fence_a", fenced = true)
    a.snapshot(corpus)
    val b = new PrefixIndexStore(spark, path, threshold = 0.3,
      name = "pidx_fence_b", fenced = true)
    // The stale coordinator fails BEFORE recover() touches anything —
    // a per-sub-store fence would instead let it interleave between
    // two sub-appends of one lockstep commit.
    intercept[FencedWriterException] {
      a.appendDocs(corpus.filter("doc_id = 3"))
    }
    intercept[FencedWriterException] { a.snapshot(corpus) }
    // The successor owns the group: full snapshot + delta both land.
    b.snapshot(corpus)
    b.appendDocs(corpus.filter("doc_id = 3"))
    // One fence at the ROOT — the sub-store dirs carry no epochs.
    assert(Files.exists(Paths.get(path, ".writer_epochs")))
    Seq("hashed", "dfs", "prefix").foreach { sub =>
      assert(!Files.exists(Paths.get(path, sub, ".writer_epochs")), sub)
    }
  }

  test("epoch audit trail stays bounded across takeover chains") {
    val path = tmp()
    (1 to 7).foreach { i => openFenced(path, s"fence_chain$i") }
    val epochs = Paths.get(path, ".writer_epochs")
    val live = Files.list(epochs).toArray.toSeq
      .map(_.asInstanceOf[java.nio.file.Path].getFileName.toString)
      .filter(_.startsWith("epoch."))
      .map(_.stripPrefix("epoch.").toLong).sorted
    // Claim N sweeps epochs ≤ N−4: the newest claim plus a short
    // takeover audit trail survive, never the whole chain.
    assert(live.max === 7L)
    assert(live === Seq(4L, 5L, 6L, 7L))
  }
}
