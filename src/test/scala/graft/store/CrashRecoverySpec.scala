package graft.store

import org.apache.spark.sql.functions._
import graft.{FsIO, NioFs, SparkSpec}
import graft.sources.Warc

object CrashFs {
  /** The injected death — distinct from any real IO failure class. */
  final class CrashPoint extends RuntimeException("injected crash")
}

/** The r16-verdict-#3 test double: an object-store-shaped [[FsIO]]
  * whose overwrite-rename is NON-atomic, with injectable crash points.
  *
  *   - `atomicSwap` models Hadoop-local / S3-shaped replace:
  *     delete(target) then rename(staging, target) — two operations.
  *     When `crashSwapTarget` suffix-matches the target, the call
  *     performs the DELETE, optionally copies `tornBytes` of the
  *     staging in (the copy-then-delete tear), and dies.
  *   - `rename` dies BEFORE doing anything when `crashRenameTarget`
  *     suffix-matches — the "crash between deleteRecursively and
  *     rename" window of the ParquetStore generation swaps.
  *   - After a crash fires, EVERY subsequent call throws too: a dead
  *     process performs no in-process recovery. `revive()` is the
  *     rerun.
  *
  * Suffix-matched triggers (not counters) so the executor-side closure
  * copies that ride writeFiles/erase tasks — which see a serialized
  * snapshot, not the driver's mutable state — never fire on their own
  * staging traffic: the spec aims each crash at one driver-side swap.
  */
final class CrashFs(inner: FsIO = NioFs) extends FsIO {
  @volatile var crashSwapTarget: String = null
  @volatile var crashRenameTarget: String = null
  @volatile var tornBytes: Int = -1
  @volatile var dead: Boolean = false
  def revive(): Unit = {
    dead = false; crashSwapTarget = null; crashRenameTarget = null
    tornBytes = -1
  }
  private def live(): Unit = if (dead) throw new CrashFs.CrashPoint

  override def resolve(dir: String, name: String): String =
    inner.resolve(dir, name)
  override def exists(path: String): Boolean = { live(); inner.exists(path) }
  override def isDirectory(path: String): Boolean = {
    live(); inner.isDirectory(path)
  }
  override def mkdirs(dir: String): Unit = { live(); inner.mkdirs(dir) }
  override def list(dir: String): Seq[String] = { live(); inner.list(dir) }
  override def size(path: String): Long = { live(); inner.size(path) }
  override def read(path: String): Array[Byte] = { live(); inner.read(path) }
  override def readRange(path: String, off: Long, len: Int): Array[Byte] = {
    live(); inner.readRange(path, off, len)
  }
  override def readRanges(path: String,
                          spans: Seq[(Long, Int)]): Seq[Array[Byte]] = {
    live(); inner.readRanges(path, spans)
  }
  override def write(path: String, bytes: Array[Byte]): Unit = {
    live(); inner.write(path, bytes)
  }
  override def atomicSwap(staging: String, target: String): Unit = {
    live()
    if (crashSwapTarget != null && target.endsWith(crashSwapTarget)) {
      inner.delete(target)
      if (tornBytes >= 0)
        inner.write(target, inner.read(staging).take(tornBytes))
      dead = true
      throw new CrashFs.CrashPoint
    }
    // The non-crashing path still models the non-atomic sequence.
    inner.delete(target)
    inner.rename(staging, target)
  }
  override def rename(src: String, target: String): Unit = {
    live()
    if (crashRenameTarget != null && target.endsWith(crashRenameTarget)) {
      dead = true
      throw new CrashFs.CrashPoint
    }
    inner.rename(src, target)
  }
  override def delete(path: String): Boolean = { live(); inner.delete(path) }
  override def deleteRecursively(path: String): Unit = {
    live(); inner.deleteRecursively(path)
  }
}

/** Crash-convergence of the swap protocols on a store WITHOUT atomic
  * overwrite-rename (r16 verdict #3 + advice #1/#2): every injected
  * crash leaves a state from which (a) readers either serve correct
  * bytes or REFUSE — never torn data, never silent misses — and (b)
  * the rerun converges to the correct final state. */
class CrashRecoverySpec extends SparkSpec {

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_crash_$tag").toString

  private def exportFixture(dir: String, fs: FsIO = NioFs): Unit = {
    val sparkSession = spark
    import sparkSession.implicits._
    val rows = (0 until 12).map { i =>
      (s"g${i % 2}", f"https://c.org/p/$i%02d", "2024-01-01T00:00:00Z",
        "text/plain", s"payload $i".getBytes("UTF-8"))
    }.toDF("file_group", "url", "warc_date", "content_type", "body")
    Warc.writeFiles(
      Warc.encodeResponses(rows, withCdx = true).localCheckpoint(true),
      dir, fs)
    ()
  }

  private def cdxFiles(dir: String) =
    spark.read.format("binaryFile").load(dir)
      .filter(col("path").endsWith(".cdx"))
      .select(regexp_extract(col("path"), "([^/]+)$", 1).as("path"),
        col("content"))

  test("sweepStaging refuses a stray whose target is missing; recoverStaging promotes it") {
    val dir = tmp("sweep")
    NioFs.write(NioFs.resolve(dir, ".staging_e_7_lost.bin"),
      Array[Byte](1, 2, 3))
    // Target missing → the stray is the only copy; sweep must keep it.
    Warc.sweepStaging(dir, ".staging_e_")
    assert(NioFs.exists(NioFs.resolve(dir, ".staging_e_7_lost.bin")))
    // Recovery promotes it into place.
    Warc.recoverStaging(dir, ".staging_e_")
    assert(!NioFs.exists(NioFs.resolve(dir, ".staging_e_7_lost.bin")))
    assert(NioFs.read(NioFs.resolve(dir, "lost.bin")).toSeq ===
      Seq[Byte](1, 2, 3))
    // Target present → the stray is redundant; sweep removes it.
    NioFs.write(NioFs.resolve(dir, ".staging_e_9_lost.bin"),
      Array[Byte](9))
    Warc.sweepStaging(dir, ".staging_e_")
    assert(!NioFs.exists(NioFs.resolve(dir, ".staging_e_9_lost.bin")))
    assert(NioFs.read(NioFs.resolve(dir, "lost.bin")).toSeq ===
      Seq[Byte](1, 2, 3))
    // A failing validator leaves the stray on disk, loudly — never a
    // silent promote of suspect bytes, never a delete.
    NioFs.write(NioFs.resolve(dir, ".staging_e_3_bad.warc"), "junk"
      .getBytes("UTF-8"))
    Warc.recoverStaging(dir, ".staging_e_",
      validate = (_, _) => false)
    assert(NioFs.exists(NioFs.resolve(dir, ".staging_e_3_bad.warc")))
    assert(!NioFs.exists(NioFs.resolve(dir, "bad.warc")))
  }

  test("zipnum: a rebuild crash BEFORE the summary swap leaves the old cluster fully servable (advice #2)") {
    val dir = tmp("zexp")
    val zn = tmp("zcluster")
    exportFixture(dir)
    Warc.writeZipnum(cdxFiles(dir), zn, shards = 2, blockLines = 3)
    val before = Warc.zipnumLookup(zn, "https://c.org/p/07",
      verifyExports = dir)
    assert(before.size === 1 && before.head.contains("/p/07 "))
    // Unchanged-source re-run that dies while LANDING the new
    // generation's shards — the r16 design overwrote live shards at
    // this point and served gunzip failures as silent empty lookups;
    // generation-unique names must leave the old cluster untouched.
    val cfs = new CrashFs
    cfs.crashRenameTarget = "-00000.gz"
    intercept[CrashFs.CrashPoint] {
      Warc.writeZipnum(cdxFiles(dir), zn, shards = 2, blockLines = 3,
        fs = cfs)
    }
    assert(!Warc.zipnumStale(zn, dir))
    val during = Warc.zipnumLookup(zn, "https://c.org/p/07",
      verifyExports = dir)
    assert(during === before, "old cluster must keep serving byte-identically")
    // Rerun converges: serves, fresh, and every orphaned shard from
    // the crashed generation is swept.
    Warc.writeZipnum(cdxFiles(dir), zn, shards = 2, blockLines = 3)
    assert(!Warc.zipnumStale(zn, dir))
    assert(Warc.zipnumLookup(zn, "https://c.org/p/07",
      verifyExports = dir) === before)
    val shardGens = NioFs.list(zn)
      .flatMap("^cdx-g(\\d+)-\\d{5}\\.gz$".r.findFirstMatchIn(_))
      .map(_.group(1).toLong).distinct
    assert(shardGens.size === 1, s"orphan generations survive: $shardGens")
  }

  test("zipnum: torn or deleted summary/manifest is refused, rerun converges") {
    val sparkSession = spark
    import sparkSession.implicits._
    val dir = tmp("texp")
    val zn = tmp("tcluster")
    exportFixture(dir)
    Warc.writeZipnum(cdxFiles(dir), zn, shards = 2, blockLines = 3)
    val good = Warc.zipnumLookup(zn, "https://c.org/p/03",
      verifyExports = dir)
    assert(good.size === 1)

    // (a) Copy-then-delete tear: half a summary lands, then death.
    val cfs = new CrashFs
    cfs.crashSwapTarget = "cluster.idx"
    cfs.tornBytes = 25
    intercept[CrashFs.CrashPoint] {
      Warc.writeZipnum(cdxFiles(dir), zn, shards = 2, blockLines = 3,
        fs = cfs)
    }
    assert(Warc.zipnumStale(zn, dir),
      "torn summary must flag stale via the manifest attestation")
    intercept[IllegalStateException] {
      Warc.zipnumLookup(zn, "https://c.org/p/03", verifyExports = dir)
    }
    Warc.writeZipnum(cdxFiles(dir), zn, shards = 2, blockLines = 3)
    assert(!Warc.zipnumStale(zn, dir))
    assert(Warc.zipnumLookup(zn, "https://c.org/p/03",
      verifyExports = dir) === good)

    // (b) Delete-then-rename death: the summary is GONE, the manifest
    // still stands — a committed cluster without its pointer must read
    // stale (refused), never "empty cluster, empty results".
    val cfs2 = new CrashFs
    cfs2.crashSwapTarget = "cluster.idx"
    intercept[CrashFs.CrashPoint] {
      Warc.writeZipnum(cdxFiles(dir), zn, shards = 2, blockLines = 3,
        fs = cfs2)
    }
    assert(!NioFs.exists(NioFs.resolve(zn, "cluster.idx")))
    assert(Warc.zipnumStale(zn, dir))
    intercept[IllegalStateException] {
      Warc.zipnumLookup(zn, "https://c.org/p/03", verifyExports = dir)
    }
    // Even WITHOUT the verify gate (the /cdx route never sets one),
    // a manifest with no summary must refuse — not answer "[]" for
    // every key (review r17 #2).
    intercept[IllegalStateException] {
      Warc.zipnumLookup(zn, "https://c.org/p/03")
    }
    intercept[IllegalStateException] {
      Warc.zipnumJoin(Seq("https://c.org/p/03").toDF("urlkey"), zn)
    }
    Warc.writeZipnum(cdxFiles(dir), zn, shards = 2, blockLines = 3)
    assert(!Warc.zipnumStale(zn, dir))

    // (c) Death between the summary and manifest swaps: the NEW
    // cluster is live and correct; it flags stale (conservative)
    // until the rerun re-stamps.
    val cfs3 = new CrashFs
    cfs3.crashSwapTarget = "cluster.manifest"
    intercept[CrashFs.CrashPoint] {
      Warc.writeZipnum(cdxFiles(dir), zn, shards = 2, blockLines = 3,
        fs = cfs3)
    }
    assert(Warc.zipnumStale(zn, dir))
    // Without the verify gate the committed summary still serves
    // correct bytes — the conservative flag is about attestation, not
    // torn data.
    assert(Warc.zipnumLookup(zn, "https://c.org/p/03") === good)
    Warc.writeZipnum(cdxFiles(dir), zn, shards = 2, blockLines = 3)
    assert(!Warc.zipnumStale(zn, dir))
    assert(Warc.zipnumLookup(zn, "https://c.org/p/03",
      verifyExports = dir) === good)
  }

  test("eraseExports: a crashed archive swap recovers with zero record loss (advice #1)") {
    val sparkSession = spark
    import sparkSession.implicits._
    val dir = tmp("eexp")
    exportFixture(dir)
    val td = Takedown.takedownStore(spark, tmp("etd"),
      tableName = "crash_td")
    td.reset()
    Takedown.request(td,
      Seq(("https://c.org/p/02", "dmca")).toDF("key", "reason"))
    val victims = Takedown.victimKeys(td).collect()
      .map(_.getString(0)).toSet
    // The erase rewrite dies between deleting g0.warc.gz and renaming
    // the staged rewrite in: the staging file now holds the ONLY copy
    // of the five surviving g0 records.
    val cfs = new CrashFs
    cfs.crashSwapTarget = "g0.warc.gz"
    intercept[CrashFs.CrashPoint] {
      Takedown.eraseOneArchive(dir, "g0.warc.gz", victims, cfs)
    }
    assert(!NioFs.exists(NioFs.resolve(dir, "g0.warc.gz")))
    val stray = NioFs.list(dir).filter(n =>
      n.startsWith(".staging_e_") && n.endsWith("g0.warc.gz"))
    assert(stray.size === 1, "the staged rewrite must survive the crash")
    // The RERUN (the driver's at-least-once retry) recovers the
    // archive from the staging file and completes the erase.
    assert(Takedown.eraseExports(spark, dir, td) >= 0L)
    assert(NioFs.exists(NioFs.resolve(dir, "g0.warc.gz")))
    val back = Warc.records(
      spark.read.format("binaryFile").load(dir)
        .filter(col("path").endsWith(".warc.gz"))
        .select(col("path"), col("content").as("bytes")),
      gzipped = true)
    val uris = back.select("target_uri").collect().map(_.getString(0)).toSet
    assert(!uris.contains("https://c.org/p/02"),
      "the victim must stay erased")
    assert(uris.size === 11,
      s"every non-victim record must survive the crash+rerun: $uris")
    assert(!NioFs.list(dir).exists(_.startsWith(".staging_e_")))
  }

  test("ParquetStore: a crashed generation swap is promoted at reopen") {
    import org.apache.spark.sql.types._
    val sparkSession = spark
    import sparkSession.implicits._
    val path = tmp("pstore")
    val schema = StructType(Seq(StructField("k", StringType),
      StructField("v", LongType)))
    def open(fs: FsIO) = new ParquetStore(spark, schema, path,
      tableName = "crash_store", collapseKeys = Seq("k"), fs = fs)
    val store = open(NioFs)
    store.reset()
    (1L to 3L).foreach { g =>
      store.append(Seq((s"k$g", g), ("shared", g)).toDF("k", "v"))
    }
    // eraseKeys dies between deleteRecursively(rst_id=2) and the
    // staged rename: generation 2's surviving rows exist only in the
    // multi-rewrite staging's rst_id=2 subdir (r17 layout — all
    // touched generations staged under one root with one top-level
    // _SUCCESS; the in-process rename fallback finds a dead process
    // too).
    val cfs = new CrashFs
    cfs.crashRenameTarget = "rst_id=2"
    val crashed = open(cfs)
    intercept[CrashFs.CrashPoint] {
      crashed.eraseKeys(Seq("k2").toDF("k").localCheckpoint(true),
        Seq("k"))
    }
    assert(!NioFs.exists(NioFs.resolve(path, "rst_id=2")))
    val multi = NioFs.resolve(path, ".staging_rw_multi")
    assert(NioFs.exists(NioFs.resolve(multi, "_SUCCESS")))
    assert(NioFs.exists(NioFs.resolve(multi, "rst_id=2")))
    // Worse still (review r17): deleteRecursively is not atomic — a
    // death MID-delete leaves a PARTIAL target directory. Recovery
    // must still prefer the _SUCCESS-marked staging (re-running the
    // swap), never keep the half-unlinked target and drop the only
    // complete copy.
    NioFs.mkdirs(NioFs.resolve(path, "rst_id=2"))
    NioFs.write(NioFs.resolve(NioFs.resolve(path, "rst_id=2"),
      "part-00000-torn.parquet"), Array[Byte](1, 2, 3))
    // Reopen = the rerun: construction promotes the staged copy — the
    // ERASED rewrite of generation 2, so the erase is effectively
    // committed — and, the loss-prevention point, generation 2's
    // NON-victim rows are back on disk instead of gone with the
    // deleted directory.
    val reopened = open(NioFs)
    assert(NioFs.exists(NioFs.resolve(path, "rst_id=2")))
    assert(!NioFs.exists(NioFs.resolve(path, ".staging_rw_multi")))
    val ks = reopened.latestPerKey(Seq("k")).select("k").collect()
      .map(_.getString(0)).toSet
    assert(ks === Set("k1", "k3", "shared"))
    val gen2 = reopened.selectAll.filter(col("v") === 2L)
      .select("k").collect().map(_.getString(0)).toSet
    assert(gen2 === Set("shared"),
      s"generation 2's surviving rows must be recovered: $gen2")
    assert(reopened.selectAll.count() === 5L)
    // The erase replays idempotently on top of the recovered state.
    reopened.eraseKeys(Seq("k2").toDF("k").localCheckpoint(true),
      Seq("k"))
    val after = reopened.latestPerKey(Seq("k")).select("k").collect()
      .map(_.getString(0)).toSet
    assert(after === Set("k1", "k3", "shared"))
  }

  test("ParquetStore: a crashed generation swap is promoted by the NEXT " +
       "in-process rewrite, not destroyed (advice r17, high)") {
    import org.apache.spark.sql.types._
    val sparkSession = spark
    import sparkSession.implicits._
    val path = tmp("pstore_inproc")
    val schema = StructType(Seq(StructField("k", StringType),
      StructField("v", LongType)))
    val cfs = new CrashFs
    val store = new ParquetStore(spark, schema, path,
      tableName = "crash_store_inproc", collapseKeys = Seq("k"), fs = cfs)
    store.reset()
    (1L to 3L).foreach { g =>
      store.append(Seq((s"k$g", g), ("shared", g)).toDF("k", "v"))
    }
    // First erase dies between deleteRecursively(rst_id=2) and the
    // staged rename; the in-process fallback dies too (dead-process
    // model). Generation 2's surviving rows now exist ONLY in the
    // multi-rewrite staging.
    cfs.crashRenameTarget = "rst_id=2"
    intercept[CrashFs.CrashPoint] {
      store.eraseKeys(Seq("k2").toDF("k").localCheckpoint(true), Seq("k"))
    }
    assert(!NioFs.exists(NioFs.resolve(path, "rst_id=2")))
    assert(NioFs.exists(NioFs.resolve(path, ".staging_rw_multi")))
    // The process stays ALIVE (no reopen, so open-time recovery never
    // runs) and issues another mutation on the SAME handle — the next
    // trigger's ring trim in the advice scenario. Before the fix this
    // deleted the staging outright: generation 2's non-victim rows
    // ("shared", 2) were gone permanently.
    cfs.revive()
    store.eraseKeys(Seq("k3").toDF("k").localCheckpoint(true), Seq("k"))
    val ks = store.latestPerKey(Seq("k")).select("k").collect()
      .map(_.getString(0)).toSet
    assert(ks === Set("k1", "shared"), s"both erases applied: $ks")
    val gen2 = store.selectAll.filter(col("v") === 2L)
      .select("k").collect().map(_.getString(0)).toSet
    assert(gen2 === Set("shared"),
      s"generation 2's surviving rows must be recovered, not destroyed: $gen2")
    assert(!NioFs.exists(NioFs.resolve(path, ".staging_rw_multi")))
  }

  test("ParquetStore: crashed COMPACT and COLLAPSE swaps are promoted at reopen too") {
    import org.apache.spark.sql.types._
    val sparkSession = spark
    import sparkSession.implicits._
    val schema = StructType(Seq(StructField("k", StringType),
      StructField("v", LongType)))

    // Compact: .staging_cp_<g> holds the repartitioned generation.
    val cpPath = tmp("pcompact")
    def openCp(fs: FsIO) = new ParquetStore(spark, schema, cpPath,
      tableName = "crash_compact", fs = fs)
    val cp = openCp(NioFs)
    cp.reset()
    cp.append((1L to 6L).map(i => (s"k$i", i)).toDF("k", "v")
      .repartition(4))
    val cfs = new CrashFs
    cfs.crashRenameTarget = "rst_id=1"
    intercept[CrashFs.CrashPoint] { openCp(cfs).compact(1L) }
    assert(!NioFs.exists(NioFs.resolve(cpPath, "rst_id=1")))
    val cpBack = openCp(NioFs)
    assert(cpBack.selectAll.count() === 6L,
      "the compacted generation must be back after recovery")
    assert(!NioFs.exists(NioFs.resolve(cpPath, ".staging_cp_1")))

    // Collapse: .staging_cl_<target> holds the folded base.
    val clPath = tmp("pcollapse")
    def openCl(fs: FsIO) = new ParquetStore(spark, schema, clPath,
      tableName = "crash_collapse", collapseKeys = Seq("k"), fs = fs)
    val cl = openCl(NioFs)
    cl.reset()
    (1L to 4L).foreach(g =>
      cl.append(Seq(("shared", g), (s"k$g", g)).toDF("k", "v")))
    val cfs2 = new CrashFs
    cfs2.crashRenameTarget = "rst_id=3"
    intercept[CrashFs.CrashPoint] {
      openCl(cfs2).collapseToLatest(Seq("k"), keepRecent = 1)
    }
    assert(!NioFs.exists(NioFs.resolve(clPath, "rst_id=3")))
    val clBack = openCl(NioFs)
    val latest = clBack.latestPerKey(Seq("k")).select("k", "v").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(latest === Map("shared" -> 4L, "k1" -> 1L, "k2" -> 2L,
      "k3" -> 3L, "k4" -> 4L),
      s"latest-per-key must survive the crashed collapse: $latest")
    assert(!NioFs.exists(NioFs.resolve(clPath, ".staging_cl_3")))
  }
}
