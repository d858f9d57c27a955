package graft

import org.apache.spark.sql.functions.col

/** The durability facade (r15 verdict #3): the Hadoop backend must be
  * behavior-identical to the nio backend on every primitive the
  * compliance machinery leans on — and the operators that swap bytes
  * (writeFiles, writeZipnum/zipnumLookup, eraseExports, ParquetStore
  * generations/floors) must run unchanged through it. Local paths here
  * resolve to Hadoop's LocalFileSystem — the behavior-parity gate the
  * HDFS deployment rides. */
class FsIOSpec extends SparkSpec {

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_fsio_$tag").toString

  private def primitives(fs: FsIO, dir: String): Unit = {
    fs.mkdirs(fs.resolve(dir, "sub"))
    assert(fs.isDirectory(fs.resolve(dir, "sub")))
    val f = fs.resolve(dir, "a.bin")
    val data = Array.tabulate[Byte](1000)(i => (i % 121).toByte)
    fs.write(f, data)
    assert(fs.exists(f) && fs.size(f) === 1000L)
    assert(fs.read(f).toSeq === data.toSeq)
    // Positioned reads: exactly the requested ranges, one open channel
    // for a batch.
    assert(fs.readRange(f, 10, 5).toSeq === data.slice(10, 15).toSeq)
    assert(fs.readRanges(f, Seq((0L, 3), (997L, 3)))
      .map(_.toSeq) === Seq(data.take(3).toSeq, data.drop(997).toSeq))
    // Overwrite-write, atomic swap over an existing target, plain
    // rename to a fresh name.
    fs.write(f, Array[Byte](1, 2))
    assert(fs.size(f) === 2L)
    val stage = fs.resolve(dir, ".stage")
    fs.write(stage, Array[Byte](9, 9, 9))
    fs.atomicSwap(stage, f)
    assert(!fs.exists(stage) && fs.read(f).toSeq === Seq[Byte](9, 9, 9))
    fs.rename(f, fs.resolve(dir, "b.bin"))
    assert(!fs.exists(f) && fs.exists(fs.resolve(dir, "b.bin")))
    // rename is NO-REPLACE by contract (review r17): a collision must
    // fail loudly, never clobber a live target — both backends.
    fs.write(fs.resolve(dir, "c.bin"), Array[Byte](7))
    intercept[java.nio.file.FileAlreadyExistsException] {
      fs.rename(fs.resolve(dir, "c.bin"), fs.resolve(dir, "b.bin"))
    }
    assert(fs.read(fs.resolve(dir, "b.bin")).toSeq === Seq[Byte](9, 9, 9))
    assert(fs.delete(fs.resolve(dir, "c.bin")))
    // publish: the pointer primitive — fresh create, overwrite, no
    // staging residue (r17 manifest-commit protocol).
    val ptr = fs.resolve(dir, "pointer.idx")
    fs.publish(ptr, Array[Byte](1, 2))
    fs.publish(ptr, Array[Byte](3, 4, 5))
    assert(fs.read(ptr).toSeq === Seq[Byte](3, 4, 5))
    assert(!fs.list(dir).exists(_.endsWith(".publish_tmp")))
    assert(fs.delete(ptr))
    assert(fs.list(dir).toSet === Set("sub", "b.bin"))
    assert(fs.delete(fs.resolve(dir, "b.bin")))
    assert(!fs.delete(fs.resolve(dir, "b.bin"))) // absent → false
    fs.write(fs.resolve(fs.resolve(dir, "sub"), "c"), Array[Byte](1))
    fs.deleteRecursively(fs.resolve(dir, "sub"))
    assert(!fs.exists(fs.resolve(dir, "sub")))
    assert(fs.list(fs.resolve(dir, "nope")).isEmpty) // absent dir
  }

  test("NioFs and HadoopFs: identical primitive behavior on local paths") {
    primitives(NioFs, tmp("nio"))
    primitives(new HadoopFs, tmp("hadoop"))
  }

  test("writeFiles + zipnum + lookup run unchanged through the Hadoop backend") {
    val sparkSession = spark
    import sparkSession.implicits._
    val hfs = new HadoopFs
    val rows = (0 until 12).map { i =>
      (s"g${i % 3}", f"https://h.org/p/$i%02d", "2024-01-01T00:00:00Z",
        "text/plain", s"body $i".getBytes("UTF-8"))
    }.toDF("file_group", "url", "warc_date", "content_type", "body")
    val files = graft.sources.Warc.encodeResponses(rows, withCdx = true)
      .localCheckpoint(true)
    val dir = tmp("hexp")
    assert(graft.sources.Warc.writeFiles(files, dir, hfs) === 6L)
    assert(hfs.list(dir).count(_.endsWith(".warc.gz")) === 3)
    val zdir = tmp("hzn")
    graft.sources.Warc.writeZipnum(files, zdir, shards = 2,
      blockLines = 3, fs = hfs)
    assert(hfs.exists(hfs.resolve(zdir, "cluster.idx")))
    assert(hfs.exists(hfs.resolve(zdir, "cluster.manifest")))
    val hit = graft.sources.Warc.zipnumLookup(zdir, "https://h.org/p/07",
      fs = hfs)
    assert(hit.size === 1 && hit.head.contains("/p/07 "))
    assert(graft.sources.Warc.zipnumLookup(zdir, "https://zz.org/x",
      fs = hfs).isEmpty)
    // Staleness detection works across backends too.
    assert(!graft.sources.Warc.zipnumStale(zdir, dir, hfs))
    val aCdx = hfs.resolve(dir, "g0.cdx")
    hfs.write(aCdx, "tampered\n".getBytes("UTF-8"))
    assert(graft.sources.Warc.zipnumStale(zdir, dir, hfs))
  }

  test("ParquetStore generation swaps, floors, and erasure through the Hadoop backend") {
    import org.apache.spark.sql.types._
    val sparkSession = spark
    import sparkSession.implicits._
    val hfs = new HadoopFs
    val schema = StructType(Seq(StructField("k", StringType),
      StructField("v", LongType)))
    val store = new graft.store.ParquetStore(spark, schema,
      tmp("hstore"), tableName = "fsio_hadoop_store",
      collapseKeys = Seq("k"), collapseEvery = 3L, fs = hfs)
    store.reset()
    (1L to 5L).foreach { g =>
      store.appendStreaming(Seq((s"k${g % 2}", g)).toDF("k", "v"))
    }
    // Collapse tripped (collapseEvery = 3): bounded generations, reads
    // still latest-per-key exact.
    assert(store.generations.size <= 4)
    val latest = store.latestPerKey(Seq("k")).select("k", "v").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(latest === Map("k1" -> 5L, "k0" -> 4L))
    // Floor side channel through the facade.
    store.recordAppliedFloor("lineage", 2L)
    assert(store.appliedFloor === Some(2L))
    store.releaseAppliedFloor("lineage")
    assert(store.appliedFloor === None)
    // Copy-on-write erasure.
    store.eraseKeys(Seq("k0").toDF("k"), Seq("k"))
    assert(store.selectAll.filter(col("k") === "k0").count() === 0L)
    assert(store.selectAll.filter(col("k") === "k1").count() > 0L)
    store.reset()
    assert(store.selectAll.count() === 0L)
  }

  test("eraseExports erases archives through the Hadoop backend") {
    val sparkSession = spark
    import sparkSession.implicits._
    val hfs = new HadoopFs
    val rows = (0 until 8).map { i =>
      (s"g${i % 2}", s"https://e.org/d/$i", "2024-01-01T00:00:00Z",
        "text/plain", s"payload $i".getBytes("UTF-8"))
    }.toDF("file_group", "url", "warc_date", "content_type", "body")
    val dir = tmp("herase")
    graft.sources.Warc.writeFiles(
      graft.sources.Warc.encodeResponses(rows, withCdx = true), dir, hfs)
    val td = graft.store.Takedown.takedownStore(spark, tmp("htd"),
      tableName = "fsio_hadoop_td")
    td.reset()
    graft.store.Takedown.request(td,
      Seq(("https://e.org/d/3", "dmca")).toDF("key", "reason"))
    assert(graft.store.Takedown.eraseExports(spark, dir, td,
      fs = hfs) === 1L)
    val back = graft.sources.Warc.records(
      spark.read.format("binaryFile").load(dir)
        .filter(col("path").endsWith(".warc.gz"))
        .select(col("path"), col("content").as("bytes")),
      gzipped = true)
    val uris = back.select("target_uri").collect().map(_.getString(0)).toSet
    assert(!uris.contains("https://e.org/d/3") && uris.size === 7)
  }
}
