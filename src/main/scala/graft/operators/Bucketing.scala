package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode}

/** Bucketed table layout — the shuffle you pay ONCE at write time instead of
  * on every join. A table written with `bucketBy(n, k)` is hash-partitioned
  * into n files per directory by k; two tables bucketed on the same key with
  * the same n join as a sort-merge join with NO Exchange on either side, and
  * a `groupBy(k)` over one table aggregates shuffle-free. An equality filter
  * on k prunes to 1/n of the files before the scan (`SelectedBucketsCount`
  * in the plan).
  *
  * The 100 TB calculus: a fact table that is joined on the same key by many
  * downstream queries (orders⋈customer, lineitem⋈orders, …) amortizes one
  * bucketed write across every subsequent read — each of which would
  * otherwise re-shuffle the full fact table. Pick n so one bucket of the
  * LARGEST co-bucketed table fits an executor's sort budget; n must match
  * across tables meant to co-join (Spark only elides the exchange when both
  * sides hash to the same layout).
  */
object Bucketing {

  /** Write `df` as a bucketed (and optionally per-bucket-sorted) parquet
    * table at an explicit `path`, registered as `tableName` in the session
    * catalog. Sorting by the bucket key makes the downstream sort-merge
    * join's sort a no-op per bucket file. */
  def writeBucketed(df: DataFrame, tableName: String, path: String,
                    numBuckets: Int, keys: Seq[String],
                    sortCols: Seq[String] = Nil): Unit = {
    require(keys.nonEmpty, "bucketing needs at least one key")
    val w = df.write.mode(SaveMode.Overwrite)
      .format("parquet").option("path", path)
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
    val sorted =
      if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
    sorted.saveAsTable(tableName)
  }

  /** [[writeBucketed]], idempotent per session: if `tableName` is already in
    * the catalog the write is skipped and the existing layout is reused.
    * This is the honest read-path contract — the layout is paid once, every
    * subsequent query (or benchmark iteration) measures the exchange-free
    * join it bought, not a re-write of an identical table. Callers that
    * changed the DATA under the same name must drop the table first. */
  def ensureBucketed(df: DataFrame, tableName: String, path: String,
                     numBuckets: Int, keys: Seq[String],
                     sortCols: Seq[String] = Nil): Unit =
    if (!df.sparkSession.catalog.tableExists(tableName))
      writeBucketed(df, tableName, path, numBuckets, keys, sortCols)

  /** Range-clustered layout for ordered scans: globally range-partition by
    * `rangeCol` into `numFiles` files, each sorted within. Files then cover
    * DISJOINT value ranges, so a time/range predicate prunes whole files
    * and row groups via parquet min/max statistics instead of scanning the
    * corpus — the layout that makes "last 6 hours of a 100 TB event log"
    * read ~6 hours of bytes. The range exchange samples the column to pick
    * balanced split points, so skewed distributions still yield even files.
    */
  def writeRangeSorted(df: DataFrame, path: String, numFiles: Int,
                       rangeCol: String): Unit = {
    require(numFiles > 0, "numFiles must be positive")
    df.repartitionByRange(numFiles, org.apache.spark.sql.functions.col(rangeCol))
      .sortWithinPartitions(rangeCol)
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Small-file compaction — the maintenance op every long-lived table
    * needs: streaming sinks, per-generation appends, and fine-grained
    * partition writes all accumulate files far below the efficient scan
    * size, and at 100 TB the resulting open/seek overhead (and NameNode /
    * object-store listing pressure) dominates reads. Rewrites `path` into
    * ceil(bytes/targetBytes) files via `coalesce` — a NARROW merge of
    * input splits, no shuffle — then swaps directories. Returns the new
    * file count (unchanged if already at or below it; never splits files).
    *
    * Single-writer maintenance op: the delete+rename swap is not atomic
    * against concurrent writers; readers racing the swap should use
    * ignoreMissingFiles (as RecentStore's durable reads already do). */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
              targetBytes: Long): Int = {
    require(targetBytes > 0, "targetBytes must be positive")
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(hPath)
      .filter(f => f.isFile && f.getPath.getName.startsWith("part-"))
    val total = parts.map(_.getLen).sum
    // Overflow-safe ceil-div (total + target - 1 wraps for huge targets).
    val n = math.max(1L,
      total / targetBytes + (if (total % targetBytes > 0) 1L else 0L)).toInt
    if (n >= parts.length) return parts.length
    val tmp = new org.apache.hadoop.fs.Path(path + "._graft_compact")
    // Size output files by sizing the INPUT SPLITS: with maxPartitionBytes
    // = targetBytes (and openCost not inflating tiny files), Spark's file
    // bin-packing yields ~n read partitions of ~targetBytes each, written
    // 1:1 — no shuffle anywhere. coalesce(n) only caps packing slack; it
    // cannot split, which is why split sizing (not coalesce) does the work.
    val conf = spark.conf
    val prev = Seq("spark.sql.files.maxPartitionBytes",
      "spark.sql.files.openCostInBytes").map(k => k -> conf.getOption(k))
    conf.set("spark.sql.files.maxPartitionBytes", targetBytes.toString)
    conf.set("spark.sql.files.openCostInBytes", "1024")
    try spark.read.parquet(path).coalesce(n)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    finally prev.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
    fs.delete(hPath, true)
    if (!fs.rename(tmp, hPath))
      throw new java.io.IOException(s"compact: rename $tmp -> $hPath failed")
    n
  }

  /** Morton (Z-order) value of two long columns, each first normalized to
    * `bitsPerDim` bits by exact integer scaling over [lo, hi]. Interleaving
    * the bits makes 1-D z-proximity imply 2-D proximity, so range-splitting
    * on z clusters BOTH dimensions at once. Nulls sort first (null z). */
  private[operators] def mortonValue(a: Column, aLo: Long, aHi: Long,
                                     b: Column, bLo: Long, bHi: Long,
                                     bitsPerDim: Int): Column = {
    import org.apache.spark.sql.functions._
    require(bitsPerDim >= 1 && bitsPerDim <= 16, "bitsPerDim in [1,16]")
    // Exact integer scaling with a pure right-shift (no division, no
    // double rounding, no overflow): shift so the span lands in
    // <= bitsPerDim bits. Up to 2× coarser than a true divide at the top
    // of the range — irrelevant for layout, where buckets only steer
    // locality.
    def bucket(v: Column, lo: Long, hi: Long): Column = {
      val span = hi - lo
      val shift = math.max(0,
        64 - java.lang.Long.numberOfLeadingZeros(span) - bitsPerDim)
      shiftright(v - lit(lo), shift)
    }
    val ab = bucket(a, aLo, aHi); val bb = bucket(b, bLo, bHi)
    (0 until bitsPerDim).map { i =>
      (shiftright(ab, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))) +
        (shiftright(bb, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)))
    }.reduce(_ + _)
  }

  /** Z-order clustered layout: the two-dimensional sibling of
    * [[writeRangeSorted]]. Range-sorting clusters ONE column perfectly and
    * leaves any other predicate scanning every file; z-ordering spends the
    * same single range exchange on the interleaved Morton value, so the
    * numFiles files tile a √n × √n grid over BOTH columns — parquet min/max
    * stats on each raw column stay narrow per file, and a selective
    * predicate on EITHER dimension (or both) prunes most files. The
    * 100 TB use: event logs queried sometimes by time, sometimes by entity
    * — one layout serves both without a second copy.
    *
    * Bounds for the scaling are taken from one min/max aggregate (four
    * scalars to the driver — index-build-sized, like centroid fetches).
    * The Morton column is dropped before the write; it is layout, not
    * data. */
  def writeZOrdered(df: DataFrame, path: String, numFiles: Int,
                    colA: String, colB: String, bitsPerDim: Int = 8): Unit = {
    import org.apache.spark.sql.functions._
    require(numFiles > 0, "numFiles must be positive")
    val r = df.agg(min(col(colA)), max(col(colA)),
      min(col(colB)), max(col(colB))).head()
    if (r.isNullAt(0) || r.isNullAt(2)) { // all-null dim: plain write
      df.write.mode(SaveMode.Overwrite).parquet(path)
    } else {
      val z = mortonValue(col(colA), r.getLong(0), r.getLong(1),
        col(colB), r.getLong(2), r.getLong(3), bitsPerDim)
      // Partition by the Morton GRID CELL (top bits of z), not raw z:
      // sampled range bounds on raw z can land mid-cell, and a file
      // straddling a high-bit z boundary covers the FULL range of one
      // dimension (the curve jumps across the grid there) — snapping to
      // cells is what guarantees every file a bounded tile. Within a
      // cell, rows stay z-sorted for row-group-level stats.
      val cellBits = 64 - java.lang.Long.numberOfLeadingZeros((numFiles - 1).max(1))
      val dropBits = (2 * bitsPerDim - cellBits).max(0)
      df.withColumn("_graft_z", z)
        .withColumn("_graft_cell", shiftright(col("_graft_z"), dropBits))
        .repartitionByRange(numFiles, col("_graft_cell"))
        .sortWithinPartitions("_graft_z")
        .drop("_graft_z", "_graft_cell")
        .write.mode(SaveMode.Overwrite).parquet(path)
    }
  }
}
