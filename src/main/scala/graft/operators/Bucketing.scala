package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}

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
}
