package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named bundle of driver-checkable queries. Each engine module contributes
  * one pack; [[SparkEntry]] concatenates them. Convention: every entry in
  * [[QueryPack.queries]] that is SQL-expressible has a DuckDB oracle under the
  * same key in [[QueryPack.oracles]], with IDENTICAL output column names
  * (the driver sorts columns by name before hashing values).
  */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]

  /** Read one of the driver fixture tables from an sf dir. */
  protected def table(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  /** [[Tables.spread]]: spread a narrow row set across the cluster
    * before a per-row-heavy encode/decode stage (single-row-group
    * fixture files otherwise pin the whole stage to one task). */
  protected def spread(df: DataFrame): DataFrame = Tables.spread(df)
}
