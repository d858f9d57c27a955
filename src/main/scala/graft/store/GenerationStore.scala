package graft.store

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** The generation-store contract both deployments implement — in-memory
  * [[RecentStore]] and durable [[ParquetStore]] — and everything the query
  * surface ([[graft.serve.StoreHttpServer]], comparators, Q1–Q13) needs.
  * The reference's endpoint wraps its durable SQLite table; the veneer here
  * serves either deployment through this trait. */
trait GenerationStore {
  def spark: org.apache.spark.sql.SparkSession
  def tableName: String

  /** Q1 select-all. */
  def selectAll: DataFrame
  /** Q2 arbitrary SQL over the registered view. */
  def sql(query: String): DataFrame
  /** Q5 current generation counter (the NEXT id to stamp). */
  def currentRstId: Long
  /** A4 MAX(rst_id), None when empty. */
  def maxRstId: Option[Long]
  /** Q11 recent-N generations. */
  def recent(n: Long): DataFrame
  /** Q12 one generation. */
  def directFetch(rstId: Long): DataFrame
  /** Ring get_onwards. */
  def getOnwards(rstId: Long): DataFrame
  /** Q4 reconnect/reset: full state wipe. */
  def reset(): this.type
  /** K2/K3 bulk append. */
  def append(batch: DataFrame): this.type
  /** K4 retention. */
  def clean(interval: Long = -1L): this.type

  /** Append from a STREAMING micro-batch: the batch plan reads ephemeral
    * source offsets, so it must be materialized before the trigger
    * completes. In-memory deployment: localCheckpoint (the union keeps
    * referencing it). Durable deployment overrides — its parquet write IS
    * the materialization, so checkpointing first would do the work twice. */
  def appendStreaming(batch: DataFrame): this.type =
    append(batch.localCheckpoint(eager = true))

  /** Q3 SQL→Avro select (shared — both deployments encode identically). */
  def sqlAvro(query: String, avroSchemaJson: String): DataFrame = {
    val result = sql(query)
    graft.sources.AvroCodec.encodeColumns(
      result, result.columns.toSeq, avroSchemaJson, outCol = "avro_value")
      .select(col("avro_value"))
  }
}
