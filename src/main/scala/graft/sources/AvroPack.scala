package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.QueryPack

/** S3/Q3 driver coverage: encode→decode round-trip through [[AvroCodec]] on
  * the `events` fixture, with a never-set union field decoding to null (the
  * doctest semantics, `utils.py:318-328`). The oracle is the identity
  * projection — if any codec step corrupted a value the hashes diverge. */
object AvroPack extends QueryPack {

  private val SchemaJson =
    """{"type": "record", "name": "Event", "fields": [
      |  {"name": "event_id", "type": "long"},
      |  {"name": "event_type", "type": "string"},
      |  {"name": "user_id", "type": ["long", "null"]},
      |  {"name": "opt", "type": ["string", "null"]}]}""".stripMargin

  private val JsonSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("event_type", StringType),
    StructField("user_id", LongType),
    StructField("opt", StringType)))

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_avro_roundtrip" -> { (s, dir) =>
      val base = table(s, dir, "events").select("event_id", "event_type", "user_id")
      val encoded = AvroCodec.encodeColumns(
        base, Seq("event_id", "event_type", "user_id"), SchemaJson)
      val decoded = AvroCodec.decodeValues(
        encoded.select(col("avro_value").as("value")), "value", SchemaJson)
      decoded
        .select(from_json(col("value"), JsonSchema).as("r"))
        .select(col("r.event_id").as("event_id"),
          col("r.event_type").as("event_type"),
          col("r.user_id").as("user_id"),
          col("r.opt").as("opt"))
    }
  )

  override def oracles: Map[String, String] = Map(
    "q_avro_roundtrip" ->
      """SELECT event_id, event_type, user_id, CAST(NULL AS VARCHAR) AS opt
        |FROM events""".stripMargin
  )
}
