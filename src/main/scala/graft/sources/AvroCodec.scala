package graft.sources

import java.io.ByteArrayOutputStream
import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{BinaryDecoder, BinaryEncoder, DecoderFactory, EncoderFactory}
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.{BinaryType, StringType, StructField, StructType}

/** Avro value decode/encode — operators S3/Q3 (`avro_decoder_func` /
  * `dict_to_avro`, `audit_utils/audit_utils/utils.py:276-373`): single binary
  * datums (no container framing), union-with-null fields decoding to JSON
  * null, missing fields encoding as null (doctest `utils.py:318-328`:
  * {name, favorite_number} round-trips with favorite_color → null).
  *
  * Built directly on avro-core (this distribution ships no spark-avro module,
  * so `from_avro`/`to_avro` are unavailable). Executed via `mapPartitions`
  * with reader/writer reuse — the per-partition amortization the reference
  * hand-rolled for its sink connections, and the documented fallback when no
  * built-in expression exists (SURVEY.md §7.3). JSON output is rendered in
  * schema field order (deterministic, unlike the reference's Python-2 dict
  * order).
  */
object AvroCodec {

  /** bytes → JSON string decoder for one schema. The returned function is
    * reusable within a partition; null/empty input → null (the reference's
    * `avro_msg_raw and …` guard). */
  def decoderFor(schemaJson: String): Array[Byte] => String = {
    val schema = new Schema.Parser().parse(schemaJson)
    val reader = new GenericDatumReader[GenericRecord](schema)
    val mapper = new ObjectMapper()
    var decoder: BinaryDecoder = null
    bytes => {
      if (bytes == null || bytes.isEmpty) null
      else {
        decoder = DecoderFactory.get().binaryDecoder(bytes, decoder)
        recordToJson(reader.read(null, decoder), schema, mapper).toString
      }
    }
  }

  /** Map/row → avro binary encoder for one schema; missing or null fields
    * must be declared as unions with null in the schema. */
  def encoderFor(schemaJson: String): Map[String, Any] => Array[Byte] = {
    val schema = new Schema.Parser().parse(schemaJson)
    val writer = new GenericDatumWriter[GenericRecord](schema)
    var encoder: BinaryEncoder = null
    fields => {
      val rec = new GenericData.Record(schema)
      schema.getFields.forEach { f =>
        rec.put(f.name(), fields.getOrElse(f.name(), null))
      }
      val out = new ByteArrayOutputStream()
      encoder = EncoderFactory.get().binaryEncoder(out, encoder)
      writer.write(rec, encoder)
      encoder.flush()
      out.toByteArray
    }
  }

  private def recordToJson(rec: GenericRecord, schema: Schema,
                           mapper: ObjectMapper): ObjectNode = {
    val node = mapper.createObjectNode()
    schema.getFields.forEach { f =>
      rec.get(f.name()) match {
        case null                      => node.putNull(f.name())
        case v: org.apache.avro.util.Utf8 => node.put(f.name(), v.toString)
        case v: java.lang.Integer      => node.put(f.name(), v)
        case v: java.lang.Long         => node.put(f.name(), v)
        case v: java.lang.Float        => node.put(f.name(), v)
        case v: java.lang.Double       => node.put(f.name(), v)
        case v: java.lang.Boolean      => node.put(f.name(), v)
        case v: java.nio.ByteBuffer    =>
          node.put(f.name(), java.util.Base64.getEncoder.encodeToString(v.array()))
        // Nested records/arrays/maps/enums would previously fall through to
        // toString and emit non-JSON garbage; the reference's decoder is
        // scalar-only too (`utils.py:276-304`), so fail fast instead of
        // corrupting downstream JSON parsing silently.
        case v                         => throw new UnsupportedOperationException(
          s"avro field '${f.name()}' has unsupported (non-scalar) runtime type " +
            s"${v.getClass.getName} — only null/string/int/long/float/double/" +
            "boolean/bytes fields are decodable")
      }
    }
    node
  }

  /** DataFrame transform: rewrite binary `valueCol` to its JSON decode —
    * the S3 hook shape [[graft.streaming.StreamShell.attach]] accepts.
    * Reader construction is amortized per partition. */
  def decodeValues(df: DataFrame, valueCol: String, schemaJson: String): DataFrame = {
    val schema = df.schema
    val vi = schema.fieldIndex(valueCol)
    require(schema(vi).dataType == BinaryType,
      s"$valueCol must be binary, got ${schema(vi).dataType}")
    val outSchema = StructType(schema.fields.updated(vi,
      StructField(valueCol, StringType, nullable = true)))
    df.mapPartitions { it =>
      val decode = decoderFor(schemaJson)
      it.map { row =>
        val vals = row.toSeq.updated(vi, decode(row.getAs[Array[Byte]](vi)))
        Row.fromSeq(vals)
      }
    }(Encoders.row(outSchema))
  }

  /** DataFrame transform: append binary column `outCol` = avro encoding of
    * `cols` (long/string/int columns; nulls allowed for union fields). */
  def encodeColumns(df: DataFrame, cols: Seq[String], schemaJson: String,
                    outCol: String = "avro_value"): DataFrame = {
    val schema = df.schema
    val idx = cols.map(schema.fieldIndex)
    val outSchema = StructType(schema.fields :+ StructField(outCol, BinaryType, nullable = true))
    df.mapPartitions { it =>
      val encode = encoderFor(schemaJson)
      it.map { row =>
        val fields = cols.zip(idx).map { case (c, i) => c -> row.get(i) }.toMap
        Row.fromSeq(row.toSeq :+ encode(fields))
      }
    }(Encoders.row(outSchema))
  }
}
