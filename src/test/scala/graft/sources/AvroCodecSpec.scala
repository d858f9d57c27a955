package graft.sources

import graft.SparkSpec

/** Avro doctest ports (`utils.py:318-328,351-364`): null-filled unions,
  * None-safe decode, and the DataFrame-level transforms. */
class AvroCodecSpec extends SparkSpec {

  private val UserSchema =
    """{"namespace": "example.avro", "type": "record", "name": "User",
      | "fields": [{"name": "name", "type": "string"},
      |            {"name": "favorite_number", "type": ["int", "null"]},
      |            {"name": "favorite_color", "type": ["string", "null"]}]}""".stripMargin

  test("encode→decode round-trip null-fills unset union fields (doctest utils.py:318-328)") {
    val encode = AvroCodec.encoderFor(UserSchema)
    val decode = AvroCodec.decoderFor(UserSchema)
    val bytes = encode(Map("name" -> "Alyssa", "favorite_number" -> 256))
    // Schema field order; favorite_color was never set → JSON null.
    assert(decode(bytes) ===
      """{"name":"Alyssa","favorite_number":256,"favorite_color":null}""")
  }

  test("decoder is None-safe (reference `avro_msg_raw and …` guard)") {
    val decode = AvroCodec.decoderFor(UserSchema)
    assert(decode(null) === null)
    assert(decode(Array.empty[Byte]) === null)
  }

  test("nested avro types decode to proper JSON (arrays, records, maps, enums)") {
    val nestedSchema =
      """{"type": "record", "name": "Outer", "fields": [
        |  {"name": "tag", "type": "string"},
        |  {"name": "nums", "type": {"type": "array", "items": "long"}},
        |  {"name": "inner", "type": {"type": "record", "name": "Inner", "fields": [
        |    {"name": "a", "type": "int"}, {"name": "b", "type": ["string", "null"]}]}},
        |  {"name": "attrs", "type": {"type": "map", "values": "int"}},
        |  {"name": "kind", "type": {"type": "enum", "name": "Kind",
        |    "symbols": ["ALPHA", "BETA"]}}]}""".stripMargin
    // Encode a datum with avro-core directly (encoderFor is scalar-only).
    val schema = new org.apache.avro.Schema.Parser().parse(nestedSchema)
    val rec = new org.apache.avro.generic.GenericData.Record(schema)
    rec.put("tag", "x")
    rec.put("nums", java.util.Arrays.asList(1L, 2L))
    val inner = new org.apache.avro.generic.GenericData.Record(schema.getField("inner").schema())
    inner.put("a", 7)
    inner.put("b", "y")
    rec.put("inner", inner)
    val attrs = new java.util.TreeMap[String, Integer]() // sorted → stable JSON
    attrs.put("k1", 10)
    rec.put("attrs", attrs)
    rec.put("kind", new org.apache.avro.generic.GenericData.EnumSymbol(
      schema.getField("kind").schema(), "BETA"))
    val out = new java.io.ByteArrayOutputStream()
    val enc = org.apache.avro.io.EncoderFactory.get().binaryEncoder(out, null)
    new org.apache.avro.generic.GenericDatumWriter[org.apache.avro.generic.GenericRecord](schema)
      .write(rec, enc)
    enc.flush()
    assert(AvroCodec.decoderFor(nestedSchema)(out.toByteArray) ===
      """{"tag":"x","nums":[1,2],"inner":{"a":7,"b":"y"},"attrs":{"k1":10},"kind":"BETA"}""")
  }

  test("DataFrame encode/decode transforms round-trip with nulls") {
    val sparkSession = spark
    import sparkSession.implicits._
    val df = Seq(("Alyssa", 256), ("Ben", 7)).toDF("name", "favorite_number")
      .selectExpr("name", "cast(favorite_number as int) as favorite_number")
    val enc = AvroCodec.encodeColumns(df, Seq("name", "favorite_number"), UserSchema)
    val dec = AvroCodec.decodeValues(
      enc.selectExpr("avro_value as value"), "value", UserSchema)
    val strs = dec.collect().map(_.getString(0)).toSeq
    assert(strs === Seq(
      """{"name":"Alyssa","favorite_number":256,"favorite_color":null}""",
      """{"name":"Ben","favorite_number":7,"favorite_color":null}"""))
  }
}
