package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import graft.SparkSpec

/** P1/P2 rename-projection doctest (`utils.py:46-50`) + the {new -> source}
  * direction contract (SURVEY.md §1.3: README shows the reverse and would
  * KeyError under the code). */
class ProjectSpec extends SparkSpec {

  test("rename-projection doctest: {'offset':'1'} + {old_offset: offset} → {'old_offset':'1'}") {
    val sparkSession = spark
    import sparkSession.implicits._
    val df = Seq("""{"offset": "1", "extra": "dropped"}""").toDF("value")
    val parsed = Decode.parseJson(df, "value",
      StructType(Seq(StructField("offset", StringType))))
      .select(col("_parsed.offset").as("offset"))
    val projected = Project.renameProject(parsed, Seq("old_offset" -> "offset"))
    assert(projected.columns.toSeq === Seq("old_offset"))
    assert(projected.head().getString(0) === "1")
    // JSON-string shape of the reference's output, structurally rebuilt.
    val json = projected.select(to_json(struct(col("old_offset"))).as("j"))
      .head().getString(0)
    assert(json === """{"old_offset":"1"}""")
  }

  test("dropKey keeps only the value as string (P1)") {
    val sparkSession = spark
    import sparkSession.implicits._
    val df = Seq(("k1", "v1"), ("k2", "v2")).toDF("key", "value")
    val got = Project.dropKey(df)
    assert(got.columns.toSeq === Seq("value"))
    assert(got.collect().map(_.getString(0)).toSeq === Seq("v1", "v2"))
  }

  test("strict decode drops records missing a projected field (utils.py:58 KeyError)") {
    val sparkSession = spark
    import sparkSession.implicits._
    import graft.config.{BucketType, MsgSettings}
    val msg = MsgSettings(bucketInterval = 10, bucketField = "ts",
      bucketType = BucketType.Epoch, msgMapSchema = Seq("e" -> "etype"))
    val df = Seq(
      """{"etype": "a", "ts": 5}""",
      """{"ts": 6}""" // missing etype → record dropped, like KeyError
    ).toDF("value")
    val strict = Decode.decode(df, "value", msg)
    assert(strict.collect().map(_.getString(0)).toSeq === Seq("a"))
    // The drop is observable, not silent: the graft_decode_* metric rides
    // the same pass (rows seen, rows dropped for missing required fields).
    assert(Decode.decodeMetrics(strict) === ((2L, 1L)))
    // Composability: two strict decodes in ONE plan must not collide on the
    // observation name, and their metrics aggregate.
    val both = Decode.decode(df, "value", msg)
      .unionByName(Decode.decode(df, "value", msg))
    // Metrics attach to the executed QueryExecution — run `both` itself
    // (count() would execute a derived plan with its own empty metrics).
    assert(both.collect().length === 2)
    assert(Decode.decodeMetrics(both) === ((4L, 2L)))
    val lax = Decode.decode(df, "value", msg, strict = false)
    assert(lax.count() === 2L)
  }
}
