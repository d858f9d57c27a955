package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.config.GraftConfig
import graft.serve.Comparators
import graft.streaming.StreamShell

/** The whole assembly, driven like the reference's README walkthrough
  * (`README.md:66-177`): ini config → streaming source → decode/bucket/count
  * → generation-stamped store → HTTP-shaped query surface. */
class EndToEndSpec extends SparkSpec {

  private val ini =
    """[KafkaSettings]
      |broker = localhost:9092
      |topic = logstash-test
      |[MsgSettings]
      |bucket_interval = 20
      |bucket_field = timestamp
      |bucket_type = epoch
      |msg_map_schema = {"server_name": "origin_server", "topic": "topic"}
      |[HTTPEndpointSetting]
      |sqlite_table = audit
      |sqlite_schema = {"server_name": "TEXT", "topic": "TEXT", "bucket_start": "INTEGER", "bucket_end": "INTEGER", "count": "INTEGER"}
      |clean_interval = 100
      |clean_freq = 10
      |""".stripMargin

  test("README worked example: message in → counted bucketed row out (README.md:119-132)") {
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val cfg = GraftConfig.fromIni(ini)
    val stream = MemoryStream[(String, String)]
    val (store, query) = StreamShell.runWithSource(spark, cfg,
      stream.toDF().toDF("key", "value"),
      trigger = Some(Trigger.ProcessingTime(0L)))

    // The A1 fixture message (FIXTURES.md §A1 / README.md:110-117).
    stream.addData(("k",
      """{"origin_server": "Iceman", "topic": "Dreams", "timestamp": 1440179085}"""))
    query.processAllAvailable()
    query.stop()

    // Expected HTTP row (README.md:119-132): count 1, bucket [1440179080,
    // 1440179100), RST_ID 1, projected + renamed fields.
    val row = store.sql(
      "SELECT server_name, topic, bucket_start, bucket_end, count, rst_id FROM audit")
      .head()
    assert(row.toSeq === Seq("Iceman", "Dreams", 1440179080L, 1440179100L, 1L, 1L))

    // Q2 arbitrary SQL + Q7 comparator DSL against the same view.
    assert(store.sql("SELECT sum(count) FROM audit WHERE topic = 'Dreams'")
      .head().getLong(0) === 1L)
    assert(Comparators.cGeneralSelectJson(store.selectAll,
      """{"bucket_start": ["range", 1440179080, null]}""").count() === 1L)

    // Q4 reset = the README's restart behavior: store empties, counter rewinds.
    store.reset()
    assert(store.sql("SELECT count(*) FROM audit").head().getLong(0) === 0L)
  }
}
