package graft.streaming

import graft.SparkSpec

/** K5/K6 sink tests: upsert mini-codegen golden (doctest
  * `spark-streaming-kafka-bucket-counter.py:433-451`) + kafka payload shape. */
class SinksSpec extends SparkSpec {

  private val schema = Sinks.UpsertSchema(
    tableName = "tablename",
    columns = Seq(
      "mysql_column" -> "corresponding_dict_field",
      "mysql_column1" -> "corresponding_dict_field1"),
    dupKeyUpdate = Seq(
      "column_val = column_val + {0}" -> "column_name",
      "column_val1 = column_val1 * {0}" -> "column_name1"))

  private val row = Map[String, Any](
    "column_name" -> 1, "column_name1" -> 2,
    "corresponding_dict_field" -> 3, "corresponding_dict_field1" -> 4)

  test("upsert statement matches the doctest contract (declaration order)") {
    // The reference iterates a Python-2 dict (arbitrary order); we pin
    // declaration order — same statement semantics, stable text.
    assert(Sinks.upsertStatement(schema, row) ===
      "INSERT INTO tablename (mysql_column,mysql_column1) VALUES (3,4) " +
        "ON DUPLICATE KEY UPDATE column_val = column_val + 1,column_val1 = column_val1 * 2;")
  }

  test("distributed statement generation emits one statement per row") {
    val sparkSession = spark
    import sparkSession.implicits._
    val df = Seq((1, 2, 3, 4), (10, 20, 30, 40)).toDF(
      "column_name", "column_name1",
      "corresponding_dict_field", "corresponding_dict_field1")
    val got = Sinks.upsertStatements(df, schema).collect().toSet
    assert(got === Set(
      "INSERT INTO tablename (mysql_column,mysql_column1) VALUES (3,4) " +
        "ON DUPLICATE KEY UPDATE column_val = column_val + 1,column_val1 = column_val1 * 2;",
      "INSERT INTO tablename (mysql_column,mysql_column1) VALUES (30,40) " +
        "ON DUPLICATE KEY UPDATE column_val = column_val + 10,column_val1 = column_val1 * 20;"))
  }

  test("prepared upsert: ? placeholders with binds in placeholder order") {
    val (sql, binds) = Sinks.preparedUpsert(schema)
    assert(sql === "INSERT INTO tablename (mysql_column,mysql_column1) VALUES (?,?) " +
      "ON DUPLICATE KEY UPDATE column_val = column_val + ?,column_val1 = column_val1 * ?")
    assert(binds === Seq("corresponding_dict_field", "corresponding_dict_field1",
      "column_name", "column_name1"))
    // A template may reference its field more than once.
    val multi = Sinks.UpsertSchema("t", Seq("c" -> "f"),
      Seq("v = {0} * {0}" -> "g"))
    assert(Sinks.preparedUpsert(multi) ===
      (("INSERT INTO t (c) VALUES (?) ON DUPLICATE KEY UPDATE v = ? * ?",
        Seq("f", "g", "g"))))
  }

  test("upsertBatch round-trips through a real JDBC database (embedded Derby)") {
    val sparkSession = spark
    import sparkSession.implicits._
    val url = "jdbc:derby:memory:graft_sink_test;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    conn.createStatement().execute(
      "CREATE TABLE counts (event_type VARCHAR(32), n BIGINT)")
    conn.close()
    // Portable prepared-INSERT shape (no MySQL upsert clause): proves the
    // executor-side PreparedStatement binding + batch commit end to end.
    // The injection-shaped value must arrive verbatim, never spliced.
    val hostile = "x'); DROP TABLE counts; --"
    val df = Seq(("click", 3L), (hostile, 1L)).toDF("etype", "cnt")
    Sinks.upsertBatch(df,
      Sinks.UpsertSchema("counts", Seq("event_type" -> "etype", "n" -> "cnt"), Nil),
      url, user = "", password = "")
    val check = java.sql.DriverManager.getConnection(url)
    val rs = check.createStatement()
      .executeQuery("SELECT event_type, n FROM counts ORDER BY n DESC")
    val rows = Iterator.continually(rs)
      .takeWhile(_.next()).map(r => (r.getString(1), r.getLong(2))).toList
    check.close()
    assert(rows === List(("click", 3L), (hostile, 1L)))
  }

  test("kafka payload is structural JSON with correct escaping (P10 fix)") {
    val sparkSession = spark
    import sparkSession.implicits._
    val counts = Seq(("""quo"te""", 3L)).toDF("event_type", "count")
    val payload = Sinks.kafkaPayload(counts).head().getString(0)
    // The reference's string splice would emit invalid JSON here.
    assert(payload === """{"event_type":"quo\"te","count":3}""")
  }
}
