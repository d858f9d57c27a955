package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Alternate sinks — K5 (Kafka writeback) and K6 (MySQL/JDBC upsert),
  * `spark-streaming-kafka-bucket-counter.py:342-467`. */
object Sinks {

  /** K5 payload shaping: each row → one JSON message (the structural
    * restatement of `combine_count_json`, P10 — proper escaping instead of
    * string splicing into the key). */
  def kafkaPayload(df: DataFrame): DataFrame =
    df.select(to_json(struct(df.columns.map(col).toIndexedSeq: _*)).as("value"))

  /** K5 Kafka writeback (`create_send_kafka_msg_func`, `:342-371`). The
    * built-in kafka sink pools one producer per executor — the per-partition
    * producer the reference opened by hand. Requires the spark-sql-kafka
    * connector jar at deploy time (absent in this sandbox). */
  def writeKafka(counts: DataFrame, broker: String, topic: String,
                 checkpoint: String): StreamingQuery =
    kafkaPayload(counts).writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", broker)
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)
      .start()

  /** K6 upsert schema (`create_mysql_parse_func`, `:410-467`):
    * columns = {mysql_column -> row field} (insert list, declaration order —
    * the reference iterates a Python-2 dict, i.e. arbitrary order; we pin
    * declaration order), dupKeyUpdate = {update template with {0} -> row
    * field} mini-codegen. */
  final case class UpsertSchema(
      tableName: String,
      columns: Seq[(String, String)],
      dupKeyUpdate: Seq[(String, String)])

  /** One `INSERT … ON DUPLICATE KEY UPDATE` statement for one row — the
    * doctest contract (`:433-451`), kept ONLY as the golden-test surface for
    * the reference's mini-codegen. Values are spliced with str() like the
    * reference, so this form is unsafe for untrusted strings;
    * [[upsertBatch]] never executes it — it binds values through
    * `java.sql.PreparedStatement` parameters instead. */
  def upsertStatement(schema: UpsertSchema, row: Map[String, Any]): String = {
    val cols = schema.columns.map(_._1).mkString(",")
    val vals = schema.columns.map { case (_, f) => String.valueOf(row(f)) }.mkString(",")
    val update = schema.dupKeyUpdate
      .map { case (tpl, f) => tpl.replace("{0}", String.valueOf(row(f))) }
      .mkString(",")
    s"INSERT INTO ${schema.tableName} ($cols) VALUES ($vals) ON DUPLICATE KEY UPDATE $update;"
  }

  /** Distributed statement generation: one SQL string per row. */
  def upsertStatements(df: DataFrame, schema: UpsertSchema): Dataset[String] = {
    val fields = df.schema.fieldNames.zipWithIndex.toMap
    df.map { row =>
      upsertStatement(schema,
        fields.map { case (n, i) => n -> row.get(i) })
    }(Encoders.STRING)
  }

  /** The parameterized form of the upsert: one SQL string with `?`
    * placeholders, plus the row-field names to bind, in placeholder order —
    * insert columns first, then each `{0}` occurrence of each update
    * template (a template may reference its field more than once). With no
    * update templates the MySQL-specific `ON DUPLICATE KEY UPDATE` clause is
    * omitted, leaving a portable prepared INSERT (any JDBC database). */
  def preparedUpsert(schema: UpsertSchema): (String, Seq[String]) = {
    val cols = schema.columns.map(_._1).mkString(",")
    val marks = Seq.fill(schema.columns.size)("?").mkString(",")
    val insert = s"INSERT INTO ${schema.tableName} ($cols) VALUES ($marks)"
    if (schema.dupKeyUpdate.isEmpty) (insert, schema.columns.map(_._2))
    else {
      val update = schema.dupKeyUpdate
        .map { case (tpl, _) => tpl.replace("{0}", "?") }.mkString(",")
      val updateBinds = schema.dupKeyUpdate.flatMap { case (tpl, f) =>
        Seq.fill(tpl.sliding(3).count(_ == "{0}"))(f)
      }
      (s"$insert ON DUPLICATE KEY UPDATE $update",
        schema.columns.map(_._2) ++ updateBinds)
    }
  }

  /** K6 executor-side JDBC upsert for one micro-batch: per-PARTITION
    * connection (the reference's `create_send_mysql_msg_func` amortization,
    * `:395-402`), one `PreparedStatement` per partition with values bound as
    * parameters (never spliced — safe for untrusted strings), executed as a
    * JDBC batch and committed per partition. Driver class must be on the
    * executor classpath at deploy time. */
  def upsertBatch(df: DataFrame, schema: UpsertSchema, jdbcUrl: String,
                  user: String, password: String): Unit = {
    val (sql, binds) = preparedUpsert(schema)
    val fieldIdx = df.schema.fieldNames.zipWithIndex.toMap
    val bindIdx = binds.map(f => fieldIdx.getOrElse(f,
      throw new IllegalArgumentException(s"upsert schema references missing field '$f'")))
    df.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
      val conn = java.sql.DriverManager.getConnection(jdbcUrl, user, password)
      try {
        conn.setAutoCommit(false)
        val ps = conn.prepareStatement(sql)
        var pending = 0
        it.foreach { row =>
          bindIdx.zipWithIndex.foreach { case (ri, pi) =>
            ps.setObject(pi + 1, row.get(ri))
          }
          ps.addBatch()
          pending += 1
          // Flush in bounded chunks: one executeBatch over a whole partition
          // would buffer every bound row in memory (and overflow MySQL's
          // max_allowed_packet) on large micro-batches.
          if (pending >= 1000) { ps.executeBatch(); pending = 0 }
        }
        if (pending > 0) ps.executeBatch()
        conn.commit()
      } finally conn.close()
    }
  }
}
