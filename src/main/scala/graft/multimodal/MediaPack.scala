package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryPack

/** Multimodal plumbing coverage: opaque binary payloads (UTF-8 bytes of
  * `documents.text` stand in for media blobs — no binary fixture ships) →
  * size/hash features + chunk sampling, all narrow projections. The real
  * codec boundary is stubbed (see [[Media]]); this query proves the
  * binary-column schema, expressions, and counts against DuckDB. */
object MediaPack extends QueryPack {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_media_meta" -> { (s, dir) =>
      val media = table(s, dir, "documents")
        .select(col("doc_id").as("media_id"),
          encode(col("text"), "UTF-8").as("bytes"))
      Media.features(media)
        .withColumn("n_chunks", size(Media.sampleChunks("bytes", 16, 4)))
        .select("media_id", "n_bytes", "content_hash", "n_chunks")
    }
  )

  override def oracles: Map[String, String] = Map(
    // md5(text) in DuckDB hashes the UTF-8 bytes — exactly the payload.
    "q_media_meta" ->
      """SELECT doc_id AS media_id,
        |  octet_length(encode(text)) AS n_bytes,
        |  md5(text) AS content_hash,
        |  greatest((octet_length(encode(text)) - 1) // 64, 0) + 1 AS n_chunks
        |FROM documents""".stripMargin
  )
}
