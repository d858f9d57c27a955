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
    },
    // Batched codec path: per-payload byte sums computed through the
    // fixed-size batch contract ([[Media.extractFeaturesBatched]]) — the
    // oracle pins that every byte of every row was touched exactly once
    // REGARDLESS of how rows fell into batches/partitions.
    "q_media_features" -> { (s, dir) =>
      val media = table(s, dir, "documents")
        .select(col("doc_id").as("media_id"),
          encode(col("text"), "UTF-8").as("bytes"))
      Media.extractFeaturesBatched(media, batchSize = 64)
        .select(col("media_id"), col("byte_sum"),
          octet_length(col("bytes")).cast("long").as("n_bytes"))
    },
    // Frame-sample CONTENT check: the first/last sampled 16-byte chunks of
    // each payload, hashed — proves the binary slicing math (offsets,
    // stride, tail truncation), not just the chunk count.
    "q_media_sample" -> { (s, dir) =>
      val media = table(s, dir, "documents")
        .select(col("doc_id").as("media_id"),
          encode(col("text"), "UTF-8").as("bytes"))
      media.select(col("media_id"), Media.sampleChunks("bytes", 16, 4).as("chunks"))
        .select(col("media_id"),
          size(col("chunks")).as("n_chunks"),
          md5(element_at(col("chunks"), 1)).as("first_chunk_hash"),
          md5(element_at(col("chunks"), size(col("chunks")))).as("last_chunk_hash"))
    }
  )

  override def oracles: Map[String, String] = Map(
    // md5(text) in DuckDB hashes the UTF-8 bytes — exactly the payload.
    "q_media_meta" ->
      """SELECT doc_id AS media_id,
        |  octet_length(encode(text)) AS n_bytes,
        |  md5(text) AS content_hash,
        |  greatest((octet_length(encode(text)) - 1) // 64, 0) + 1 AS n_chunks
        |FROM documents""".stripMargin,
    // Char-wise ascii() sum equals the byte sum because the fixture text is
    // pure ASCII (same invariant q_media_sample's oracle relies on).
    // (?s) so '.' also matches newlines (an ASCII byte!); the LEFT JOIN
    // keeps empty-text payloads as (0, 0) rows like the Spark side does.
    "q_media_features" ->
      """WITH s AS (SELECT doc_id, CAST(sum(ascii(c)) AS BIGINT) AS bs,
        |    count(*) AS nb
        |  FROM (SELECT doc_id, unnest(regexp_extract_all(text, '(?s).')) AS c
        |        FROM documents) GROUP BY 1)
        |SELECT d.doc_id AS media_id, coalesce(s.bs, 0) AS byte_sum,
        |  coalesce(s.nb, 0) AS n_bytes
        |FROM documents d LEFT JOIN s USING (doc_id)""".stripMargin,
    // DuckDB has no BLOB substring/md5, so the oracle slices the VARCHAR and
    // md5-s it (DuckDB md5(varchar) hashes the UTF-8 bytes) — byte-identical
    // because the fixture text is pure ASCII (checked: octet_length ==
    // length for every row); the Spark side slices true bytes. Chunk i sits
    // at byte i*chunk*stride, length `chunk`.
    "q_media_sample" ->
      """SELECT doc_id AS media_id,
        |  greatest((octet_length(encode(text)) - 1) // 64, 0) + 1 AS n_chunks,
        |  md5(substring(text, 1, 16)) AS first_chunk_hash,
        |  md5(substring(text,
        |    greatest((octet_length(encode(text)) - 1) // 64, 0) * 64 + 1, 16))
        |    AS last_chunk_hash
        |FROM documents""".stripMargin
  )
}
