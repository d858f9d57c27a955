package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Context-window preparation for LLM training corpora: split documents into
  * overlapping token-window chunks, and pack variable-length documents into
  * fixed-budget sequences.
  *
  * Both are NARROW or single-shuffle plans:
  *   - [[chunk]] is wholly narrow — tokenize, explode the per-document chunk
  *     index range (each document emits its own chunk count, no
  *     driver-side anything), slice. 100 TB of documents chunk at scan
  *     speed with zero shuffles.
  *   - [[packSequences]] needs exactly ONE shuffle (by shard) + one
  *     window pass: the greedy order is a salted-md5 hash — i.e. a
  *     deterministic global shuffle of the corpus, which is itself the
  *     training-data shuffling step — and the running token total assigns
  *     each document a bin. Per shard, bins fill in hash order; capacity
  *     overflow happens only on the document that crosses the boundary
  *     (the standard streaming-pack trade; an exact bin-packing is
  *     NP-hard and order-dependent — useless at scale).
  *
  * Determinism: tokenization is the whitespace contract shared with
  * [[graft.functions.TextFunctions]] (`q_token_counts`); ordering is
  * md5-of-id (hex string compare, engine-portable); all arithmetic is
  * integer-exact.
  */
object Chunking {

  private def floorDiv(x: Column, w: Long): Column =
    call_function("div", x - pmod(x, lit(w)), lit(w))

  /** Explode each document into chunks of `chunkTokens` whitespace tokens,
    * consecutive chunks sharing `overlapTokens`. Output: (id, chunk_ix,
    * chunk_text, n_tokens). Documents with only whitespace yield nothing;
    * a document shorter than one chunk yields exactly one chunk. The final
    * chunk may be short (never empty) — standard sliding-window chunking.
    */
  def chunk(docs: DataFrame, chunkTokens: Int, overlapTokens: Int,
            idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(chunkTokens > 0, "chunkTokens must be positive")
    require(overlapTokens >= 0 && overlapTokens < chunkTokens,
      "overlap must be in [0, chunkTokens)")
    require(Seq("_toks", "_n", "chunk_ix", "chunk_text", "n_tokens")
      .forall(!docs.columns.contains(_)), "chunk output column names are reserved")
    val stride = (chunkTokens - overlapTokens).toLong
    // Drop empty tokens outright: `trim` strips only spaces, so a doc made
    // of tabs/newlines (or ending in one) would otherwise sneak phantom ""
    // tokens into chunks — violating the "chunks are never empty" contract.
    val toks = filter(TextFunctions.words(col(textCol)), t => t =!= "")
    docs
      .select(col(idCol), toks.as("_toks"))
      .withColumn("_n", size(col("_toks")).cast("long"))
      .filter(col("_n") > 0)
      // Last chunk index: 0 when the doc fits one chunk, else
      // ceil((n - chunkTokens) / stride) — the start of the chunk that
      // covers the tail.
      .withColumn("chunk_ix", explode(sequence(lit(0L),
        when(col("_n") <= chunkTokens, lit(0L)).otherwise(
          floorDiv(col("_n") - chunkTokens + (stride - 1L), stride)))))
      .select(col(idCol), col("chunk_ix"),
        concat_ws(" ", slice(col("_toks"),
          (col("chunk_ix") * stride + 1L).cast("int"), lit(chunkTokens)))
          .as("chunk_text"),
        least(lit(chunkTokens.toLong), col("_n") - col("chunk_ix") * stride)
          .as("n_tokens"))
  }

  /** Pack documents into `ctxTokens`-budget bins: shard by salted md5,
    * order within the shard by md5-of-id (the deterministic global
    * shuffle), then bin = floor(exclusive-running-token-total / ctx).
    * Output: one row per document with its (shard, bin, n_tokens,
    * bin_offset) placement. */
  def packSequences(docs: DataFrame, ctxTokens: Int, numShards: Int,
                    idCol: String = "doc_id", textCol: String = "text",
                    salt: String = "pack"): DataFrame = {
    require(ctxTokens > 0 && numShards > 0, "ctxTokens/numShards must be positive")
    require(Seq("shard", "_ord", "n_tokens", "_cum", "bin", "bin_offset")
      .forall(!docs.columns.contains(_)), "pack output column names are reserved")
    val w = Window.partitionBy("shard").orderBy(col("_ord"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col(idCol),
        Curation.shardOf(col(idCol), numShards, salt).as("shard"),
        md5(col(idCol).cast("string")).as("_ord"),
        TextFunctions.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("_cum", sum(col("n_tokens")).over(w))
      .select(col("shard"), col(idCol), col("n_tokens"),
        floorDiv(col("_cum") - col("n_tokens"), ctxTokens.toLong).as("bin"),
        pmod(col("_cum") - col("n_tokens"), lit(ctxTokens.toLong)).as("bin_offset"))
  }
}
