package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Deduplication operators for large-scale corpus pipelines: exact
  * (fingerprint group-by), MinHash-LSH near-dup (banded candidate
  * generation + exact-Jaccard verify — NO cross join anywhere), and SimHash
  * signatures.
  *
  * Determinism contract: every hash is derived from md5 (identical across
  * engines), so the driver's DuckDB oracle replicates the *whole* pipeline —
  * including the banding — value-for-value. LSH recall is therefore a tuning
  * property (banded candidate generation IS the operator's semantics), never
  * a correctness gap.
  *
  * Scale shape:
  *   - exact dedup: one shuffle on the 16-byte fingerprint; map-side partial
  *     aggregation; output cardinality = distinct documents.
  *   - near-dup: narrow per-row signature computation (k=16 minhashes over
  *     the shingle set) → explode to `Bands` rows/doc → shuffle join on the
  *     band key (equi-join, so a hash join over bounded buckets; skew on a
  *     hot band is handled by AQE) → pairwise verify only INSIDE buckets.
  *     All-pairs cost never appears; candidate volume is Σ_bucket |b|², the
  *     classic LSH bound. At this fixture scale we carry the hash arrays
  *     through the join for the verify step; at 100 TB you'd re-join them by
  *     doc_id instead to keep shuffle rows narrow — same plan shape.
  */
object Dedup {

  /** Universal-hash modulus (2^31 − 1, prime). */
  val P = 2147483647L

  /** Fixed odd multiplier/addend pairs for the 16 minhash permutations
    * h_j(x) = (a_j·x + b_j) mod P — small primes, hardcoded so the DuckDB
    * oracle uses the identical permutation family. */
  val As: Seq[Long] = Seq(7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53, 59, 61, 67)
  val Bs: Seq[Long] = Seq(3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53, 59)
  val NumHashes = 16
  val Bands = 4
  val RowsPerBand = 4

  /** 32-bit integer hash of a string: first 8 hex chars of md5. Exactly
    * `('0x' || substr(md5(s),1,8))::BIGINT` on the DuckDB side. */
  private def hashExpr(inner: String): String =
    s"cast(conv(substr(md5($inner), 1, 8), 16, 10) as bigint)"

  /** Distinct word-3-shingle hashes of `colName` (SQL splice — index-aware
    * lambdas need expr()). */
  def shingleHashes(colName: String, n: Int = 3): Column = {
    val ws = s"split(trim(`$colName`), '\\\\s+')"
    val joined = (1 until n).foldLeft("x")((acc, k) => s"concat($acc, ' ', $ws[i + $k])")
    val shingles = s"transform(slice($ws, 1, greatest(size($ws) - ${n - 1}, 0)), (x, i) -> $joined)"
    expr(s"array_distinct(transform($shingles, s -> ${hashExpr("s")}))")
  }

  /** Distinct word-unigram hashes (SimHash features). */
  def wordHashes(colName: String): Column =
    expr(s"array_distinct(transform(split(trim(`$colName`), '\\\\s+'), s -> ${hashExpr("s")}))")

  /** j-th minhash over a hash-array column. */
  def minhash(hashesCol: String, j: Int): Column =
    expr(s"aggregate(`$hashesCol`, cast($P as bigint), " +
      s"(acc, x) -> least(acc, (${As(j)}L * (x % $P) + ${Bs(j)}L) % $P))")

  /** Exact dedup — one row per distinct normalized text:
    * (fp, keep_id = min doc_id, dup_count). */
  def exact(docs: DataFrame, textCol: String = "text",
            idCol: String = "doc_id"): DataFrame =
    docs.groupBy(TextFunctions.fingerprint(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Per-document minhash signature + banded LSH keys, exploded to
    * `Bands` rows per document: (idCol, hs, band). */
  def lshBands(docs: DataFrame, textCol: String = "text",
               idCol: String = "doc_id"): DataFrame = {
    val hashed = docs.select(col(idCol), shingleHashes(textCol).as("hs"))
    val sig = hashed.withColumn("sig",
      array((0 until NumHashes).map(minhash("hs", _)): _*))
    // Band key "b:sig_i0_sig_i1_…" — concat() (null-propagating) matches
    // DuckDB ||; concat_ws would silently skip a null minhash.
    val bandCols = (0 until Bands).map { b =>
      val parts = (0 until RowsPerBand).flatMap { r =>
        val sep = if (r == 0) Seq(lit(s"${b + 1}:")) else Seq(lit("_"))
        sep :+ col("sig").getItem(b * RowsPerBand + r).cast("string")
      }
      concat(parts: _*)
    }
    sig.select(col(idCol), col("hs"), explode(array(bandCols: _*)).as("band"))
  }

  /** Near-duplicate pairs: band-bucket candidates verified with exact
    * Jaccard over the shingle-hash sets, thresholded. Output
    * (doc_a, doc_b, jaccard), doc_a < doc_b. */
  def nearDuplicates(docs: DataFrame, threshold: Double,
                     textCol: String = "text",
                     idCol: String = "doc_id"): DataFrame = {
    val bands = lshBands(docs, textCol, idCol)
    val a = bands.as("a")
    val b = bands.as("b")
    val cand = a.join(b,
        col("a.band") === col("b.band") && col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("doc_a"), col("a.hs").as("hs_a"),
        col(s"b.$idCol").as("doc_b"), col("b.hs").as("hs_b"))
      // A pair agreeing on several bands appears once (hs_* are functions of
      // the doc id, so dropDuplicates on the ids is exact).
      .dropDuplicates("doc_a", "doc_b")
    val inter = size(array_intersect(col("hs_a"), col("hs_b")))
    cand
      .withColumn("jaccard", inter.cast("double") /
        (size(col("hs_a")) + size(col("hs_b")) - inter))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** 32-bit SimHash of the distinct word set + a 16-bit prefix bucket (the
    * blocking key for hamming-distance candidate search). */
  def simhash(docs: DataFrame, textCol: String = "text",
              idCol: String = "doc_id"): DataFrame = {
    val hashed = docs.select(col(idCol), wordHashes(textCol).as("hs"))
    val bits = (0 until 32).map { k =>
      // Σ tokens (2·bit_k − 1) > 0 → bit k set. pmod/shiftright (not >> / &)
      // for cross-engine operator parity.
      val vote = expr(
        s"aggregate(hs, 0L, (acc, x) -> acc + 2 * pmod(shiftright(x, $k), 2) - 1)")
      when(vote > 0, lit(1L << k)).otherwise(lit(0L))
    }
    hashed.select(col(idCol),
      bits.reduce(_ + _).as("simhash"))
      .withColumn("bucket", expr("shiftright(simhash, 16)"))
  }
}
