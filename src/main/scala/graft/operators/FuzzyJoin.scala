package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance similarity self-join — all pairs within Levenshtein
  * distance `k` — via partition-based segment signatures (the PassJoin
  * family: Li, Deng, Feng, VLDB 2011), composed from built-in higher-order
  * functions so the whole candidate generation stays inside whole-stage
  * codegen.
  *
  * Why not a cross join + `levenshtein`: the exact semantics need every
  * pair examined, which is O(n²) at any scale. The pigeonhole signature
  * makes the join EXACT (zero false negatives) while only equi-joining on
  * short substrings:
  *
  *   - split every string into k+1 contiguous segments (even split). If
  *     ed(a, b) <= k, at most k segments of `a` are touched by an edit, so
  *     at least ONE segment survives verbatim in `b`, displaced by at most
  *     the net insertions/deletions before it — i.e. it occurs in `b` at a
  *     start position within ±k of its position in `a`.
  *   - index side: each string emits its k+1 segments under key
  *     (len, segIdx, segText).
  *   - probe side: each string emits, for every candidate indexed length
  *     la in [len-k, len] (the shorter string is always the indexed one;
  *     ed <= k bounds the length gap by k), every segment index, and every
  *     start position within the ±k window, the exact substring of that
  *     segment's length — O((k+1)²(2k+1)) keys per string, constant in n.
  *   - equi-join on (la, segIdx, segText), dedupe candidate pairs, then
  *     verify with the banded `levenshtein(l, r, threshold)` (O(k·len)
  *     per pair, not O(len²)).
  *
  * 100 TB shape: both sides are linear expansions of the input (constant
  * factor in k), the join is a plain equi-shuffle on short substring keys,
  * and the quadratic work only ever happens inside a signature bucket —
  * which for non-pathological data is the near-match population. The
  * degenerate case is a corpus sharing long constant prefixes (every
  * segment collides); callers should strip known constant prefixes first,
  * exactly like choosing a shingle size for MinHash.
  *
  * Pair orientation: output rows are (left = indexed = shorter string,
  * right = probe = longer string), ties on length broken by id — the same
  * (length, id) lexicographic rule the reference-free oracle replicates.
  */
object FuzzyJoin {

  /** All unordered pairs of `df` rows whose `strCol` values are within
    * Levenshtein distance `k`. Output: (left_id, right_id, dist), with
    * (left length, left id) < (right length, right id) lexicographically.
    *
    * `df` must have unique ids in `idCol`; null/empty strings participate
    * (an empty string is within k of any string of length <= k).
    */
  def editJoin(df: DataFrame, k: Int,
               idCol: String = "doc_id", strCol: String = "s"): DataFrame = {
    require(k >= 1 && k <= 8, s"k must be in [1, 8], got $k")
    val m = k + 1
    // Inline let-bindings for segment geometry: start/length of segment i
    // of an la-char string split into m even pieces (integer division —
    // matches on both sides because it is the same closed form).
    def segStart(la: String, i: String) = s"(($i * $la) div $m)"
    def segLen(la: String, i: String) =
      s"((($i + 1) * $la) div $m - ($i * $la) div $m)"

    val base = df.select(col(idCol).as("fj_id"),
      coalesce(col(strCol), lit("")).as("fj_s"),
      length(coalesce(col(strCol), lit(""))).as("fj_len"))

    // Index side: the k+1 segments of each string, keyed by its own length.
    val st = segStart("fj_len", "i"); val sl = segLen("fj_len", "i")
    val index = base.select(col("fj_id").as("left_id"),
        col("fj_s").as("left_s"), col("fj_len").as("la"),
        explode(expr(
          s"""transform(sequence(0, $k), i -> struct(
             |  i AS i,
             |  substring(fj_s, CAST($st AS INT) + 1, CAST($sl AS INT)) AS seg))"""
            .stripMargin)).as("ik"))
      .select(col("left_id"), col("left_s"), col("la"),
        col("ik.i").as("i"), col("ik.seg").as("seg"))

    // Probe side: for every shorter-candidate length la, segment i, and
    // start position within ±k of the segment's home position, the exact
    // substring of that segment's length. `filter` (not a sequence upper
    // bound) drops positions past the end — Spark's sequence() rejects
    // inverted bounds rather than returning empty.
    val pst = segStart("la", "i"); val psl = segLen("la", "i")
    val probe = base.select(col("fj_id").as("right_id"),
        col("fj_s").as("right_s"), col("fj_len").as("right_len"),
        explode(expr(
          s"""flatten(transform(sequence(greatest(0, fj_len - $k), fj_len), la ->
             |  flatten(transform(sequence(0, $k), i ->
             |    transform(
             |      filter(sequence(greatest(0, $pst - $k), $pst + $k),
             |             p -> p + $psl <= fj_len),
             |      p -> struct(la AS la, i AS i,
             |        substring(fj_s, CAST(p AS INT) + 1, CAST($psl AS INT)) AS seg))))))"""
            .stripMargin)).as("pk"))
      .select(col("right_id"), col("right_s"), col("right_len"),
        col("pk.la").as("la"), col("pk.i").as("i"), col("pk.seg").as("seg"))

    probe.join(index, Seq("la", "i", "seg"))
      // Role rule: indexed side is strictly smaller by (length, id) —
      // kills self-pairs and the double-count of equal-length pairs.
      .filter(col("la") < col("right_len") ||
        (col("la") === col("right_len") && col("left_id") < col("right_id")))
      .select("left_id", "right_id", "left_s", "right_s")
      .distinct() // a pair can agree on several surviving segments
      .withColumn("dist", levenshtein(col("left_s"), col("right_s"), k))
      .filter(col("dist") =!= -1) // banded DP: -1 means > k
      .select("left_id", "right_id", "dist")
  }
}
