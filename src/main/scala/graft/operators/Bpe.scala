package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING over a document corpus — the
  * standard LLM-pipeline step the reference has no analog for (its text
  * surface stops at counting; ref `spark_streaming_kafka_bucket_counter/
  * utils.py` bucket maps). Part of the training-data extension family.
  *
  * Scale design — the point of doing BPE on Spark at all: merges never
  * cross word boundaries (GPT-2-style word-level BPE), so the corpus is
  * first collapsed to a WEIGHTED UNIQUE-WORD table (one shuffle over the
  * raw text; 100 TB of text → ~10⁸ word rows), and every iteration after
  * that touches only that table:
  *
  *   - pair counting explodes adjacent token pairs and hash-aggregates
  *     with map-side partials — shuffle cardinality = distinct pairs
  *     (≤ vocab²-ish, in practice thousands), never corpus-scale;
  *   - the argmax is a `LIMIT 1` over that tiny aggregate, collected to
  *     the driver exactly like a k-means centroid update ([[Similarity]]);
  *   - applying the merge is a NARROW per-row array fold — no shuffle.
  *
  * Each iteration `localCheckpoint`s the rewritten token table, the same
  * lineage-truncation discipline as [[Dedup.connectedComponents]].
  *
  * Determinism: counts are exact integer sums; the winning pair is chosen
  * by `(count DESC, lhs ASC, rhs ASC)` — a total order, so results are
  * independent of partitioning. Merge application is greedy
  * leftmost-non-overlapping, which the left fold encodes naturally: after
  * a merge the accumulator's tail is `lhs||rhs`, which can't re-match
  * `lhs` (tokens are non-empty), so "aaa" under (a,a) yields [aa, a].
  *
  * Tokenization contract: words are `split(trim(lower(text)), "\s+")`,
  * initial symbols are Java chars (code-unit granularity — fine for the
  * BMP text this fixture carries; a production byte-level BPE would seed
  * from UTF-8 bytes instead, same iteration shape).
  */
object Bpe {

  /** One learned merge: rank (1-based), the pair, and its weighted count
    * at selection time. Field names match the driver-checked schema. */
  final case class Merge(merge_rank: Long, lhs: String, rhs: String,
                         pair_count: Long)

  /** Corpus → (word, weight) — the one corpus-scale shuffle. */
  def wordTable(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(trim(lower(col(textCol))), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("weight"))

  /** Adjacent (l, r) token pairs of `toks`, one struct per position.
    * `slice(_, 1, 0)` is the legal empty slice, so 1-token words simply
    * contribute nothing after the explode. */
  private val adjacentPairs: Column = explode(expr(
    "transform(slice(toks, 1, greatest(size(toks) - 1, 0)), " +
      "(x, i) -> struct(x AS l, toks[i+1] AS r))"))

  /** Greedy leftmost application of one merge as a narrow array fold.
    * Built with the Column API (not an `expr` string) so corpus-derived
    * token text can never be parsed as SQL. */
  private def applyMerge(l: String, r: String): Column =
    aggregate(col("toks"), array().cast("array<string>"), (acc, t) =>
      when(size(acc) > lit(0) && element_at(acc, -1) === lit(l) &&
             t === lit(r),
        concat(slice(acc, lit(1), size(acc) - lit(1)), array(lit(l + r))))
        .otherwise(concat(acc, array(t))))

  /** Run `k` merge inductions; returns the learned merges (driver-side,
    * `k` rows) and the final (word, weight, toks) table — the trained
    * TOKENIZER: a word → token-sequence map, broadcastable for encoding.
    * Stops early if no adjacent pair remains. */
  def train(docs: DataFrame, k: Int, textCol: String = "text")
      : (Seq[Merge], DataFrame) = {
    require(k >= 1, "need at least one merge iteration")
    var cur = wordTable(docs, textCol)
      .select(col("word"), col("weight"),
        filter(split(col("word"), ""), t => t =!= lit("")).as("toks"))
      .localCheckpoint(eager = true)
    val merges = Seq.newBuilder[Merge]
    var rank = 1L
    var exhausted = false
    while (rank <= k && !exhausted) {
      val top = cur.select(adjacentPairs.as("p"), col("weight"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("weight").as("pair_count"))
        .orderBy(col("pair_count").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, cnt) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Merge(rank, l, r, cnt)
        cur = cur.withColumn("toks", applyMerge(l, r))
          .localCheckpoint(eager = true)
        rank += 1
      }
    }
    (merges.result(), cur)
  }

  /** Lexicographic compare of two strings by their UTF-8 BYTES — the order
    * Spark's binary string comparison (and therefore [[train]]'s argmax
    * tie-break) uses. Differs from `String.compareTo` only beyond the BMP. */
  private def utf8Compare(a: String, b: String): Int = {
    val ab = a.getBytes("UTF-8"); val bb = b.getBytes("UTF-8")
    val n = math.min(ab.length, bb.length)
    var i = 0
    while (i < n) {
      val c = (ab(i) & 0xff) - (bb(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    ab.length - bb.length
  }

  /** (-count, l, r) ordering with UTF-8-byte string ties — see
    * [[trainLocal]]'s TreeSet. */
  private val pairTieOrdering: Ordering[(Long, String, String)] =
    (x: (Long, String, String), y: (Long, String, String)) => {
      val c0 = java.lang.Long.compare(x._1, y._1)
      if (c0 != 0) c0
      else {
        val c1 = utf8Compare(x._2, y._2)
        if (c1 != 0) c1 else utf8Compare(x._3, y._3)
      }
    }

  /** Vocabulary-scale training: the corpus-scale word COUNT stays
    * distributed (one shuffle, exactly [[wordTable]]), then the induction
    * loop runs IN-MEMORY on the collected weighted word table. This is
    * the production path for real merge counts — a 32k-merge tokenizer
    * under [[train]] means 64k+ sequential Spark jobs doing kilobytes of
    * work each; every real BPE trainer collapses to the word table first
    * because it is vocabulary-sized, not corpus-sized. Semantics are
    * IDENTICAL to [[train]] (same counts, tie-break, greedy-leftmost
    * merge — property-tested equivalent), with one standard knob:
    * `minWeight` drops words rarer than the floor from training (HF
    * `min_frequency`); 1 = exact.
    *
    * The loop keeps pair counts incrementally (pair → count + a
    * stale-tolerant pair → words index; only words containing the winning
    * pair are touched per merge) with the argmax from a sorted set — so a
    * merge costs O(touched words · word length + log #pairs), not a
    * vocabulary rescan. Driver memory holds the word table (prune with
    * `minWeight` when the raw vocabulary outgrows it).
    *
    * Returns the merges plus the same (word, weight, toks) tokenizer
    * DataFrame as [[train]], so [[encode]]/[[encodeTokens]]/[[vocab]]
    * compose unchanged. */
  def trainLocal(docs: DataFrame, k: Int, textCol: String = "text",
                 minWeight: Long = 1L): (Seq[Merge], DataFrame) = {
    require(k >= 1, "need at least one merge iteration")
    val spark = docs.sparkSession
    val words = wordTable(docs, textCol)
      .filter(col("weight") >= minWeight)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val seqs = words.map { case (w, _) => w.map(_.toString).toVector }
    val weight = words.map(_._2)

    val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
    val where = scala.collection.mutable.HashMap
      .empty[(String, String), scala.collection.mutable.Set[Int]]
    // Sorted by (count DESC, l, r) — with the TIE strings compared by
    // UTF-8 bytes, matching the binary sort order Spark's min_by/struct
    // comparison gives [[train]]. The JVM's natural String order compares
    // UTF-16 code units, which ranks non-BMP tokens (surrogate pairs,
    // 0xD800–0xDFFF) BELOW U+E000..U+FFFF where UTF-8 ranks them above —
    // on an equal-count tie the two paths would pick different winners.
    val order = scala.collection.mutable.TreeSet
      .empty[(Long, String, String)](pairTieOrdering)
    def bump(p: (String, String), delta: Long): Unit = {
      val old = counts.getOrElse(p, 0L)
      if (old != 0L) order.remove((-old, p._1, p._2))
      val now = old + delta
      if (now != 0L) { counts(p) = now; order.add((-now, p._1, p._2)) }
      else counts.remove(p)
    }
    def pairsOf(i: Int): Iterator[(String, String)] =
      if (seqs(i).size < 2) Iterator.empty
      else seqs(i).iterator.zip(seqs(i).iterator.drop(1))
    for (i <- seqs.indices; p <- pairsOf(i)) {
      bump(p, weight(i))
      where.getOrElseUpdate(p, scala.collection.mutable.Set.empty) += i
    }

    val merges = Seq.newBuilder[Merge]
    var rank = 1L
    while (rank <= k && order.nonEmpty) {
      val (negCnt, l, r) = order.head
      merges += Merge(rank, l, r, -negCnt)
      val touched = where.getOrElse((l, r), scala.collection.mutable.Set.empty)
      for (i <- touched.toSeq if seqs(i).size >= 2) {
        // Stale-tolerant: fully retract this word's pairs, fold-merge,
        // re-add — exact even if the index over-approximates membership.
        pairsOf(i).foreach(bump(_, -weight(i)))
        seqs(i) = seqs(i).foldLeft(Vector.empty[String]) { (acc, t) =>
          if (acc.nonEmpty && acc.last == l && t == r) acc.init :+ (l + r)
          else acc :+ t
        }
        pairsOf(i).foreach { p =>
          bump(p, weight(i))
          where.getOrElseUpdate(p, scala.collection.mutable.Set.empty) += i
        }
      }
      where.remove((l, r))
      rank += 1
    }

    val sess = spark
    import sess.implicits._
    val tokenizer = words.indices
      .map(i => (words(i)._1, weight(i), seqs(i)))
      .toDF("word", "weight", "toks")
    (merges.result(), tokenizer)
  }

  /** Weighted token frequencies after training — the induced vocabulary. */
  def vocab(tokenTable: DataFrame): DataFrame =
    tokenTable.select(col("weight"), explode(col("toks")).as("token"))
      .groupBy("token").agg(sum("weight").as("cnt"))

  /** Encode the corpus with a trained tokenizer: per-document BPE token
    * count. The tokenizer (word → token count) is BROADCAST — it is
    * vocabulary-sized, so at 100 TB the encode pass stays a narrow
    * map-side join over the exploded corpus plus one doc-key aggregate;
    * the inner join also makes the pass self-consistent (every corpus
    * word is in a tokenizer trained on the same corpus). */
  def encode(docs: DataFrame, tokenizer: DataFrame, idCol: String = "doc_id",
             textCol: String = "text"): DataFrame = {
    val wordLens = tokenizer
      .select(col("word"), size(col("toks")).cast("long").as("n_toks"))
    docs
      .select(col(idCol),
        explode(split(trim(lower(col(textCol))), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .join(broadcast(wordLens), "word")
      .groupBy(idCol).agg(sum("n_toks").as("n_bpe_tokens"))
  }

  /** Out-of-vocabulary monitoring: per-document word counts and how many
    * of them the trained tokenizer has never seen — the vocabulary-drift
    * signal a serving pipeline watches per ingest window (a rising OOV
    * rate means the tokenizer no longer fits the traffic). `vocabWords`
    * is any one-column `word` table (e.g. [[train]]'s tokenizer);
    * broadcast + narrow left join + one doc-key aggregate, so it runs
    * identically over a batch corpus or inside `foreachBatch`. */
  def oovStats(docs: DataFrame, vocabWords: DataFrame,
               idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol),
        explode(split(trim(lower(col(textCol))), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .join(broadcast(vocabWords.select(col("word"), lit(1L).as("_known"))),
        Seq("word"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_words"),
        sum(when(col("_known").isNull, 1L).otherwise(0L)).as("n_oov"))

  /** Full encoding: each document's ordered BPE token SEQUENCE — the
    * artifact a training pipeline actually writes. Same broadcast-join
    * plan as [[encode]] plus one doc-key aggregate that reassembles
    * order: `array_sort` over (position, word-tokens) structs then a
    * flatten, so the result is independent of partitioning (positions
    * are unique per document). Documents with no words are absent, like
    * every word-granular output here. */
  def encodeTokens(docs: DataFrame, tokenizer: DataFrame,
                   idCol: String = "doc_id", textCol: String = "text")
      : DataFrame =
    docs
      .select(col(idCol),
        posexplode(split(trim(lower(col(textCol))), "\\s+")))
      .withColumnRenamed("col", "word")
      .filter(col("word") =!= "")
      .join(broadcast(tokenizer.select("word", "toks")), "word")
      .groupBy(idCol)
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("pos"), col("toks")))),
        x => x.getField("toks"))).as("tokens"))
}
