package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryPack

/** Driver-checkable queries for [[Bpe]] tokenizer training. The DuckDB
  * oracle replicates the ENTIRE k-iteration induction value-for-value as a
  * mechanically generated chain of CTEs — per iteration: windowed pair
  * counts → `(count DESC, l, r)` argmax → greedy-leftmost merge expressed
  * as gaps-and-islands run parity (positions matching the winning pair,
  * grouped into maximal runs, keep odd offsets — exactly what the Spark
  * side's left fold computes). So the learned merge table itself is
  * hash-checked, not just row counts.
  */
object BpePack extends QueryPack {

  /** Merge count for the driver gate: enough iterations to exercise
    * multi-char merges (rank 6+ at sf0.01 merges into a prior merge) while
    * keeping the unrolled oracle tractable for DuckDB. */
  private val K = 8

  /** One training per (session, sf dir) for the three DERIVED queries
    * (vocab/encode/tokens): they need the SAME trained tokenizer, and the
    * token table is localCheckpoint-materialized, so the memoized
    * DataFrame is safely re-consumable — without this a Verify pass pays
    * the 8-iteration induction 4×. q_bpe_merges deliberately does NOT use
    * the memo: it is the benchmark's training query, and a min-of-2 timing
    * over a memo hit would report a fiction. */
  private val trained = new java.util.concurrent.ConcurrentHashMap[
    String, (Seq[Bpe.Merge], DataFrame)]()
  private def train(s: SparkSession, dir: String): (Seq[Bpe.Merge], DataFrame) =
    trained.computeIfAbsent(s.hashCode() + "|" + dir,
      _ => Bpe.train(graft.Tables.spread(table(s, dir, "documents")), K))

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // The learned merge table — the tokenizer-training artifact itself.
    // Unmemoized: this is the bench's training-cost query (see `trained`).
    "q_bpe_merges" -> { (s, dir) =>
      val (merges, _) = Bpe.train(graft.Tables.spread(table(s, dir, "documents")), K)
      s.createDataFrame(merges)
    },
    // Weighted token vocabulary after the k merges.
    "q_bpe_vocab" -> { (s, dir) =>
      Bpe.vocab(train(s, dir)._2)
    },
    // Encode the corpus with the trained tokenizer: per-doc BPE token
    // counts via a broadcast word → token-count join.
    "q_bpe_encode" -> { (s, dir) =>
      Bpe.encode(graft.Tables.spread(table(s, dir, "documents")), train(s, dir)._2)
    },
    // Vocabulary drift: tokenizer word table built from the EVEN doc_ids,
    // odd documents scored for out-of-vocabulary words — the train/serve
    // drift monitor (same-corpus OOV is vacuously zero).
    "q_bpe_oov" -> { (s, dir) =>
      val docs = graft.Tables.spread(table(s, dir, "documents"))
      Bpe.oovStats(docs.filter(pmod(col("doc_id"), lit(2)) === 1),
        Bpe.wordTable(docs.filter(pmod(col("doc_id"), lit(2)) === 0), "text"))
    },
    // The ordered per-document token sequences themselves. Space-joined
    // for the gate (tokens never contain whitespace, so it's lossless —
    // and the driver's value hashing is only proven on scalars).
    "q_bpe_tokens" -> { (s, dir) =>
      Bpe.encodeTokens(graft.Tables.spread(table(s, dir, "documents")), train(s, dir)._2)
        .select(col("doc_id"), array_join(col("tokens"), " ").as("tokens"))
    }
  )

  override def oracles: Map[String, String] = Map(
    "q_bpe_merges" -> oracleSql(K, Merges),
    "q_bpe_vocab" -> oracleSql(K, Vocab),
    "q_bpe_encode" -> oracleSql(K, Encode),
    "q_bpe_tokens" -> oracleSql(K, Tokens),
    // OOV needs only the word SET, not the merge chain.
    "q_bpe_oov" ->
      """WITH v AS (SELECT DISTINCT w AS word FROM (
        |    SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
        |    FROM documents WHERE doc_id % 2 = 0) WHERE w <> ''),
        |dw AS (SELECT doc_id,
        |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
        |  FROM documents WHERE doc_id % 2 = 1)
        |SELECT doc_id, count(*) AS n_words,
        |  CAST(sum(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_oov
        |FROM dw LEFT JOIN v ON dw.w = v.word
        |WHERE dw.w <> '' GROUP BY doc_id""".stripMargin
  )

  private sealed trait Output
  private case object Merges extends Output
  private case object Vocab extends Output
  private case object Encode extends Output
  private case object Tokens extends Output

  /** Unrolled k-iteration BPE in DuckDB SQL (validated against an
    * independent reference implementation at sf0.001/sf0.01). */
  private def oracleSql(k: Int, out: Output): String = {
    val parts = Seq.newBuilder[String]
    parts += """w0 AS (
      |  SELECT w AS word, count(*) AS weight
      |  FROM (SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
      |        FROM documents)
      |  WHERE w <> '' GROUP BY w)""".stripMargin
    parts += """tok1 AS (
      |  SELECT word, weight, CAST(g.i AS BIGINT) AS pos,
      |         substr(word, CAST(g.i AS INT), 1) AS token
      |  FROM w0, unnest(generate_series(1, length(word))) AS g(i))""".stripMargin
    for (i <- 1 to k) {
      parts += s"""best$i AS (
        |  SELECT l, r, CAST(sum(weight) AS BIGINT) AS pair_count
        |  FROM (SELECT token AS l,
        |               lead(token) OVER (PARTITION BY word ORDER BY pos) AS r,
        |               weight
        |        FROM tok$i)
        |  WHERE r IS NOT NULL GROUP BY l, r
        |  ORDER BY pair_count DESC, l, r LIMIT 1)""".stripMargin
      // LEFT JOIN, not CROSS JOIN: when training exhausts before k merges,
      // best_i is EMPTY — a cross join would wipe the token table, while
      // the Spark side stops early and keeps it. With a null best row,
      // `hit` is NULL → `keep` falsy → tok_{i+1} = tok_i (validated: an
      // "ab ab" corpus under k=3 keeps vocab {ab: 2} on both engines).
      parts += s"""m$i AS (
        |  SELECT t.word, t.weight, t.pos, t.token, b.l, b.r,
        |         (t.token = b.l AND
        |          lead(t.token) OVER (PARTITION BY t.word ORDER BY t.pos) = b.r
        |         ) AS hit
        |  FROM tok$i t LEFT JOIN best$i b ON true)""".stripMargin
      parts += s"""i$i AS (
        |  SELECT *,
        |         pos - row_number() OVER (PARTITION BY word, hit ORDER BY pos)
        |           AS isl
        |  FROM m$i)""".stripMargin
      parts += s"""k$i AS (
        |  SELECT *, hit AND (row_number() OVER
        |    (PARTITION BY word, hit, isl ORDER BY pos) % 2 = 1) AS keep
        |  FROM i$i)""".stripMargin
      parts += s"""tok${i + 1} AS (
        |  SELECT word, weight,
        |         row_number() OVER (PARTITION BY word ORDER BY pos) AS pos,
        |         CASE WHEN keep THEN l || r ELSE token END AS token
        |  FROM (SELECT *, lag(keep) OVER (PARTITION BY word ORDER BY pos)
        |          AS consumed
        |        FROM k$i)
        |  WHERE consumed IS DISTINCT FROM true)""".stripMargin
    }
    val select = out match {
      case Merges =>
        (1 to k).map(i =>
          s"SELECT CAST($i AS BIGINT) AS merge_rank, l AS lhs, r AS rhs, " +
            s"pair_count FROM best$i").mkString("\nUNION ALL\n")
      case Vocab =>
        s"SELECT token, CAST(sum(weight) AS BIGINT) AS cnt " +
          s"FROM tok${k + 1} GROUP BY token"
      case Encode =>
        s"""SELECT doc_id, CAST(sum(n_toks) AS BIGINT) AS n_bpe_tokens
           |FROM (SELECT doc_id,
           |        unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
           |      FROM documents) dw
           |JOIN (SELECT word, count(*) AS n_toks FROM tok${k + 1}
           |      GROUP BY word) wl ON dw.w = wl.word
           |WHERE dw.w <> '' GROUP BY doc_id""".stripMargin
      case Tokens =>
        s"""SELECT doc_id,
           |  array_to_string(flatten(list(toks ORDER BY wpos)), ' ') AS tokens
           |FROM (SELECT doc_id, wl[CAST(g.i AS INT)] AS w,
           |        CAST(g.i AS BIGINT) AS wpos
           |      FROM (SELECT doc_id,
           |              string_split_regex(trim(lower(text)), '\\s+') AS wl
           |            FROM documents) t,
           |           unnest(generate_series(1, len(wl))) AS g(i)) dw
           |JOIN (SELECT word, list(token ORDER BY pos) AS toks
           |      FROM tok${k + 1} GROUP BY word) wt ON dw.w = wt.word
           |WHERE dw.w <> '' GROUP BY doc_id""".stripMargin
    }
    "WITH " + parts.result().mkString(",\n") + "\n" + select
  }
}
