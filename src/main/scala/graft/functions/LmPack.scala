package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.QueryPack
import TextFunctions._

/** Language-model-style corpus scoring and reweighting — the quality-filter
  * / data-mixing family a pretraining pipeline runs after dedup:
  *
  *   - `q_lm_crossent`: conditional bigram cross-entropy under a
  *     train-split LM ([[TextFunctions.conditionalCrossent]]) — the CCNet
  *     perplexity-filter shape, integer-exact (bit-length logs).
  *   - `q_pmi_topk`: top collocations by pointwise mutual information with
  *     a RATIONAL score (no log — order-isomorphic, oracle-exact), the
  *     phrase-mining pass feeding tokenizer vocab decisions.
  *   - `q_importance_weights` / `q_importance_sample`: DSIR-style
  *     target-vs-corpus importance weights and the per-language top-k
  *     selection they induce ([[TextFunctions.importanceWeights]]).
  *
  * All scores are exact integers or a single rounded rational — the same
  * no-transcendentals discipline as [[TextPack]], so every query
  * hash-compares against its DuckDB oracle.
  *
  * Reference scope note: the reference engine (a streaming bucket counter,
  * `/root/reference/spark-streaming-kafka-bucket-counter.py`) has no text
  * surface; this family is part of the builder-brief LLM-pipeline mandate.
  */
object LmPack extends QueryPack {

  /** Same 80/10/10 hash split as q_heldout_familiarity — the shared
    * leakage-free train gate. */
  private def isTrain =
    graft.operators.Curation.splitOf(col("doc_id"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)) === "train"

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Conditional LM score of val/test docs under the train-split bigram
    // model: score = Σ (bitlen c(w1w2) − bitlen c(w1·)) ≤ 0, OOV tallied.
    "q_lm_crossent" -> { (s, dir) =>
      graft.plans.GraftExtensions.register(s) // md5_hash32 (the split draw)
      conditionalCrossent(table(s, dir, "documents"), isTrain)
    },
    // Top-20 collocations with support ≥ 5 by rational PMI
    // (c12·N)/(c1·c2). TakeOrderedAndProject does the global top-k
    // distributed; the row_number window then runs on 20 rows only.
    "q_pmi_topk" -> { (s, dir) =>
      val g = table(s, dir, "documents")
        .select(explode(wordNgrams(col("text"), 2)).as("ngram"))
        .groupBy("ngram").agg(count(lit(1)).as("c12"))
        .localCheckpoint(eager = true) // feeds total + both margins + score
      // One-row aggregate fetched to the driver (the justified scalar-fetch
      // pattern, cf. Curation's PPS total): attaching it via any join plans
      // a BroadcastNestedLoopJoin — Catalyst folds constant join keys to a
      // trivially-true condition — which the all-pairs plan guard forbids.
      val nTotal = g.agg(sum("c12")).head.getLong(0)
      val c1 = g.groupBy(split(col("ngram"), " ").getItem(0).as("w"))
        .agg(sum("c12").as("c1"))
      val c2 = g.groupBy(split(col("ngram"), " ").getItem(1).as("w"))
        .agg(sum("c12").as("c2"))
      val scored = g.filter(col("c12") >= 5)
        .withColumn("w1", split(col("ngram"), " ").getItem(0))
        .withColumn("w2", split(col("ngram"), " ").getItem(1))
        .join(c1, col("w1") === c1("w")).drop("w")
        .join(c2, col("w2") === c2("w")).drop("w")
        .withColumn("score",
          round((col("c12") * lit(nTotal)) / (col("c1") * col("c2")), 6))
      val top = scored.orderBy(col("score").desc, col("ngram").asc).limit(20)
      top.withColumn("rank", row_number()
          .over(Window.orderBy(col("score").desc, col("ngram").asc)).cast("long"))
        .select("ngram", "c12", "c1", "c2", "score", "rank")
    },
    // DSIR weights of every non-target doc vs the src0 "curated" target.
    "q_importance_weights" -> { (s, dir) =>
      importanceWeights(table(s, dir, "documents"), col("source") === "src0")
    },
    // The selection those weights induce: top-50 per language by
    // (weight desc, doc_id asc) — WindowGroupLimit prunes pre-shuffle.
    "q_importance_sample" -> { (s, dir) =>
      val w = Window.partitionBy("lang")
        .orderBy(col("weight").desc, col("doc_id").asc)
      importanceWeights(table(s, dir, "documents"), col("source") === "src0")
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 50)
    }
  )

  /** Shared oracle CTEs: whitespace bigrams per doc (same idiom as
    * TextPack's familiarity oracles). */
  private val BigramCtes =
    """w AS (SELECT doc_id, lang, source,
      |    string_split_regex(trim(text), '\s+') AS ws FROM documents),
      |bg AS (SELECT doc_id, lang, source,
      |    unnest([ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))]) AS ngram
      |  FROM w)""".stripMargin

  override def oracles: Map[String, String] = Map(
    "q_lm_crossent" ->
      s"""WITH $BigramCtes,
         |sp AS (SELECT doc_id,
         |    ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
         |      % 1000000 < 800000 AS is_train FROM documents),
         |m AS (SELECT ngram, count(*) AS cnt
         |  FROM bg JOIN sp USING (doc_id) WHERE is_train GROUP BY 1),
         |cx AS (SELECT split_part(ngram, ' ', 1) AS w1,
         |    CAST(sum(cnt) AS BIGINT) AS ctx_cnt FROM m GROUP BY 1),
         |m2 AS (SELECT ngram, cnt, ctx_cnt
         |  FROM m JOIN cx ON split_part(m.ngram, ' ', 1) = cx.w1)
         |SELECT bg.doc_id, count(*) AS n_bigrams,
         |  CAST(sum(CASE WHEN cnt IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
         |  CAST(coalesce(sum(CASE WHEN cnt IS NOT NULL
         |    THEN length(bin(cnt)) - length(bin(ctx_cnt)) ELSE 0 END), 0)
         |    AS BIGINT) AS score
         |FROM bg JOIN sp USING (doc_id) LEFT JOIN m2 USING (ngram)
         |WHERE NOT is_train GROUP BY 1""".stripMargin,
    "q_pmi_topk" ->
      s"""WITH $BigramCtes,
         |g AS (SELECT ngram, count(*) AS c12 FROM bg GROUP BY 1),
         |n AS (SELECT CAST(sum(c12) AS BIGINT) AS n_total FROM g),
         |m1 AS (SELECT split_part(ngram, ' ', 1) AS w,
         |    CAST(sum(c12) AS BIGINT) AS c1 FROM g GROUP BY 1),
         |m2 AS (SELECT split_part(ngram, ' ', 2) AS w,
         |    CAST(sum(c12) AS BIGINT) AS c2 FROM g GROUP BY 1),
         |sc AS (SELECT g.ngram, g.c12, m1.c1, m2.c2,
         |    round((g.c12 * n.n_total) / (m1.c1 * m2.c2), 6) AS score
         |  FROM g CROSS JOIN n
         |    JOIN m1 ON split_part(g.ngram, ' ', 1) = m1.w
         |    JOIN m2 ON split_part(g.ngram, ' ', 2) = m2.w
         |  WHERE g.c12 >= 5),
         |r AS (SELECT *, row_number() OVER
         |  (ORDER BY score DESC, ngram ASC) AS rank FROM sc)
         |SELECT ngram, c12, c1, c2, score, rank FROM r WHERE rank <= 20""".stripMargin,
    "q_importance_weights" ->
      s"""WITH $BigramCtes,
         |raw AS (SELECT ngram, count(*) AS rc FROM bg GROUP BY 1),
         |t AS (SELECT ngram, count(*) AS tc FROM bg WHERE source = 'src0' GROUP BY 1),
         |m AS (SELECT raw.ngram, rc, coalesce(tc, 0) AS tc
         |  FROM raw LEFT JOIN t USING (ngram))
         |SELECT doc_id, lang, count(*) AS n_bigrams,
         |  CAST(sum(length(bin(tc + 1)) - length(bin(rc + 1))) AS BIGINT) AS weight
         |FROM bg JOIN m USING (ngram) WHERE source <> 'src0' GROUP BY 1, 2""".stripMargin,
    "q_importance_sample" ->
      s"""WITH $BigramCtes,
         |raw AS (SELECT ngram, count(*) AS rc FROM bg GROUP BY 1),
         |t AS (SELECT ngram, count(*) AS tc FROM bg WHERE source = 'src0' GROUP BY 1),
         |m AS (SELECT raw.ngram, rc, coalesce(tc, 0) AS tc
         |  FROM raw LEFT JOIN t USING (ngram)),
         |sc AS (SELECT doc_id, lang, count(*) AS n_bigrams,
         |    CAST(sum(length(bin(tc + 1)) - length(bin(rc + 1))) AS BIGINT) AS weight
         |  FROM bg JOIN m USING (ngram) WHERE source <> 'src0' GROUP BY 1, 2),
         |r AS (SELECT *, row_number() OVER
         |  (PARTITION BY lang ORDER BY weight DESC, doc_id ASC) AS rank FROM sc)
         |SELECT doc_id, lang, n_bigrams, weight, rank FROM r WHERE rank <= 50""".stripMargin
  )
}
