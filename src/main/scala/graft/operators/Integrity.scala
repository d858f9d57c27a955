package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pipeline-integrity audits: the accounting queries a curation pipeline
  * runs BESIDE its filters — where do documents go (per-stage attrition),
  * and do the splits it emits actually hold (near-dup leakage across
  * train/val/test). Both are integer-exact by construction.
  *
  * Reference scope: the reference engine's counting surface
  * (spark-streaming-kafka-bucket-counter.py:169-178, bucket counts per
  * key) has no curation layer; these are the §"beyond the reference"
  * training-data-pipeline operators mandated by the build brief.
  */
object Integrity {

  /** Per-stage attrition of a cumulative filter cascade.
    *
    * Output: one row per stage —
    * (stage, filter, n_in, n_kept, n_dropped), where `n_in` of stage i is
    * `n_kept` of stage i-1 (stage 1 sees every row). Stages apply
    * cumulatively in the given order, which is the number a pipeline
    * report wants: "how many docs did THIS gate remove from what was
    * still alive", not the marginal single-filter count.
    *
    * Plan shape: all survival flags evaluate in ONE narrow pass (a
    * single `when`-chain projection — no per-stage jobs, no cache), then
    * a single global aggregate emits one row of counters that explodes
    * into stage rows. Cost at 100 TB = one full scan + a 1-row shuffle,
    * independent of stage count; every predicate stays inside
    * whole-stage codegen. */
  def filterCascade(df: DataFrame, stages: Seq[(String, Column)]): DataFrame = {
    require(stages.nonEmpty, "need at least one stage")
    // surv(0) = every row; surv(i) = rows passing stages 1..i
    val surv = stages.scanLeft(lit(true)) { case (acc, (_, pred)) => acc && pred }
    // coalesce: sum over ZERO rows is NULL, and an empty input must
    // report an all-zero cascade, not a null one.
    val counters = surv.zipWithIndex.map { case (c, i) =>
      coalesce(sum(when(c, 1L).otherwise(0L)), lit(0L)).as(s"_c$i")
    }
    val one = df.agg(counters.head, counters.tail: _*)
    val stageRows = stages.zipWithIndex.map { case ((name, _), i) =>
      struct(lit((i + 1).toLong).as("stage"), lit(name).as("filter"),
        col(s"_c$i").as("n_in"), col(s"_c${i + 1}").as("n_kept"),
        (col(s"_c$i") - col(s"_c${i + 1}")).as("n_dropped"))
    }
    one.select(explode(array(stageRows: _*)).as("s")).select("s.*")
  }

  /** Eval-set decontamination audit: near-dup clusters whose members
    * straddle more than one split. A train/test split computed per
    * document leaks whenever two near-duplicates land on opposite sides —
    * the benchmark answer is literally in the training set. This reports
    * every violating cluster with its member count and the splits it
    * touches (sorted, ','-joined — the repo's no-raw-array convention).
    *
    * `clusters` is a (idCol, clusterCol) assignment (e.g.
    * [[Dedup.clusters]]); `splitCol` is a pure expression over idCol
    * (e.g. [[Curation.splitOf]]), so no join is needed to attach it —
    * the audit is ONE hash aggregate over the doc-sized cluster table.
    * Singleton clusters can't straddle and drop out via the
    * `n_splits > 1` filter. */
  def splitLeakage(clusters: DataFrame, splitCol: Column,
                   clusterCol: String = "cluster_id"): DataFrame =
    clusters
      .withColumn("_split", splitCol)
      .groupBy(clusterCol)
      .agg(count(lit(1)).as("n_docs"),
        size(collect_set(col("_split"))).cast("long").as("n_splits"),
        array_join(sort_array(collect_set(col("_split"))), ",").as("splits"))
      .filter(col("n_splits") > 1L)
}
