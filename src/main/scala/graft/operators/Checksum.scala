package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Order-independent content checksums — the cheap answer to "are these
  * two 100 TB tables the same data?" after a migration, a backfill, or an
  * engine swap. Every row is canonicalized to a delimited string, hashed
  * with MD5, and the per-group digest is a commutative reduction (count +
  * exact integer SUM of a hash prefix + min/max digest), so the result is
  * independent of partitioning, file order, and engine — two tables match
  * iff their checksum rows match, and a per-group breakdown localizes a
  * mismatch to a partition instead of a full diff.
  *
  * Canonicalization rules the caller must follow: pass only columns whose
  * string rendering is engine-portable — integers and strings verbatim;
  * floats must be quantized to integers first (float→string formatting is
  * NOT portable across engines). NULLs collapse in `concat_ws`, so columns
  * where NULL≠'' matters need an explicit sentinel.
  *
  * Scale: one projection + one partial+final aggregate on the group keys;
  * the sum prefix is 28 bits so even 2^25 rows per group stay exact in a
  * BIGINT with 10 orders of magnitude to spare.
  */
object Checksum {

  /** MD5 hex digest of the '|'-joined canonical columns. */
  def rowDigest(canonicalCols: Seq[Column]): Column =
    md5(concat_ws("|", canonicalCols: _*).cast("binary"))

  /** Per-group checksum: (groupCols, n_rows, checksum, h_min, h_max).
    * `checksum` is the exact sum of each digest's leading-28-bit prefix;
    * min/max digests pin the hash set's extremes so single-row drift
    * cannot cancel in the sum unnoticed. */
  def tableChecksum(df: DataFrame, groupCols: Seq[String],
                    canonicalCols: Seq[Column]): DataFrame = {
    require(canonicalCols.nonEmpty, "checksum needs at least one column")
    val h = rowDigest(canonicalCols)
    val grouped =
      if (groupCols.isEmpty) df.select(h.as("_h")).groupBy()
      else df.select(groupCols.map(col) :+ h.as("_h"): _*)
        .groupBy(groupCols.map(col): _*)
    grouped.agg(count(lit(1)).as("n_rows"),
      sum(conv(substring(col("_h"), 1, 7), 16, 10).cast("long")).as("checksum"),
      min(col("_h")).as("h_min"), max(col("_h")).as("h_max"))
  }

  /** One foreign-key relation to audit: display name, child table +
    * key column, parent table + key column. */
  final case class FkRelation(name: String, child: DataFrame, childKey: String,
                              parent: DataFrame, parentKey: String)

  /** Referential-integrity audit — the other half of the migration check
    * ([[tableChecksum]] says "same rows"; this says "keys still line up"):
    * per relation, the child row count, how many child keys are NULL
    * (legal under SQL RI — not orphans), and how many NON-NULL child keys
    * have no parent. One pass per relation: child keys LEFT JOIN the
    * distinct parent key set, then a single conditional aggregate; the
    * parent side is key-distinct (dimension-sized for star schemas —
    * Catalyst/AQE picks broadcast when it fits), and the scalar results
    * union into one audit table. */
  def fkAudit(relations: Seq[FkRelation]): DataFrame = {
    require(relations.nonEmpty, "audit needs at least one relation")
    relations.map { r =>
      val parentKeys = r.parent.select(col(r.parentKey).as("_k")).distinct()
        .withColumn("_p", lit(1))
      r.child.select(col(r.childKey).as("_k"))
        .join(parentKeys, Seq("_k"), "left")
        .agg(count(lit(1)).as("n_child"),
          // coalesce: sum over ZERO rows is NULL, and an empty child table
          // (the failed-migration case this audit exists for) must report
          // 0s, not nulls that NPE consumers or slip through `> 0` filters.
          coalesce(sum(when(col("_k").isNull, 1L).otherwise(0L)), lit(0L))
            .as("n_null_keys"),
          coalesce(sum(when(col("_k").isNotNull && col("_p").isNull, 1L)
            .otherwise(0L)), lit(0L)).as("n_orphans"))
        .select(lit(r.name).as("relation"), col("n_child"),
          col("n_null_keys"), col("n_orphans"))
    }.reduce(_.unionByName(_))
  }
}
