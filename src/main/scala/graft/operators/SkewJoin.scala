package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual lever when AQE's skew-join
  * split can't apply (it only splits sort-merge partitions, not e.g. a
  * shuffled hash join mid-stage) or when one key is SO hot that a single
  * task would still hold its whole partition.
  *
  * Mechanics: the skewed (big) side gets a deterministic salt in [0, s)
  * derived from stable row columns; the other side is replicated s ways
  * with `explode`. The join key becomes (key, salt), so one hot key's rows
  * spread over s tasks instead of one. Output is EXACTLY the plain inner
  * join — every big-side row still meets every matching small-side row,
  * exactly once (its one salt meets the one matching replica).
  *
  * Cost model: replication multiplies the small side's shuffle volume by s
  * — worth it while s · |small| ≪ |big_hot_key|. Pick s near the ratio of
  * the hottest key's row count to a comfortable task size. The salt is
  * `pmod(hash(saltFrom…), s)`, not `rand()`: reruns and retried tasks get
  * identical assignments, so the operator stays deterministic end-to-end.
  */
object SkewJoin {

  /** The deterministic salt lane in [0, salts) for a big-side row — exposed
    * so the spread/determinism properties are testable against the SAME
    * derivation the join uses. */
  def saltColumn(saltFrom: Seq[String], salts: Int): Column =
    pmod(hash(saltFrom.map(col): _*), lit(salts))

  /** Inner-join `big` (skewed on `keys`) with `small`, spreading each hot
    * key over `salts` tasks. `saltFrom` names big-side columns whose hash
    * spreads rows (an id column; never the join key itself — that would put
    * the hot key back in one task). */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 salts: Int, saltFrom: Seq[String]): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(saltFrom.nonEmpty, "saltFrom must name at least one big-side column")
    require(!(big.columns.contains("_salt") || small.columns.contains("_salt")),
      "_salt column name is reserved")
    val b = big.withColumn("_salt", saltColumn(saltFrom, salts))
    val s = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    b.join(s, keys :+ "_salt").drop("_salt")
  }
}
