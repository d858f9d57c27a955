package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-set membership joins with a bloom prefilter — the 100 TB pattern for
  * applying a large keep/drop/benchmark key list to a huge fact table.
  *
  * A plain semi/anti join shuffles the ENTIRE fact side on the key. The
  * bloom path builds a compact filter over the key set once (distributed
  * aggregate via Spark's own `BloomFilterAggregate`; the bytes are the
  * build artifact, a few MB for millions of keys), probes it in a narrow
  * codegen'd scan (`BloomFilterMightContain`), and only the bloom-POSITIVE
  * rows reach the exact verification join — so the shuffled volume drops
  * to (true matches + false positives) instead of the whole table.
  * Semantics stay EXACT: the verify join removes every false positive, so
  * both operators equal their plain-join counterparts row-for-row (that is
  * what the oracle checks).
  *
  * Requires [[graft.plans.GraftExtensions.register]] (installs `bloom_agg`
  * / `bloom_contains`). Both sides hash with `xxhash64`, the same hash
  * Spark's injected runtime bloom filters use.
  */
object BloomJoin {

  /** Build the serialized bloom filter over `keys.keyCol` — one distributed
    * aggregate; only the filter bytes come back to the driver (the same
    * driver-held-build-artifact shape as a broadcast join's hash relation).
    * Size the filter via `estItems`/`numBits` (~1.44·n·log2(1/fpp) bits). */
  def buildFilter(keys: DataFrame, keyCol: String,
                  estItems: Long, numBits: Long): Array[Byte] =
    keys.select(call_function("bloom_agg", xxhash64(col(keyCol)),
      lit(estItems), lit(numBits)).as("bf")).head().getAs[Array[Byte]](0)

  /** Narrow membership probe: NULL for a NULL key, like any comparison. */
  def mightContain(filter: Array[Byte], key: Column): Column =
    call_function("bloom_contains", lit(filter), xxhash64(key))

  /** Exact `big ⋉ keys` (left-semi on `bigKey = keysKey`) with the bloom
    * prefilter ahead of the shuffle. NULL keys never match, as in SQL. */
  def semiJoin(big: DataFrame, bigKey: String, keys: DataFrame, keysKey: String,
               estItems: Long = 1000000L, numBits: Long = 8388608L): DataFrame = {
    val bf = buildFilter(keys, keysKey, estItems, numBits)
    big.filter(coalesce(mightContain(bf, col(bigKey)), lit(false)))
      .join(keys.select(col(keysKey).as(bigKey)).distinct(), Seq(bigKey), "left_semi")
  }

  /** Exact `big ▷ keys` (left-anti). Bloom-NEGATIVE rows are definite
    * keepers and skip the join entirely — only bloom-positive rows are
    * verified. NULL-key rows are kept (a NULL never equals any key),
    * matching left-anti semantics. */
  def antiJoin(big: DataFrame, bigKey: String, keys: DataFrame, keysKey: String,
               estItems: Long = 1000000L, numBits: Long = 8388608L): DataFrame = {
    val bf = buildFilter(keys, keysKey, estItems, numBits)
    val maybe = coalesce(mightContain(bf, col(bigKey)), lit(false))
    big.filter(!maybe)
      .unionByName(big.filter(maybe)
        .join(keys.select(col(keysKey).as(bigKey)).distinct(), Seq(bigKey), "left_anti"))
  }
}
