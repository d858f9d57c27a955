package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.config.{BucketType, MsgSettings, GraftConfig}

/** Message decode + projection + bucketing — the reference's per-record parse
  * path (`json_dict_bucket_parse`, `audit_utils/audit_utils/utils.py:62-97`)
  * restated as one declarative plan fragment:
  *
  *   raw value --from_json--> struct --select(renames)--> key columns
  *                                 \--bucket field--> bucket_start/bucket_end
  *
  * Strictness: the reference hard-errors (KeyError → record lost) when a
  * projected field is missing (`utils.py:58`), while `from_json` yields null.
  * `strict = true` reproduces the record-dropped outcome by filtering rows
  * where any projected source field parsed to null (documented divergence:
  * a field explicitly set to JSON null is also dropped; SURVEY.md §4 pitfall 3).
  */
object Decode {

  /** Parse a JSON string column into the projected source fields (all strings —
    * the reference treats values opaquely, SURVEY.md §1.2).
    *
    * `_parsed` is produced through an `explode(array(...))` generator
    * barrier: `from_json` is CodegenFallback (no subexpression elimination),
    * and a plain `withColumn` gets inlined by `CollapseProject` into every
    * downstream field access — re-parsing the JSON once per referenced
    * field. A Generate operator evaluates the parse exactly once per row and
    * downstream references are free attribute lookups (measured ~4× on the
    * full decode path). `array(x)` is always one element, so no rows are
    * added or dropped. */
  def parseJson(df: DataFrame, valueCol: String, schema: StructType): DataFrame =
    df.select(col("*"), explode(array(from_json(col(valueCol), schema))).as("_parsed"))

  /** Full decode pipeline for a frame of raw JSON strings in `valueCol`:
    * returns exactly (projected columns ..., bucket_start, bucket_end). */
  def decode(df: DataFrame, valueCol: String, msg: MsgSettings,
             strict: Boolean = true): DataFrame = {
    val schema = GraftConfig.msgMapToJsonSchema(msg.msgMapSchema, msg.bucketField)
    val parsed = parseJson(df, valueCol, schema)
    val strictFiltered =
      if (strict) {
        val required = (msg.msgMapSchema.map(_._2) :+ msg.bucketField).distinct
        val allPresent = required
          .map(f => col("_parsed").getField(f).isNotNull)
          .reduce(_ && _)
        // SURVEY §4 pitfall 3: the reference ERRORS on a missing field, we
        // drop the record — but the drop must be countable, not silent. The
        // observation rides the same pass (no extra job); read it after an
        // action via df.queryExecution.observedMetrics("graft_decode").
        parsed
          .observe("graft_decode",
            count(lit(1)).as("rows_in"),
            sum(when(allPresent, 0L).otherwise(1L)).as("rows_dropped"))
          .filter(allPresent)
      } else parsed
    val epoch = Bucketize.toEpochSeconds(
      col("_parsed").getField(msg.bucketField), msg.bucketType)
    val start = Bucketize.bucketStart(epoch, msg.bucketInterval.toLong)
    val projected = msg.msgMapSchema.map { case (newName, src) =>
      col("_parsed").getField(src).as(newName)
    }
    strictFiltered.select(projected :+ start.as("bucket_start")
      :+ (start + msg.bucketInterval).as("bucket_end"): _*)
  }
}
