package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rename-projection — operator P2 (`json_dict_parse`,
  * `audit_utils/audit_utils/utils.py:23-60`): emit exactly the configured
  * columns, renamed per `{new -> source}`; unknown source fields are dropped
  * (they're simply not selected), and declaration order is preserved.
  *
  * Catalyst turns this into column pruning pushed all the way into the scan —
  * the reference hand-rolled the same optimization by building a fresh dict
  * with only the projected keys (SURVEY.md §4).
  */
object Project {

  /** `select(source as new, ...)` per the CODE's `{new: source}` contract
    * (`audit_utils/audit_utils/utils.py:56-58` — note the README example shows
    * the reverse direction and would KeyError under the code; SURVEY.md §1.3). */
  def renameProject(df: DataFrame, msgMap: Seq[(String, String)]): DataFrame =
    df.select(msgMap.map { case (newName, src) => col(src).as(newName) }: _*)

  /** Like [[renameProject]] but keeps extra passthrough columns (e.g. the
    * bucket columns appended by [[Bucketize]]) after the projected ones. */
  def renameProjectKeeping(df: DataFrame, msgMap: Seq[(String, String)],
                           keep: Seq[String]): DataFrame =
    df.select(msgMap.map { case (n, s) => col(s).as(n) } ++ keep.map(col): _*)

  /** Drop-key projection — operator P1 (`lambda x: x[1]`,
    * `spark-streaming-kafka-bucket-counter.py:124`): from a Kafka-shaped frame
    * keep only the value, as a string. */
  def dropKey(df: DataFrame, valueCol: String = "value"): DataFrame =
    df.select(col(valueCol).cast("string").as("value"))
}
