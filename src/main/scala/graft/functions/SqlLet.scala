package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exactly-once evaluation helpers for expensive column expressions.
  *
  * Catalyst's `CollapseProject` inlines a projected column into every
  * downstream reference, and higher-order functions are interpreted with no
  * common-subexpression elimination — so an expensive expression (md5 over
  * an array, `from_json`, a regex split) referenced k times is COMPUTED k
  * times per row. Two standard barriers fix this:
  *
  *   - [[SqlLet.let]]: lambda variables are bound VALUES, so
  *     `transform(array(x), v -> body(v))[0]` evaluates `x` once no matter
  *     how many times `body` references `v`.
  *   - [[SqlLet.explodeOnce]]: a `Generate` operator evaluates its input
  *     once per row, and downstream references to the generator output are
  *     plain attribute references — the barrier for fanning one expensive
  *     struct/array out into many columns or rows.
  */
object SqlLet {

  /** let v = bind in body(v) — `bind` is evaluated exactly once per row. */
  def let(bind: Column, body: Column => Column): Column =
    element_at(transform(array(bind), body), 1)

  /** Two-variable let. */
  def let2(bindA: Column, bindB: Column, body: (Column, Column) => Column): Column =
    let(bindA, a => let(bindB, b => body(a, b)))

  /** Select `df.*` plus the exploded elements of `arrayExpr` as column
    * `as` — `arrayExpr` is evaluated exactly once per input row. */
  def explodeOnce(df: org.apache.spark.sql.DataFrame, arrayExpr: Column,
                  as: String): org.apache.spark.sql.DataFrame =
    df.select(col("*"), explode(arrayExpr).as(as))
}
