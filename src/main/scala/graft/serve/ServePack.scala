package graft.serve

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.QueryPack

/** Serve-path SQL over the TPC-H-ish star schema — the surface a reference
  * user reaches through the Q2 arbitrary-SQL endpoint. The reference
  * delegates these to SQLite's engine (SURVEY.md §2.4: it implements no
  * joins/sorts/limits of its own); here Catalyst plans them: dimension
  * tables broadcast (AQE auto-selects under the 10 MB threshold), fact-side
  * filters push into the parquet scan, top-N compiles to TakeOrdered.
  *
  * Outputs stay integer-exact (counted rows, casted sums, cent-scaled
  * prices) so the DuckDB comparison is bit-stable despite double columns. */
object ServePack extends QueryPack {

  private def run(s: SparkSession, dir: String, names: Seq[String],
                  sql: String): DataFrame = {
    names.foreach(n => table(s, dir, n).createOrReplaceTempView(n))
    s.sql(sql)
  }

  /** Revenue scaled to exact cents per item then summed as longs — the
    * deterministic stand-in for SUM(double). */
  private val RevenueCents =
    "CAST(round(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)"

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Fact ⋈ two broadcast dims → grouped agg (the Q2 join path).
    "q_sql_join_agg" -> ((s, dir) => run(s, dir,
      Seq("lineitem", "supplier", "nation"),
      s"""SELECT n.n_name AS nation, count(*) AS n_items,
         |  CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS total_qty,
         |  sum($RevenueCents) AS revenue_cents
         |FROM lineitem l
         |JOIN supplier s ON l.l_suppkey = s.s_suppkey
         |JOIN nation n ON s.s_nationkey = n.n_nationkey
         |GROUP BY n.n_name""".stripMargin)),
    // Deterministic top-N (count desc, key asc tie-break) → TakeOrdered.
    "q_sql_topn" -> ((s, dir) => run(s, dir, Seq("orders"),
      """SELECT o_custkey, count(*) AS n_orders
        |FROM orders GROUP BY o_custkey
        |ORDER BY n_orders DESC, o_custkey ASC LIMIT 10""".stripMargin)),
    // Range predicate that must reach the parquet scan (pushdown audit case).
    "q_sql_filter" -> ((s, dir) => run(s, dir, Seq("lineitem"),
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin))
  )

  override def oracles: Map[String, String] = Map(
    "q_sql_join_agg" ->
      s"""SELECT n.n_name AS nation, count(*) AS n_items,
         |  CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS total_qty,
         |  CAST(sum($RevenueCents) AS BIGINT) AS revenue_cents
         |FROM lineitem l
         |JOIN supplier s ON l.l_suppkey = s.s_suppkey
         |JOIN nation n ON s.s_nationkey = n.n_nationkey
         |GROUP BY n.n_name""".stripMargin,
    "q_sql_topn" ->
      """SELECT o_custkey, count(*) AS n_orders
        |FROM orders GROUP BY o_custkey
        |ORDER BY n_orders DESC, o_custkey ASC LIMIT 10""".stripMargin,
    "q_sql_filter" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin
  )
}
