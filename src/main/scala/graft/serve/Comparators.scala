package graft.serve

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The query-surface comparison DSL — operators Q6–Q10
  * (`TableComparison` + `DumpTable.*select*`,
  * `audit_utils/audit_utils/models.py:811-1106`) compiled to Catalyst
  * `Column` predicates.
  *
  * ⚠ Argument order is the REFERENCE'S, and it is reversed from what the
  * names suggest: every comparison is `comparison(param, value)` with the
  * query parameter on the LEFT (`models.py:828-830`: "the `a` argument comes
  * from the dict_params and the `b` argument is the entry"). So `gt(2)`
  * selects rows whose value is LESS than 2 — pinned by the reference's own
  * doctest (`models.py:847-858`: gt with param 2 matches {'count': 1}).
  * The `Column` translations below keep the parameter on the left to make
  * that visible: `gt(a)` → `lit(a) > col`.
  *
  * `range`/`erange` are inclusive/exclusive betweens over a `(lo, hi)` pair
  * with `None` = unbounded (`models.py:1060-1080`). A fully-open `range`
  * matches everything (explicit first branch, `models.py:1072-1073`), but a
  * fully-open `erange` matches NOTHING: it falls through to `a[1] > b` =
  * `None > b`, which is always False in Python 2 — preserved here as
  * `lit(false)`.
  *
  * The reference's `custom:` comparator is arbitrary `eval()`
  * (`models.py:1104-1106`) and is DELIBERATELY not ported (code execution);
  * the nearest safe analog for power users is `expr(...)` via the Q2 SQL
  * passthrough, which goes through the SQL parser instead of the language
  * runtime.
  */
object Comparators {

  /** A parsed comparison: given the column, produce the predicate. */
  type Cmp = Column => Column

  /** Q8 `str_to_func` (`models.py:1038-1056`). `args` is the `a` parameter:
    * a single value for scalar comparators, a `(Option, Option)` pair for
    * range/erange. */
  def compile(name: String, args: Any): Cmp = name match {
    case "eq"  => c => c === toLit(args)
    case "gte" => c => toLit(args) >= c
    case "gt"  => c => toLit(args) > c
    case "lte" => c => toLit(args) <= c
    case "lt"  => c => toLit(args) < c
    case "range"  => rangeCmp(args, exclusive = false)
    case "erange" => rangeCmp(args, exclusive = true)
    case other => throw new IllegalArgumentException(
      s"Function ($other) not supported") // incl. 'custom:' — not ported
  }

  private def rangeCmp(args: Any, exclusive: Boolean): Cmp = {
    val (lo, hi) = args match {
      case (l: Option[_], h: Option[_]) => (l, h)
      case (l, h)                       => (Option(l), Option(h))
      case other => throw new IllegalArgumentException(
        s"range expects a (lo, hi) pair, got $other")
    }
    c => {
      val loOk = lo.map(v => if (exclusive) toLit(v) < c else toLit(v) <= c)
      val hiOk = hi.map(v => if (exclusive) toLit(v) > c else toLit(v) >= c)
      // Fully open: range → everything; erange → nothing (see object doc).
      (loOk.toSeq ++ hiOk.toSeq).reduceOption(_ && _).getOrElse(lit(!exclusive))
    }
  }

  private def toLit(a: Any): Column = a match {
    case c: Column => c
    case v         => lit(v)
  }

  /** Q6 `general_select` (`models.py:811-872`): ONE comparator for all
    * params, AND-conjunction. A param naming a column absent from the frame
    * matches nothing (the reference's `key not in item` branch). */
  def generalSelect(df: DataFrame, comparison: String,
                    params: Map[String, Any]): DataFrame =
    selectWith(df, params.view.mapValues(a => (comparison, a)).toMap)

  /** Q7 `c_general_select` (`models.py:874-928`): per-param comparator.
    * Empty params → EMPTY result (the reference returns `[]`, not all rows —
    * doctest `models.py:908-910`). */
  def cGeneralSelect(df: DataFrame,
                     params: Map[String, (String, Any)]): DataFrame =
    if (params.isEmpty) df.limit(0) else selectWith(df, params)

  private def selectWith(df: DataFrame,
                         params: Map[String, (String, Any)]): DataFrame = {
    if (params.keys.exists(k => !df.columns.contains(k))) return df.limit(0)
    val pred = params.map { case (colName, (cmpName, args)) =>
      compile(cmpName, args)(col(colName))
    }.reduce(_ && _)
    df.filter(pred)
  }

  /** Parse the Q7 endpoint's JSON parameter shape
    * (`/c/<json>/EOE`, `http_endpoint.py:202-212`):
    * `{"col": ["cmp", arg], "col2": ["range", lo, hi]}` — two args after the
    * comparator name become the (lo, hi) pair; JSON null = open bound. */
  def parseJsonParams(json: String): Map[String, (String, Any)] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(json)
    require(node != null && node.isObject, s"expected a JSON object, got: $json")
    val out = scala.collection.mutable.LinkedHashMap.empty[String, (String, Any)]
    node.properties().forEach { e =>
      val arr = e.getValue
      require(arr.isArray && arr.size() >= 2,
        s"bad c_dict_params for '${e.getKey}': $arr")
      val cmp = arr.get(0).asText()
      def v(i: Int): Option[Any] = arr.get(i) match {
        case n if n.isNull    => None
        case n if n.isIntegralNumber => Some(n.asLong())
        case n if n.isNumber  => Some(n.asDouble())
        case n if n.isBoolean => Some(n.asBoolean())
        case n                => Some(n.asText())
      }
      val args: Any =
        if (arr.size() == 2) v(1).orNull
        else (v(1), v(2))
      out += e.getKey -> ((cmp, args))
    }
    out.toMap
  }

  /** Q7 end to end: JSON params → compiled predicates → filtered frame. */
  def cGeneralSelectJson(df: DataFrame, json: String): DataFrame =
    cGeneralSelect(df, parseJsonParams(json))

  // ---- Q10 typed select sugar (`models.py:930-952`) ----

  /** `select` — eq on every param. */
  def select(df: DataFrame, params: Map[String, Any]): DataFrame =
    generalSelect(df, "eq", params)

  /** Q9 `select_range` (`models.py:934-936`, endpoint
    * `http_endpoint.py:186-200`): inclusive between with open `None` ends. */
  def selectRange(df: DataFrame, column: String,
                  lo: Option[Any], hi: Option[Any]): DataFrame =
    df.filter(compile("range", (lo, hi))(col(column)))

  def selectGte(df: DataFrame, params: Map[String, Any]): DataFrame =
    generalSelect(df, "gte", params)
  def selectGt(df: DataFrame, params: Map[String, Any]): DataFrame =
    generalSelect(df, "gt", params)
  def selectLte(df: DataFrame, params: Map[String, Any]): DataFrame =
    generalSelect(df, "lte", params)
  def selectLt(df: DataFrame, params: Map[String, Any]): DataFrame =
    generalSelect(df, "lt", params)
}
