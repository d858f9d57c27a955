package graft.serve

import graft.SparkSpec

/** Comparator-DSL doctests (`models.py:847-858,895-910`) — the REVERSED
  * (param, value) argument order is the load-bearing contract here. */
class ComparatorsSpec extends SparkSpec {

  private def dt = {
    val sparkSession = spark
    import sparkSession.implicits._
    Seq(("ex1", 1L), ("ex2", 2L), ("ex3", 3L)).toDF("name", "count")
  }

  test("general_select with gt: param 2 matches count=1 (doctest models.py:847-858)") {
    val got = Comparators.generalSelect(dt, "gt", Map("count" -> 2))
      .collect().map(_.getString(0)).toSeq
    assert(got === Seq("ex1")) // 2 > count → strictly-less rows
  }

  test("c_general_select: per-column comparators, empty params → EMPTY (doctest :895-910)") {
    val got = Comparators.cGeneralSelect(dt, Map("count" -> (("gt", 2))))
      .collect().map(_.getString(0)).toSeq
    assert(got === Seq("ex1"))
    assert(Comparators.cGeneralSelect(dt, Map.empty).count() === 0L)
  }

  test("range: inclusive with open ends; erange strict (models.py:1060-1080)") {
    def names(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.getString(0)).toSet
    assert(names(Comparators.selectRange(dt, "count", Some(2), Some(3))) ===
      Set("ex2", "ex3"))
    assert(names(Comparators.selectRange(dt, "count", None, Some(2))) ===
      Set("ex1", "ex2"))
    assert(names(Comparators.selectRange(dt, "count", None, None)) ===
      Set("ex1", "ex2", "ex3")) // fully-open range matches everything
    assert(names(Comparators.cGeneralSelect(dt,
      Map("count" -> (("erange", (Some(1), Some(3))))))) === Set("ex2"))
    // Fully-open erange matches NOTHING: the reference falls through to
    // `None > b`, always False in Python 2 (models.py:1081-1086).
    assert(names(Comparators.cGeneralSelect(dt,
      Map("count" -> (("erange", (None, None)))))) === Set.empty)
  }

  test("eq / typed sugar; missing column matches nothing") {
    assert(Comparators.select(dt, Map("name" -> "ex2")).count() === 1L)
    assert(Comparators.selectGte(dt, Map("count" -> 2)).count() === 2L) // 2 >= count
    assert(Comparators.selectLt(dt, Map("count" -> 2)).count() === 1L)  // 2 < count
    assert(Comparators.select(dt, Map("nope" -> 1)).count() === 0L)
  }

  test("Q7 JSON endpoint shape parses and filters (/c/<json>/EOE)") {
    val got = Comparators.cGeneralSelectJson(dt,
      """{"count": ["range", 2, null], "name": ["eq", "ex3"]}""")
      .collect().map(_.getString(0)).toSeq
    assert(got === Seq("ex3")) // count in [2, ∞) AND name = ex3
    val lt = Comparators.cGeneralSelectJson(dt, """{"count": ["gt", 2]}""")
      .collect().map(_.getString(0)).toSeq
    assert(lt === Seq("ex1")) // reversed order: 2 > count
  }

  test("custom: eval comparator is NOT supported (deliberate, models.py:1104-1106)") {
    intercept[IllegalArgumentException] {
      Comparators.compile("custom:a == b", 1)
    }
  }
}
