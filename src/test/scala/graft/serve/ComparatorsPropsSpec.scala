package graft.serve

import org.apache.spark.sql.functions.col
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec

/** Randomized pinning of the comparator DSL against a direct Scala
  * evaluation of the REFERENCE's reversed-argument semantics
  * (`models.py:828-830`: comparison(param, value) with the param on the
  * LEFT): for random rows and random (comparator, args) maps, the
  * Catalyst-compiled filter must keep exactly the rows the reference's
  * Python predicate would. */
class ComparatorsPropsSpec extends SparkSpec {

  private def samples[A](gen: Gen[A], n: Int, seed: Long): List[A] =
    Gen.listOfN(n, gen).apply(Gen.Parameters.default, Seed(seed))
      .getOrElse(sys.error("scalacheck sampling failed"))

  private val cmpGen: Gen[(String, Any)] = Gen.oneOf(
    Gen.chooseNum(-5L, 5L).map("eq" -> _),
    Gen.chooseNum(-5L, 5L).map("gte" -> _),
    Gen.chooseNum(-5L, 5L).map("gt" -> _),
    Gen.chooseNum(-5L, 5L).map("lte" -> _),
    Gen.chooseNum(-5L, 5L).map("lt" -> _),
    Gen.zip(Gen.option(Gen.chooseNum(-5L, 5L)), Gen.option(Gen.chooseNum(-5L, 5L)))
      .map { case (lo, hi) => ("range", (lo, hi)) },
    Gen.zip(Gen.option(Gen.chooseNum(-5L, 5L)), Gen.option(Gen.chooseNum(-5L, 5L)))
      .map { case (lo, hi) => ("erange", (lo, hi)) })

  /** The reference's semantics, evaluated directly (`str_to_func`,
    * `models.py:1038-1080`): a = param, b = row value. */
  private def refEval(name: String, args: Any, b: Long): Boolean = (name, args) match {
    case ("eq", a: Long)  => b == a
    case ("gte", a: Long) => a >= b
    case ("gt", a: Long)  => a > b
    case ("lte", a: Long) => a <= b
    case ("lt", a: Long)  => a < b
    case ("range", (lo: Option[Long @unchecked], hi: Option[Long @unchecked])) =>
      (lo, hi) match {
        case (None, None)       => true // fully open range = everything
        case (Some(l), None)    => l <= b
        case (None, Some(h))    => h >= b
        case (Some(l), Some(h)) => l <= b && h >= b
      }
    case ("erange", (lo: Option[Long @unchecked], hi: Option[Long @unchecked])) =>
      (lo, hi) match {
        case (None, None)       => false // fully open erange = NOTHING (Py2 None>)
        case (Some(l), None)    => l < b
        case (None, Some(h))    => h > b
        case (Some(l), Some(h)) => l < b && h > b
      }
    case other => sys.error(s"unexpected $other")
  }

  test("random comparator maps keep exactly the reference's rows (300 cases)") {
    val sparkSession = spark
    import sparkSession.implicits._
    val values = samples(Gen.chooseNum(-6L, 6L), 40, seed = 7L).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }
    val df = values.toDF("id", "x")

    val cases = samples(Gen.mapOfN(2, Gen.zip(Gen.const("x"), cmpGen))
      .suchThat(_.nonEmpty), 300, seed = 11L)
    cases.foreach { params =>
      val got = Comparators.cGeneralSelect(df, params)
        .select("id").collect().map(_.getLong(0)).toSet
      val want = values.collect {
        case (id, v) if params.forall { case (_, (n, a)) => refEval(n, a, v) } => id
      }.toSet
      assert(got === want, s"params=$params")
    }
  }
}
