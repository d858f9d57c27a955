package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class FuzzyJoinSpec extends SparkSpec {

  private def strs(rows: (Long, String)*): DataFrame = {
    val sparkSession = spark
    import sparkSession.implicits._
    rows.toDF("doc_id", "s")
  }

  private def pairs(df: DataFrame, k: Int): Set[(Long, Long, Int)] =
    FuzzyJoin.editJoin(df, k).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  /** Brute-force reference: classic Levenshtein DP. */
  private def ed(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def brute(rows: Seq[(Long, String)], k: Int): Set[(Long, Long, Int)] =
    (for {
      a <- rows; b <- rows
      if a._2.length < b._2.length ||
        (a._2.length == b._2.length && a._1 < b._1)
      d = ed(a._2, b._2) if d <= k
    } yield (a._1, b._1, d)).toSet

  test("substitution, insertion, deletion pairs all surface at k=1") {
    val df = strs(1L -> "abcdef", 2L -> "abcxef", // substitution
      3L -> "abcdeff", // insertion at end vs 1
      4L -> "bcdef", // deletion at front vs 1
      5L -> "zzzzzz") // unrelated
    val got = pairs(df, 1)
    assert(got === brute(Seq(1L -> "abcdef", 2L -> "abcxef", 3L -> "abcdeff",
      4L -> "bcdef", 5L -> "zzzzzz"), 1))
    assert(got.contains((1L, 2L, 1)))
    assert(got.contains((1L, 3L, 1)))
    assert(got.contains((4L, 1L, 1))) // shorter string is always left
    assert(!got.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("matches brute force on a randomized corpus at k=2") {
    val rnd = new scala.util.Random(0xF022) // fixed seed: deterministic suite
    val alphabet = "abc" // tiny alphabet to force many near-pairs
    val rows = (1L to 60L).map { i =>
      i -> Seq.fill(4 + rnd.nextInt(6))(alphabet(rnd.nextInt(3))).mkString
    }
    assert(pairs(strs(rows: _*), 2) === brute(rows, 2))
  }

  test("edits that shift segment positions (early insert/delete) are not lost") {
    // k=2, strings long enough for 3 segments; the first edit shifts every
    // later segment's home position — the ±k probe window must absorb it.
    val rows = Seq(1L -> "0123456789ab", 2L -> "X0123456789ab",
      3L -> "XY0123456789ab", 4L -> "123456789ab")
    assert(pairs(strs(rows: _*), 2) === brute(rows, 2))
  }

  test("empty and sub-(k+1)-length strings participate correctly") {
    val rows = Seq(1L -> "", 2L -> "a", 3L -> "ab", 4L -> "ba", 5L -> "abcd")
    assert(pairs(strs(rows: _*), 2) === brute(rows, 2))
    // sanity: "" is within 2 of "ab" but not of "abcd"
    val got = pairs(strs(rows: _*), 2)
    assert(got.contains((1L, 3L, 2)))
    assert(!got.exists(p => p._1 == 1L && p._2 == 5L))
  }

  test("null strings are treated as empty") {
    val sparkSession = spark
    import sparkSession.implicits._
    val df = Seq((1L, null: String), (2L, "ab"), (3L, "abcdef"))
      .toDF("doc_id", "s")
    val got = pairs(df, 2)
    assert(got === Set((1L, 2L, 2)))
  }

  test("candidate generation is an equi-join, not a cross join") {
    val df = strs((1L to 50L).map(i => i -> s"doc-$i-${"x" * (i % 7).toInt}"): _*)
    val plan = FuzzyJoin.editJoin(df, 2).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"fuzzy join must never plan a cross join:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"fuzzy join must never plan a nested-loop join:\n$plan")
  }
}
