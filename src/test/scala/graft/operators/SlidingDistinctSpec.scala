package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** slidingDistinct: daily-sketch union over a calendar RANGE frame must
  * track the exact trailing-window distinct count within HLL error. */
class SlidingDistinctSpec extends SparkSpec {

  test("sliding sketch union matches exact trailing-window distincts") {
    val s = spark; import s.implicits._
    // (cat, day, user): users overlap across days; day 9 isolated after a
    // gap (calendar frame — the gap days shrink its window to itself).
    val rows = for (d <- 1L to 5L; u <- 1L to (10L * d)) yield ("a", d, u)
    val extra = Seq(("a", 9L, 999L), ("b", 1L, 1L), ("b", 3L, 2L))
    val du = (rows ++ extra).toDF("cat", "day", "user")
    val got = Sketches.slidingDistinct(du, Seq("cat"), "day", "user", window = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    // Exact trailing-3-calendar-day distincts (users are nested: day d has
    // users 1..10d, so the window max dominates).
    val exact = Map(("a", 1L) -> 10L, ("a", 2L) -> 20L, ("a", 3L) -> 30L,
      ("a", 4L) -> 40L, ("a", 5L) -> 50L, ("a", 9L) -> 1L,
      ("b", 1L) -> 1L, ("b", 3L) -> 2L)
    assert(got.keySet === exact.keySet)
    for ((k, ex) <- exact)
      assert(math.abs(got(k) - ex) * 10 <= ex || got(k) == ex,
        s"$k: approx ${got(k)} vs exact $ex")
  }
}
