package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FunnelSpec extends SparkSpec {

  private lazy val ss: org.apache.spark.sql.SparkSession = spark

  private def run(rows: Seq[(Long, Long, String)], stages: Seq[String]) = {
    import ss.implicits._
    Funnel.funnel(rows.toDF("user_id", "us", "event_type"), stages)
      .collect()
      .map(r => r.getLong(0) -> ((r.getSeq[Long](1), r.getLong(2)))).toMap
  }

  test("stages complete strictly in order at the earliest eligible event") {
    val got = run(Seq(
      // user 1: full funnel, with a pre-view click that must NOT count
      (1L, 5L, "click"), (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
      // user 2: purchase before click → stuck at stage 1
      (2L, 10L, "view"), (2L, 15L, "purchase"), (2L, 20L, "click"),
      // user 3: no view at all → stage 0
      (3L, 10L, "click"), (3L, 20L, "purchase")),
      Seq("view", "click", "purchase"))
    assert(got(1L) === ((Seq(10L, 20L, 30L), 3L)))
    assert(got(2L) === ((Seq(10L, 20L, -1L), 2L)))
    assert(got(3L) === ((Seq(-1L, -1L, -1L), 0L)))
  }

  test("equal-timestamp later stage does not count (strict after)") {
    val got = run(Seq((1L, 10L, "view"), (1L, 10L, "click"), (1L, 20L, "click")),
      Seq("view", "click"))
    assert(got(1L) === ((Seq(10L, 20L), 2L)))
  }

  test("repeated stage types need distinct strictly-later events") {
    val got = run(Seq((1L, 10L, "view"), (1L, 25L, "view"),
      (2L, 10L, "view")), Seq("view", "view"))
    assert(got(1L) === ((Seq(10L, 25L), 2L)))
    assert(got(2L) === ((Seq(10L, -1L), 1L)))
  }

  test("funnel matches the cascaded-min reference on random data") {
    val rnd = new scala.util.Random(42)
    val types = Vector("view", "click", "purchase", "other")
    val rows = (1L to 400L).map { i =>
      (rnd.nextInt(30).toLong, rnd.nextInt(50).toLong, types(rnd.nextInt(4)))
    }.distinct // distinct (user, ts, type): ties in ts across types remain
    val stages = Seq("view", "click", "purchase")
    val expected = rows.groupBy(_._1).map { case (u, evs) =>
      val ts = stages.foldLeft(List.empty[Long]) { (acc, st) =>
        val after = acc.headOption
        val cand = evs.filter(e => e._3 == st &&
          (after.isEmpty || (after.get != -1L && e._2 > after.get)))
        acc.prepended(
          if (after.contains(-1L) || cand.isEmpty) -1L else cand.map(_._2).min)
      }.reverse
      u -> ((ts, ts.count(_ != -1L).toLong))
    }
    assert(run(rows, stages) === expected)
  }

  test("cohortRetention builds the standard triangle") {
    import ss.implicits._
    val rows = Seq((1L, 5L), (1L, 15L), (1L, 25L), // cohort 0, active 0/1/2
      (2L, 12L), (2L, 28L), // cohort 1, active 1/2
      (3L, 21L)) // cohort 2, active 2
    val got = Funnel.cohortRetention(rows.toDF("user_id", "us"), 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((0L, 0L, 1L), (0L, 1L, 1L), (0L, 2L, 1L),
      (1L, 0L, 1L), (1L, 1L, 1L), (2L, 0L, 1L)))
  }
}
