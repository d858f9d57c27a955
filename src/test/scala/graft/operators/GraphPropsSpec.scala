package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec

/** ScalaCheck cross-checks for the graph and pipeline operators: random
  * small graphs/logs where a brute-force answer is computable in-memory,
  * pinned against the distributed formulation. Deterministic seeds — a
  * failure reproduces exactly. */
class GraphPropsSpec extends SparkSpec {

  /** Random undirected edge set over `n` nodes (u < v, distinct). */
  private def randomEdges(n: Int, m: Int, seed: Long): Set[(Long, Long)] =
    Gen.listOfN(m, Gen.zip(Gen.chooseNum(0L, n - 1L), Gen.chooseNum(0L, n - 1L)))
      .apply(Gen.Parameters.default, Seed(seed))
      .getOrElse(sys.error("scalacheck sampling failed"))
      .collect { case (a, b) if a != b => (a min b, a max b) }
      .toSet

  private def bruteTriangles(edges: Set[(Long, Long)]): Long = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    (for {
      (a, b) <- edges.toSeq // a < b by construction; c > b closes a<b<c once
      c <- nodes if c > b
    } yield if (edges((a, c)) && edges((b, c))) 1L else 0L).sum
  }

  test("triangleStats matches brute force on random graphs") {
    val sparkSession = spark
    import sparkSession.implicits._
    for (seed <- 1L to 4L) {
      val edges = randomEdges(n = 25, m = 120, seed)
      val df = edges.toSeq.toDF("u", "v")
      val r = Graphs.triangleStats(df).head()
      assert(r.getLong(1) === edges.size.toLong, s"edge count, seed $seed")
      assert(r.getLong(2) === bruteTriangles(edges), s"triangles, seed $seed")
    }
  }

  test("pageRank: mass conserved within truncation loss, repartition-invariant") {
    val sparkSession = spark
    import sparkSession.implicits._
    val Scale = 1000000000000L
    val edges = randomEdges(n = 40, m = 150, seed = 7L)
    val df = edges.toSeq.toDF("u", "v")
    val n = edges.flatMap(e => Seq(e._1, e._2)).size
    val ranks = Graphs.pageRankFixedPoint(df, iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ranks.size === n)
    val mass = ranks.values.sum
    // Each node each round can truncate < 1 unit per out-edge plus 1 in the
    // damping divide — total loss bounded far below 0.1% of the mass.
    assert(mass <= n.toLong * Scale)
    assert(mass >= n.toLong * Scale - n.toLong * 4L * 1000L)
    // Every rank is at least the teleport floor.
    assert(ranks.values.forall(_ >= 15L * Scale / 100L))
    // Bit-identical under a different partitioning (the fixed-point claim).
    val re = Graphs.pageRankFixedPoint(df.repartition(7), iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(re === ranks)
  }

  test("scd2: intervals chain over each key's span, states never repeat") {
    val sparkSession = spark
    import sparkSession.implicits._
    val states = Seq("a", "b", "c")
    // Unique (key, instant) pairs: instant ties produce zero-length
    // intervals whose ORDER the output alone cannot reconstruct, so chain
    // assertions on them would lean on collect() row order. The tie path
    // is pinned deterministically in PipelineSpec; here the invariants
    // need a total order.
    val rows = Gen.listOfN(300,
        Gen.zip(Gen.chooseNum(1L, 12L), Gen.oneOf(states), Gen.chooseNum(0L, 50L)))
      .apply(Gen.Parameters.default, Seed(11L))
      .getOrElse(sys.error("scalacheck sampling failed"))
      .distinctBy(r => (r._1, r._3))
      .zipWithIndex.map { case ((k, s, t), i) => (k, s, t, i.toLong) }
    val df = rows.toDF("k", "attr", "ts", "id")
    val out = Temporal.scd2(df, Seq("k"), "attr", "ts", Seq("id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) Long.MaxValue else r.getLong(3)))
    val byKey = out.groupBy(_._1)
    for ((k, ivs) <- byKey) {
      // Sort by (valid_from, valid_to): instant ties produce zero-length
      // intervals sharing valid_from, and relying on collect() row order
      // to break them would make the chain assertions flaky.
      val sorted = ivs.sortBy(r => (r._3, r._4))
      // Chain: each valid_to equals the next valid_from; last is open.
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4 === b._3, s"gap in chain for key $k")
          assert(a._2 !== b._2, s"un-collapsed run for key $k")
        case _ => ()
      }
      assert(sorted.last._4 === Long.MaxValue)
      // First interval opens at the key's earliest instant.
      val lo = rows.filter(_._1 == k).map(_._3).min
      assert(sorted.head._3 === lo)
    }
    // Interval count = number of state CHANGES under the (ts, id) order.
    for ((k, ivs) <- byKey) {
      val log = rows.filter(_._1 == k).sortBy(r => (r._3, r._4)).map(_._2)
      val changes = log.foldLeft(List.empty[String]) {
        case (acc, s) if acc.headOption.contains(s) => acc
        case (acc, s) => s :: acc
      }.size
      assert(ivs.length === changes, s"interval count for key $k")
    }
  }

  test("labelPropagation: label = min seed within iters hops (brute BFS)") {
    val sparkSession = spark
    import sparkSession.implicits._
    for (seed <- 11L to 13L; iters <- Seq(1, 3)) {
      val edges = randomEdges(n = 30, m = 55, seed)
      val adj = (edges.toSeq ++ edges.toSeq.map(_.swap))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val nodes = adj.keySet
      val seedNodes = nodes.filter(_ % 5 == 0)
      // Brute: frontier BFS to depth `iters`, take the min reachable seed.
      val expected = nodes.map { n =>
        var reach = Set(n)
        for (_ <- 1 to iters) reach = reach ++ reach.flatMap(adj)
        n -> (reach intersect seedNodes).minOption
      }.toMap
      val got = Graphs.labelPropagation(
          edges.toSeq.toDF("u", "v"),
          seedNodes.toSeq.map(x => (x, x)).toDF("node", "label"), iters)
        .collect()
        .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long]))
        .toMap
      assert(got === expected, s"seed $seed, iters $iters")
    }
  }

  test("hopDistance: min BFS depth within maxHops (brute), both join plans") {
    val sparkSession = spark
    import sparkSession.implicits._
    for (seed <- 11L to 13L; hops <- Seq(1, 3)) {
      val edges = randomEdges(n = 30, m = 55, seed)
      val adj = (edges.toSeq ++ edges.toSeq.map(_.swap))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val nodes = adj.keySet
      val seedNodes = nodes.filter(_ % 5 == 0)
      // Brute: level-synchronous BFS from the whole seed set.
      val expected = {
        var dist = seedNodes.map(_ -> 0L).toMap
        var frontier = seedNodes
        for (d <- 1 to hops) {
          frontier = frontier.flatMap(adj) -- dist.keySet
          dist = dist ++ frontier.map(_ -> d.toLong)
        }
        nodes.map(n => n -> dist.get(n)).toMap
      }
      val df = edges.toSeq.toDF("u", "v")
      val seedsDf = seedNodes.toSeq.toDF("node")
      def run(limit: Long): Map[Long, Option[Long]] =
        Graphs.hopDistance(df, seedsDf, maxHops = hops,
            broadcastNodeLimit = limit)
          .collect()
          .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long]))
          .toMap
      assert(run(Long.MaxValue) === expected, s"seed $seed, hops $hops")
      assert(run(0L) === expected, s"shuffle plan, seed $seed, hops $hops")
    }
  }

  test("weightedHopDistance: brute bounded Bellman-Ford, both join plans") {
    val sparkSession = spark
    import sparkSession.implicits._
    for (seed <- 11L to 12L; hops <- Seq(1, 3)) {
      val edges = randomEdges(n = 25, m = 45, seed)
        .map { case (u, v) => (u, v, 1L + (u + v) % 4) }
      val dirW = edges.toSeq ++ edges.toSeq.map { case (u, v, w) => (v, u, w) }
      val nodes = dirW.map(_._1).toSet
      val seedNodes = nodes.filter(_ % 5 == 0)
      // Brute: k rounds of relax-from-all with min-combine.
      var dist = nodes.map(n =>
        n -> (if (seedNodes(n)) Some(0L) else None)).toMap
      for (_ <- 1 to hops) {
        val relaxed = dirW.flatMap { case (s0, d0, w) =>
          dist(s0).map(x => d0 -> (x + w))
        }.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
        dist = dist.map { case (n, old) =>
          n -> (old ++ relaxed.get(n)).reduceOption(_ min _)
        }
      }
      val df = edges.toSeq.toDF("u", "v", "w")
      val seedsDf = seedNodes.toSeq.toDF("node")
      def run(limit: Long): Map[Long, Option[Long]] =
        Graphs.weightedHopDistance(df, seedsDf, maxHops = hops,
            broadcastNodeLimit = limit)
          .collect()
          .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long]))
          .toMap
      assert(run(Long.MaxValue) === dist, s"seed $seed, hops $hops")
      assert(run(0L) === dist, s"shuffle plan, seed $seed, hops $hops")
    }
    // A 2-edge cheap path must beat a 1-edge expensive one (min-PLUS, not
    // min-hop): 0 -5-> 2 but 0 -1-> 1 -1-> 2.
    val tri = Seq((0L, 2L, 5L), (0L, 1L, 1L), (1L, 2L, 1L)).toDF("u", "v", "w")
    val got = Graphs.weightedHopDistance(tri, Seq(0L).toDF("node"), maxHops = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(0L -> 0L, 1L -> 1L, 2L -> 2L))
  }

  test("personalizedPageRank: brute integer fixed-point, both join plans") {
    val sparkSession = spark
    import sparkSession.implicits._
    val Scale = 1000000000000L
    for (seed <- 11L to 12L) {
      // A seedless side component guarantees zero-rank nodes at any
      // density of the random part.
      val edges = randomEdges(n = 30, m = 55, seed) ++
        Seq((101L, 102L), (102L, 103L), (103L, 104L))
      val dir = edges.toSeq ++ edges.toSeq.map(_.swap)
      val deg = dir.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val nodes = deg.keySet
      val seedNodes = nodes.filter(_ % 5 == 0)
      var rank = nodes.map(n =>
        n -> (if (seedNodes(n)) Scale else 0L)).toMap
      for (_ <- 1 to 3) {
        val mass = dir.groupBy(_._2).view.mapValues(_.map { case (s, _) =>
          BigInt(rank(s) / deg(s))
        }.sum).toMap
        rank = nodes.map { n =>
          val t = if (seedNodes(n)) 15L * Scale / 100L else 0L
          n -> (t + (mass.getOrElse(n, BigInt(0)) * 85 / 100).toLong)
        }.toMap
      }
      val df = edges.toSeq.toDF("u", "v")
      val seedsDf = seedNodes.toSeq.toDF("node")
      def run(limit: Long): Map[Long, Long] =
        Graphs.personalizedPageRank(df, seedsDf, iters = 3,
            broadcastNodeLimit = limit)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(run(Long.MaxValue) === rank, s"seed $seed")
      assert(run(0L) === rank, s"shuffle plan, seed $seed")
      assert(rank.values.exists(_ > 0) && rank.values.exists(_ === 0L),
        "fixture must have both reached and unreached nodes")
    }
  }

  test("frequentPairs matches brute-force support counting") {
    val sparkSession = spark
    import sparkSession.implicits._
    val baskets = Gen.listOfN(60, Gen.listOfN(4, Gen.chooseNum(0L, 9L)))
      .apply(Gen.Parameters.default, Seed(31L))
      .getOrElse(sys.error("scalacheck sampling failed"))
      .zipWithIndex.flatMap { case (items, g) => items.map(i => (g.toLong, i)) }
    val members = baskets.distinct
    val itemSup = members.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val brute = members.groupBy(_._1).values.flatMap { grp =>
      val is = grp.map(_._2).sorted
      for (a <- is; b <- is if a < b) yield (a, b)
    }.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= 3L)
      .map { case ((a, b), n) => (a, b, n, itemSup(a), itemSup(b)) }.toSet
    val got = Graphs.frequentPairs(baskets.toDF("g", "item"), "g", "item", 3L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got === brute)
    assert(brute.nonEmpty, "fixture must exercise the threshold")
  }

  test("labelPropagationFixpoint: component-min seed, exact on a long chain") {
    val sparkSession = spark
    import sparkSession.implicits._
    // Random graphs: fixpoint = min seed of each connected component.
    for (seed <- 21L to 22L) {
      val edges = randomEdges(n = 30, m = 40, seed)
      val adj = (edges.toSeq ++ edges.toSeq.map(_.swap))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val nodes = adj.keySet
      val seedNodes = nodes.filter(_ % 5 == 0)
      def component(n: Long): Set[Long] = {
        var reach = Set(n); var prev = 0
        while (reach.size != prev) { prev = reach.size; reach = reach ++ reach.flatMap(adj) }
        reach
      }
      val expected = nodes.map(n =>
        n -> (component(n) intersect seedNodes).minOption).toMap
      val got = Graphs.labelPropagationFixpoint(
          edges.toSeq.toDF("u", "v"),
          seedNodes.toSeq.map(x => (x, x)).toDF("node", "label"))
        .collect()
        .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long]))
        .toMap
      assert(got === expected, s"seed $seed")
    }
    // Diameter-40 chain seeded only at the far end: the per-hop operator
    // would need 40 rounds; the CC-based fixpoint must still label node 40.
    val chain = (0L until 40L).map(i => (i, i + 1)).toDF("u", "v")
    val far = Graphs.labelPropagationFixpoint(chain, Seq((0L, 0L)).toDF("node", "label"))
      .filter(col("node") === 40L).head()
    assert(far.getLong(1) === 0L)
  }

  test("duplicatePassages: exactly the brute-force shared 3-gram set") {
    val sparkSession = spark
    import sparkSession.implicits._
    val vocab = Seq("red", "blue", "oak", "elm", "fox")
    val docs = Gen.listOfN(30, Gen.listOfN(8, Gen.oneOf(vocab)))
      .apply(Gen.Parameters.default, Seed(23L))
      .getOrElse(sys.error("scalacheck sampling failed"))
      .zipWithIndex.map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
    val brute = docs
      .flatMap { case (id, t) =>
        t.split(" ").sliding(3).map(g => (g.mkString(" "), id)) }
      .groupBy(_._1).view
      .mapValues(v => (v.map(_._2).distinct.size.toLong, v.size.toLong))
      .filter(_._2._1 >= 2).toMap
    val out = Dedup.duplicatePassages(docs.toDF("doc_id", "text"), w = 3)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out === brute)
  }

  test("broadcast hints are size-conditional; both join paths bit-identical") {
    val sparkSession = spark
    import sparkSession.implicits._
    val edges = randomEdges(n = 40, m = 200, seed = 7L).toSeq.toDF("u", "v")
    val seeds = Seq((0L, 0L), (13L, 13L)).toDF("node", "label")

    // broadcastNodeLimit = 0 forces the keyed-shuffle fallback; the default
    // broadcasts. The hint changes ONLY the physical join strategy, so
    // results must be bit-identical longs — the 100×-scale fallback is the
    // same operator, not a different approximation.
    def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
      df.collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))
    assert(sortedRows(Graphs.pageRankFixedPoint(edges, iters = 3)) ===
      sortedRows(Graphs.pageRankFixedPoint(edges, iters = 3, broadcastNodeLimit = 0)))
    assert(sortedRows(Graphs.labelPropagation(edges, seeds, iters = 3)) ===
      sortedRows(Graphs.labelPropagation(edges, seeds, iters = 3, broadcastNodeLimit = 0)))
    assert(sortedRows(Graphs.triangleStats(edges)) ===
      sortedRows(Graphs.triangleStats(edges, broadcastNodeLimit = 0)))

    // The conditional is real: the hinted plan carries a broadcast join
    // hint, the over-limit plan carries none (AQE may still pick broadcast
    // from runtime stats — that is its call, not a per-round driver build
    // we forced).
    def hinted(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.analyzed.toString.contains("UnresolvedHint") ||
        df.queryExecution.analyzed.toString.contains("ResolvedHint")
    assert(hinted(Graphs.pageRankFixedPoint(edges, iters = 1)))
    assert(!hinted(Graphs.pageRankFixedPoint(edges, iters = 1, broadcastNodeLimit = 0)))
    assert(hinted(Graphs.labelPropagation(edges, seeds, iters = 1)))
    assert(!hinted(Graphs.labelPropagation(edges, seeds, iters = 1, broadcastNodeLimit = 0)))
  }

  test("hot-group cap: one adversarial group cannot go quadratic") {
    val sparkSession = spark
    import sparkSession.implicits._
    // Group 1 holds 100 items (would emit 4950 pairs), groups 2/3 are
    // ordinary. With maxGroup = 64 the hot group is dropped WHOLESALE and
    // the polite groups are untouched — Dedup.MaxBand discipline.
    val membership =
      (1L to 100L).map(i => (1L, i)) ++
        Seq((2L, 1L), (2L, 2L), (2L, 3L), (3L, 2L), (3L, 3L))
    val df = membership.toDF("g", "item")

    val edges = Graphs.coOccurrenceEdges(df, "g", "item", maxGroup = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edges === Set((1L, 2L), (1L, 3L), (2L, 3L)))

    val pairs = Graphs.frequentPairs(df, "g", "item", minSup = 1L, maxGroup = 64)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // pair_n counts capped groups only; supports likewise count capped
    // membership, so support numbers stay consistent with the pairs.
    assert(pairs === Map(
      (1L, 2L) -> ((1L, 1L, 2L)),
      (1L, 3L) -> ((1L, 1L, 2L)),
      (2L, 3L) -> ((2L, 2L, 2L))))

    // Raising the cap past the hot group restores its pairs: the cap is a
    // declared knob, not a hidden truncation.
    val full = Graphs.coOccurrenceEdges(df, "g", "item", maxGroup = 128)
    assert(full.count() === (100L * 99L / 2L))
  }

  /** In-memory peel to the fixpoint — the definitionally-obvious
    * formulation the distributed loop is checked against. */
  private def bruteKCore(edges: Set[(Long, Long)], k: Long): Map[Long, Long] = {
    val adj = collection.mutable.Map.empty[Long, Set[Long]].withDefaultValue(Set())
    edges.foreach { case (u, v) => adj(u) += v; adj(v) += u }
    var nodes = adj.keySet.toSet
    var changed = true
    while (changed) {
      val drop = nodes.filter(n => (adj(n) & nodes).size < k)
      changed = drop.nonEmpty
      nodes --= drop
    }
    nodes.map(n => n -> (adj(n) & nodes).size.toLong).toMap
  }

  test("kCore matches brute-force peeling on random graphs") {
    val sparkSession = spark
    import sparkSession.implicits._
    for (seed <- 1L to 3L; k <- Seq(2L, 4L)) {
      val edges = randomEdges(n = 30, m = 90, seed)
      // Default path (small graph => r9 driver peel) AND the forced
      // distributed loop must both match the brute-force reference.
      val got = Graphs.kCore(edges.toSeq.toDF("u", "v"), k)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === bruteKCore(edges, k), s"seed $seed k $k")
      val dist = Graphs.kCore(edges.toSeq.toDF("u", "v"), k, driverLimit = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(dist === got, s"seed $seed k $k distributed")
    }
  }

  test("kCore peel cascades: chain dissolves round by round, clique survives") {
    val sparkSession = spark
    import sparkSession.implicits._
    // A 12-node chain hanging off a 4-clique: at k=2 the chain's free end
    // has degree 1, and each peel round exposes the next link — the
    // fixpoint needs ~12 cascading rounds, exercising the loop (not just
    // one drop pass), then leaves exactly the clique, where every node
    // keeps degree 3.
    val clique = for (a <- 0L to 3L; b <- (a + 1) to 3L) yield (a, b)
    val chain = (3L until 15L).map(i => (i, i + 1))
    // driverLimit = 0: this test exists to exercise the cascading LOOP.
    val got = Graphs.kCore((clique ++ chain).toDF("u", "v"), k = 2,
        driverLimit = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
    // Entirely sub-critical graph → empty core, loop terminates cleanly.
    assert(Graphs.kCore(chain.toDF("u", "v"), k = 2, driverLimit = 0L)
      .count() === 0L)
  }

  /** Textbook peel-order coreness (min-degree removal), the independent
    * formulation the h-index iteration is checked against. */
  private def bruteCoreness(edges: Set[(Long, Long)]): Map[Long, Long] = {
    val adj = collection.mutable.Map.empty[Long, Set[Long]].withDefaultValue(Set())
    edges.foreach { case (u, v) => adj(u) += v; adj(v) += u }
    var nodes = adj.keySet.toSet
    val core = collection.mutable.Map.empty[Long, Long]
    var k = 0L
    while (nodes.nonEmpty) {
      val d = nodes.map(n => n -> (adj(n) & nodes).size.toLong).toMap
      k = math.max(k, d.values.min)
      val peel = nodes.filter(n => d(n) <= k)
      peel.foreach(n => core(n) = k)
      nodes --= peel
    }
    core.toMap
  }

  test("h-index coreness converges to brute-force core numbers; coreness>=k = kCore") {
    val sparkSession = spark
    import sparkSession.implicits._
    for (seed <- 1L to 3L) {
      val edges = randomEdges(n = 30, m = 90, seed)
      val df = edges.toSeq.toDF("u", "v")
      // 30-node graphs converge well within 16 rounds.
      val got = Graphs.corenessHIndex(df, rounds = 16)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === bruteCoreness(edges), s"seed $seed")
      // The defining identity: {coreness >= k} is exactly the k-core.
      val kc = Graphs.kCore(df, k = 3).collect().map(_.getLong(0)).toSet
      assert(got.filter(_._2 >= 3L).keySet === kc, s"kcore identity, seed $seed")
    }
  }

  test("corenessHIndex maxDegree cap: saturation at the cap, exact below it") {
    val sparkSession = spark
    import sparkSession.implicits._
    // 6-clique: true coreness 5 everywhere. Cap 4 ⇒ every node saturates
    // to min(5, 4) = 4 — the declared semantics, not a wrong value.
    val clique = (for (a <- 0L to 5L; b <- (a + 1) to 5L) yield (a, b)).toDF("u", "v")
    val capped = Graphs.corenessHIndex(clique, rounds = 8, maxDegree = 4L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(capped === (0L to 5L).map(_ -> 4L).toMap)
    // Adversarial super-hub: a 50-leaf star. The hub's degree (50) blows
    // past cap 8, but its true coreness is 1 — the cap must leave the
    // result EXACT (top-8 of the leaves' 1-values still h-index to 1),
    // proving saturation only bites past the cap, never below it.
    val star = (1L to 50L).map(i => (0L, i)).toDF("u", "v")
    val starCore = Graphs.corenessHIndex(star, rounds = 4, maxDegree = 8L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(starCore === (0L to 50L).map(_ -> 1L).toMap)
    // Default cap on a random graph: identical to the uncapped brute force.
    val edges = randomEdges(n = 30, m = 90, seed = 7L)
    val got = Graphs.corenessHIndex(edges.toSeq.toDF("u", "v"), rounds = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === bruteCoreness(edges))
  }

  test("coreness driver gate equals the forced distributed rounds (caps included)") {
    val sparkSession = spark
    import sparkSession.implicits._
    for (seed <- Seq(5L, 11L); cap <- Seq(3L, Graphs.MaxDegree)) {
      val edges = randomEdges(n = 30, m = 90, seed).toSeq.toDF("u", "v")
      val drv = Graphs.corenessHIndex(edges, rounds = 4, maxDegree = cap)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val dist = Graphs.corenessHIndex(edges, rounds = 4, maxDegree = cap,
          driverLimit = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(drv === dist, s"seed $seed cap $cap")
    }
  }

  test("fixture convergence pin: q_coreness's 4 rounds reach the fixpoint") {
    // The driver's q_coreness runs 4 fixed h-index rounds and its DuckDB
    // oracle unrolls the SAME 4 rounds — if a fixture regeneration ever
    // produced a similarity graph needing more, both sides would agree on
    // non-coreness values and the hash compare would pass silently. Pin it
    // here on the ACTUAL driver graph (sf0.01, the correctness-gate scale):
    // rounds=4 must equal rounds=5, and {coreness ≥ 4} must equal the
    // k-core node set — under-convergence now fails loudly.
    graft.plans.GraftExtensions.register(spark) // simhashPairs uses md5_hash32
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.01", "documents")
    val pairs = Dedup.simhashPairs(docs, maxHamming = 8)
      .select(col("doc_a").as("u"), col("doc_b").as("v"))
      .localCheckpoint(eager = true)
    def run(rounds: Int): Map[Long, Long] =
      Graphs.corenessHIndex(pairs, rounds = rounds)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val c4 = run(4)
    assert(c4 === run(5), "q_coreness's fixed 4 rounds no longer converge " +
      "on the sf0.01 fixture graph — bump rounds in PipelinePack AND the " +
      "oracle's unroll together")
    val kc = Graphs.kCore(pairs, k = 4).collect().map(_.getLong(0)).toSet
    assert(c4.filter(_._2 >= 4L).keySet === kc,
      "coreness≥4 drifted from the k-core node set on the fixture graph")
  }

  test("kCore releases prior rounds' checkpoint blocks as it peels") {
    val sparkSession = spark
    import sparkSession.implicits._
    // The 12-round cascading chain from the peel spec — the case that
    // pinned O(rounds) edge-list copies before the release fix.
    val clique = for (a <- 0L to 3L; b <- (a + 1) to 3L) yield (a, b)
    val chain = (3L until 15L).map(i => (i, i + 1))
    val before = spark.sparkContext.getPersistentRDDs.keySet
    // driverLimit = 0: the release behavior under test is the LOOP's.
    Graphs.kCore((clique ++ chain).toDF("u", "v"), k = 2, driverLimit = 0L)
      .count()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    // Only the final surviving edge table (the returned result's basis)
    // may still hold blocks — not one per peel round.
    assert(leaked.size <= 1,
      s"kCore left ${leaked.size} checkpointed RDDs persisted (expected <= 1)")
  }

  test("kCore is bit-identical with broadcast hints disabled") {
    val sparkSession = spark
    import sparkSession.implicits._
    val edges = randomEdges(n = 40, m = 160, seed = 11L)
    val df = edges.toSeq.toDF("u", "v")
    val broadcastPath = Graphs.kCore(df, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val shufflePath = Graphs.kCore(df, k = 4, broadcastNodeLimit = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(broadcastPath === shufflePath)
  }
}
