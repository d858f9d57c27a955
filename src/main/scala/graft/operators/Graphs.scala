package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph primitives over edge DataFrames. Connected components
  * (pointer-doubling) live in [[Dedup.clusters]]; this adds the other
  * workhorse: triangle counting over a co-occurrence graph — the local
  * clustering signal used for community detection and link-spam scoring.
  *
  * Everything is equi-joins + hash aggregates — no cross join, no driver
  * collection of the graph.
  */
object Graphs {

  /** Default hot-group cap for [[coOccurrenceEdges]] / [[frequentPairs]]:
    * groups whose deduped membership exceeds this many items are dropped
    * before the pair-generating self-join. A group of size B contributes
    * B² candidate pairs, so ONE adversarial group (a viral item, a default
    * value, a mega-order) goes quadratic no matter how the rest of the
    * data looks — the identical hazard, and the identical remedy, as
    * [[Dedup.MaxBand]] for LSH bands. Capped groups are declared
    * semantics (the DuckDB oracles replicate the filter), not silent
    * truncation. Fixture group maxima are 7 (TPC-H order width) — far
    * under the default, so the cap is a pure scale guard there. */
  val MaxGroup = 256L

  /** Node-count ceiling under which the iterative operators broadcast
    * their node-sized state each round. Below it, broadcasting the rank /
    * label table avoids re-shuffling the full edge list every round
    * (iterative plans give AQE no runtime stats to discover this itself).
    * Above it, a per-round broadcast is the textbook scale-killer — a
    * multi-GB driver-built build per iteration, or an outright driver
    * OOM — so the hints are DROPPED and both joins become plain keyed
    * shuffles, the standard distributed plan.
    *
    * The ceiling is set by MEASUREMENT, not by what fits: a per-round
    * broadcast pays a driver-side collect+build+ship latency every
    * iteration, and the round-6 soak (SCALE.md) showed that cost
    * overtaking the keyed-shuffle plan well before memory is at risk —
    * at 200 k nodes label propagation ran 1.8–2.8× SLOWER broadcast than
    * shuffled, while at 20 k nodes broadcast won both operators. 100 k
    * (~2.4 MB of (long, long, long) state) keeps the default an order of
    * magnitude inside the measured-win regime; crossing it is a smooth
    * plan-strategy trade, not a cliff. */
  val BroadcastNodeLimit = 100000L

  /** Saturation cap for [[corenessHIndex]]: each round keeps only the TOP
    * `MaxDegree` neighbor values per node before the list aggregate, so the
    * per-node adjacency row is bounded (≤ 32 KB of longs) no matter how
    * super-hubby the graph is — without it, ONE celebrity node at corpus
    * scale materializes a degree-sized (multi-GB) `collect_list` row in a
    * single aggregation buffer, the same single-key hazard as
    * [[MaxGroup]] / [[Dedup.MaxBand]]. Unlike those drop-style caps this
    * one is EXACT below the cap: the h-index at threshold h needs only the
    * top-h neighbor values, so truncating to the top `maxDegree` yields
    * exactly `min(coreness, maxDegree)` — saturation, not distortion
    * (pinned adversarially in GraphPropsSpec). Coreness beyond 4096 needs
    * a >4096-clique-like core; the fixture graphs peak far below it. */
  val MaxDegree = 4096L

  /** Hint `df` for broadcast only when the pre-loop node count said the
    * state side is small; identity (keyed shuffle join) otherwise. */
  private def maybeBroadcast(df: DataFrame, small: Boolean): DataFrame =
    if (small) broadcast(df) else df

  /** Drop the executor storage blocks behind an eager `localCheckpoint`
    * once no later round references it. `Dataset.unpersist` only touches
    * CacheManager entries; the checkpoint's data lives in the internal RDD
    * under the Dataset's `LogicalRDD` leaf, so that RDD is unpersisted
    * directly. Without this, every peel round of [[kCore]] pinned one more
    * (initially full-size) edge-list copy in the block manager for the
    * life of the session (ADVICE r7). */
  private def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.logical.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }.foreach(_.unpersist(blocking = false))

  /** Keep only groups whose deduped size is ≤ `maxGroup`. The size table
    * aggregates and joins on the SAME key `g` the pair self-join uses, so
    * the guard rides the existing shuffle partitioning — no extra
    * exchange beyond the one aggregate. */
  private def capGroups(m: DataFrame, maxGroup: Long): DataFrame = {
    require(maxGroup >= 2, "maxGroup below 2 would drop every pair")
    val small = m.groupBy("g").agg(count(lit(1)).as("gn"))
      .filter(col("gn") <= maxGroup).select("g")
    m.join(small, "g")
  }

  /** Distinct undirected co-occurrence edges `(u, v), u < v` from a
    * (group, item) membership table: two items are adjacent iff they share
    * a group. One self-equi-join on the group key; both the membership
    * pre-distinct and the final edge distinct are hash aggregates with
    * map-side partials. Groups larger than `maxGroup` are dropped before
    * the self-join ([[MaxGroup]]) — the Σ|g|² candidate bound holds by
    * construction, not by hoping the data is polite. */
  def coOccurrenceEdges(df: DataFrame, groupCol: String, itemCol: String,
                        maxGroup: Long = MaxGroup): DataFrame = {
    val m = capGroups(
      df.select(col(groupCol).as("g"), col(itemCol).as("u")).distinct(),
      maxGroup)
    m.join(m.withColumnRenamed("u", "v"), "g")
      .filter(col("u") < col("v"))
      .select("u", "v").distinct()
  }

  /** Fixed-point PageRank over the undirected edge list (`u < v` rows),
    * returned for every edge-touched node: (node, rank_fp) with ranks in
    * units of 1e-12 (BIGINT).
    *
    * All arithmetic is INTEGER: per-node contribution is `rank div degree`
    * (truncating division), the damped update is
    * `floor(0.15·S) + 0.85·Σcontrib` computed as `15·S div 100` and
    * `85·sum div 100` — so partial sums commute, results are bit-identical
    * across partitionings AND engines, and the DuckDB oracle replicates
    * the full iteration chain value-for-value. The truncation loss per
    * node per round is < 1e-12 of rank mass — noise for ranking purposes,
    * and exactly reproducible noise, which is what an auditable pipeline
    * wants. Transcendental-free, like [[Regression.linearFit]].
    *
    * Scale shape: each round is ONE equi-join of edges against the
    * node-sized rank table plus one hash aggregate on dst — the standard
    * distributed PageRank plan. Rank/degree tables are node-sized (pre-
    * aggregated), edges stream through; per-round lineage is truncated
    * with localCheckpoint like [[Dedup.connectedComponents]]. The
    * symmetric (doubled) edge list means no dangling-mass term: every
    * node has out-degree ≥ 1.
    *
    * Broadcast policy: the node-sized rank table is broadcast each round
    * ONLY when the node count (one `count()` on the already-materialized
    * degree checkpoint, paid once before the loop) is under
    * `broadcastNodeLimit`; past it, both per-round joins fall back to
    * plain keyed shuffles. Output is bit-identical either way — the hint
    * changes the physical join strategy, never the arithmetic — which
    * `GraphsSpec` pins by running both paths. */
  def pageRankFixedPoint(edges: DataFrame, iters: Int,
                         broadcastNodeLimit: Long = BroadcastNodeLimit): DataFrame = {
    require(iters >= 1, "need at least one iteration")
    val Scale = 1000000000000L // 1e12 fixed-point units
    val dir = edges.select(col("u").as("src"), col("v").as("dst"))
      .unionAll(edges.select(col("v").as("src"), col("u").as("dst")))
      .localCheckpoint(eager = true)
    // Degrees ride INSIDE the rank table, so each round needs exactly ONE
    // edge-sized join: the contribution `rank div degree` is computed
    // node-side (narrow) BEFORE meeting the edges, and the node-sized
    // degree re-attach after the aggregate is broadcast-cheap.
    val deg = dir.groupBy("src").agg(count(lit(1)).as("d"))
      .withColumnRenamed("src", "node")
      .localCheckpoint(eager = true)
    // One job against the materialized checkpoint decides the join
    // strategy for EVERY round — the conditional the scaladoc used to
    // only promise.
    val smallState = deg.count() <= broadcastNodeLimit
    var ranks = deg.select(col("node"), col("d"), lit(Scale).as("rank_fp"))
    val teleport = lit(15L * Scale / 100L)
    for (i <- 1 to iters) {
      val contrib = dir.join(
          // `div`, not `/`: Column./ on longs is DOUBLE division, and the
          // damped sum (≤ 85·node_count·1e12 ≈ 1.7e17) exceeds 2^53 — a
          // double round-trip would corrupt low bits. `div` stays integral.
          maybeBroadcast(
            ranks.select(col("node"), expr("rank_fp div d").as("c")),
            smallState),
          dir("src") === col("node"))
        .select(col("dst"), col("c"))
      // Sum in DECIMAL(38,0): exact and commutative like a long sum, but a
      // hub concentrating > ~1.08e5 node-masses of rank would wrap a LONG
      // sum under the ×85 damping multiply SILENTLY (non-ANSI). The
      // decimal path can't wrap; `div` takes the integral part exactly
      // like DuckDB's `//` on the oracle's HUGEINT. Operating envelope:
      // the FINAL per-node rank must fit a BIGINT — beyond ~9e6 nodes'
      // worth of mass on one node, shrink Scale.
      ranks = contrib.groupBy("dst")
        .agg(sum(col("c").cast("decimal(38,0)")).as("s"))
        .select(col("dst").as("node"),
          (teleport + expr("CAST((s * 85) div 100 AS BIGINT)")).as("rank_fp"))
        .join(maybeBroadcast(deg.withColumnRenamed("node", "dst"), smallState),
          col("node") === col("dst"))
        .select(col("node"), col("d"), col("rank_fp"))
      // Short chains stay LAZY — all rounds fuse into one DAG with no
      // intermediate materialization; only long runs pay a periodic
      // lineage truncation (the CC planning-OOM lesson).
      if (i % 8 == 0 && i < iters) ranks = ranks.localCheckpoint(eager = true)
    }
    ranks.select(col("node"), col("rank_fp"))
  }

  /** Frequent co-occurring pairs (market-basket support counting): every
    * item pair appearing together in at least `minSup` groups, with the
    * pair count AND each item's own support — the exact integers from
    * which lift/confidence derive (`lift = pair_n·N / (u_n·v_n)` — left
    * as a rational to the caller, keeping the output engine-exact).
    * Output: (u, v, pair_n, u_n, v_n), u < v.
    *
    * Plan: the deduped membership is materialized ONCE and feeds all three
    * aggregates; candidate volume is Σ|g|² over groups, BOUNDED by the
    * `maxGroup` cap ([[MaxGroup]] — groups past it are dropped before the
    * self-join, and item supports count only capped membership so the
    * support numbers stay consistent with the pairs they annotate); the
    * support attach joins run against the minSup-filtered pair set, which
    * is tiny by construction. */
  def frequentPairs(df: DataFrame, groupCol: String, itemCol: String,
                    minSup: Long, maxGroup: Long = MaxGroup): DataFrame = {
    require(minSup >= 1, "minSup must be at least 1")
    val m = capGroups(
        df.select(col(groupCol).as("g"), col(itemCol).as("u")).distinct(),
        maxGroup)
      .localCheckpoint(eager = true) // feeds both join sides + item supports
    val pairs = m.join(m.withColumnRenamed("u", "v"), "g")
      .filter(col("u") < col("v"))
      .groupBy("u", "v").agg(count(lit(1)).as("pair_n"))
      .filter(col("pair_n") >= minSup)
    val sup = m.groupBy("u").agg(count(lit(1)).as("sup"))
    pairs
      .join(sup.select(col("u"), col("sup").as("u_n")), "u")
      .join(sup.select(col("u").as("v"), col("sup").as("v_n")), "v")
      .select("u", "v", "pair_n", "u_n", "v_n")
  }

  /** Seeded (semi-supervised) label propagation over the undirected edge
    * list (`u < v` rows): starting from `seeds` (node, label), each round
    * every node takes the MINIMUM label among itself and its neighbors;
    * after `iters` rounds a node's label is the smallest seed label within
    * `iters` hops (null if no seed is that close). The min-combiner makes
    * the fixed-point deterministic — order of propagation can't matter —
    * which is what lets the oracle replicate the run exactly; majority-vote
    * LPA variants trade that determinism away for community quality.
    *
    * Per round: ONE equi-join of the node-sized state against the edge
    * list + one hash aggregate on the receiving endpoint — the same plan
    * shape (and the same broadcast-the-state rationale) as
    * [[pageRankFixedPoint]]. State stays node-sized throughout; labeled
    * frontier rows only shrink the join output, never grow it.
    *
    * Contract: output covers EDGE-TOUCHED nodes only — a seed whose node
    * appears in no edge has nothing to propagate to and is absent from the
    * result (union the seed list back in if isolated seeds must surface).
    *
    * Broadcast policy: identical to [[pageRankFixedPoint]] — state (and
    * the seed attach, which is at most node-sized) is broadcast per round
    * only when one pre-loop node `count()` comes in under
    * `broadcastNodeLimit`; otherwise every join is a keyed shuffle.
    * Bit-identical output either way (pinned by `GraphsSpec`). */
  def labelPropagation(edges: DataFrame, seeds: DataFrame, iters: Int,
                       broadcastNodeLimit: Long = BroadcastNodeLimit): DataFrame = {
    require(iters >= 1, "need at least one iteration")
    val dir = edges.select(col("u").as("src"), col("v").as("dst"))
      .unionAll(edges.select(col("v").as("src"), col("u").as("dst")))
      .localCheckpoint(eager = true)
    val nodes = dir.select(col("src").as("node")).distinct()
      .localCheckpoint(eager = true)
    // The one pre-loop job that picks broadcast vs keyed shuffle for the
    // seed attach and every round's state join.
    val smallState = nodes.count() <= broadcastNodeLimit
    var state = nodes.join(
      maybeBroadcast(seeds.select(col("node"), col("label")), smallState),
      Seq("node"), "left")
    for (i <- 1 to iters) {
      val viaNbrs = dir.join(
          maybeBroadcast(state.filter(col("label").isNotNull), smallState),
          dir("src") === state("node"))
        .select(col("dst").as("node"), col("label"))
      // min() skips nulls: an unlabeled node contributes nothing, keeps
      // its null until a labeled neighbor reaches it.
      state = state.select(col("node"), col("label"))
        .unionByName(viaNbrs)
        .groupBy("node").agg(min(col("label")).as("label"))
      if (i % 8 == 0 && i < iters) state = state.localCheckpoint(eager = true)
    }
    state.select(col("node"), col("label"))
  }

  /** Personalized PageRank — [[pageRankFixedPoint]] with the teleport mass
    * restricted to `seeds`: the data-SELECTION form of the walk (rank =
    * stationary proximity to the seed set; pick high-rank documents to
    * enrich a corpus toward the seeds, the classic PPR-sampling recipe).
    * Identical integer discipline: 1e-12 fixed point, `div` contributions,
    * DECIMAL(38,0) damped sums — bit-identical across engines and
    * partitionings. Two deltas vs the global walk: per-node teleport
    * `t = 0.15·Scale·[node ∈ seeds]` rides in the rank table next to the
    * degree, and the contribution side drops `rank div d = 0` rows before
    * the edge join — early rounds touch only edges near the seed WAVE
    * (mass is zero elsewhere), so sparse-seed runs cost a frontier-sized
    * join like [[hopDistance]], converging to the full edge join only as
    * support spreads. Each round LEFT-joins the aggregate back onto the
    * node universe so zero-mass nodes keep their degree and teleport.
    * Output (node, rank_fp) over edge-touched nodes. */
  def personalizedPageRank(edges: DataFrame, seeds: DataFrame, iters: Int,
                           broadcastNodeLimit: Long = BroadcastNodeLimit)
      : DataFrame = {
    require(iters >= 1, "need at least one iteration")
    val Scale = 1000000000000L
    val dir = edges.select(col("u").as("src"), col("v").as("dst"))
      .unionAll(edges.select(col("v").as("src"), col("u").as("dst")))
      .localCheckpoint(eager = true)
    val deg = dir.groupBy("src").agg(count(lit(1)).as("d"))
      .withColumnRenamed("src", "node")
      .localCheckpoint(eager = true)
    val smallState = deg.count() <= broadcastNodeLimit
    // Node universe with per-node teleport units (seed-gated) — the
    // constant side every round re-joins.
    val base = deg.join(
        maybeBroadcast(seeds.select(col("node")).distinct()
          .withColumn("_s", lit(1L)), smallState),
        Seq("node"), "left")
      .select(col("node"), col("d"),
        coalesce(col("_s") * lit(15L * Scale / 100L), lit(0L)).as("t"))
      .localCheckpoint(eager = true)
    var ranks = base.withColumn("rank_fp",
      when(col("t") > 0L, lit(Scale)).otherwise(lit(0L)))
    for (i <- 1 to iters) {
      val contrib = dir.join(
          maybeBroadcast(ranks
            .select(col("node"), expr("rank_fp div d").as("c"))
            .filter(col("c") > 0L), smallState),
          dir("src") === col("node"))
        .select(col("dst"), col("c"))
      val mass = contrib.groupBy("dst")
        .agg(sum(col("c").cast("decimal(38,0)")).as("s"))
        .select(col("dst").as("node"),
          expr("CAST((s * 85) div 100 AS BIGINT)").as("m"))
      ranks = base.join(maybeBroadcast(mass, smallState), Seq("node"), "left")
        .select(col("node"), col("d"), col("t"),
          (col("t") + coalesce(col("m"), lit(0L))).as("rank_fp"))
      if (i % 8 == 0 && i < iters) ranks = ranks.localCheckpoint(eager = true)
    }
    ranks.select(col("node"), col("rank_fp"))
  }

  /** Multi-source BFS hop distance: dist(node) = length of the shortest
    * edge path from any seed, computed in `maxHops` rounds (nodes farther
    * than `maxHops` stay null — the bounded-radius form every
    * neighborhood-audit query wants, and the oracle can unroll). Exactly
    * [[labelPropagation]]'s per-round shape with `min(dist)` combine; the
    * per-round join uses only the FRONTIER (nodes first reached last
    * round) — equivalent to propagating from every reached node, since a
    * node reached at d already pushed d+1 in round d+1 and min-combine
    * absorbs re-sends — so the join's state side SHRINKS as the wave
    * passes instead of growing with the reached set. Broadcast vs keyed
    * shuffle picked once via `broadcastNodeLimit` like every iterative
    * operator here. Output: (node, dist ∈ [0, maxHops] or null) over
    * edge-touched nodes. */
  def hopDistance(edges: DataFrame, seeds: DataFrame, maxHops: Int,
                  broadcastNodeLimit: Long = BroadcastNodeLimit): DataFrame = {
    require(maxHops >= 1, "need at least one hop")
    val dir = edges.select(col("u").as("src"), col("v").as("dst"))
      .unionAll(edges.select(col("v").as("src"), col("u").as("dst")))
      .localCheckpoint(eager = true)
    val nodes = dir.select(col("src").as("node")).distinct()
      .localCheckpoint(eager = true)
    val smallState = nodes.count() <= broadcastNodeLimit
    var state = nodes.join(
      maybeBroadcast(seeds.select(col("node")).distinct()
        .withColumn("dist", lit(0L)), smallState),
      Seq("node"), "left")
    for (i <- 1 to maxHops) {
      val frontier = state.filter(col("dist") === (i - 1L))
        .select(col("node").as("f_node"))
      val viaNbrs = dir.join(maybeBroadcast(frontier, smallState),
          dir("src") === col("f_node"))
        .select(col("dst").as("node"), lit(i.toLong).as("dist"))
      state = state.select(col("node"), col("dist"))
        .unionByName(viaNbrs)
        .groupBy("node").agg(min(col("dist")).as("dist"))
      if (i % 8 == 0 && i < maxHops) state = state.localCheckpoint(eager = true)
    }
    state.select(col("node"), col("dist"))
  }

  /** Bounded WEIGHTED shortest path — [[hopDistance]]'s min-PLUS sibling:
    * dist(node) = minimum total edge weight over paths of ≤ `maxHops`
    * edges from any seed (k-round Bellman–Ford; nodes unreachable within
    * the bound stay null). Each round relaxes edges only from the
    * IMPROVED frontier — nodes whose distance changed last round — which
    * is exact for the same reason hopDistance's first-reach frontier is:
    * an unimproved node already pushed its (identical) candidates in an
    * earlier round and min-combine absorbs re-sends, so the oracle's
    * relax-from-all unroll is definitionally equal. Unlike hopDistance
    * the frontier needs computing (improvement ≠ first reach): one
    * node-keyed join of consecutive states per round — node-sized, the
    * same scale class as the round's aggregate. Weights must be
    * non-negative (relaxation never revisits a settled optimum within the
    * bound either way — the guard is for semantics, not correctness of
    * the unroll). Input edges (u, v, w); output (node, dist). */
  def weightedHopDistance(edges: DataFrame, seeds: DataFrame, maxHops: Int,
                          broadcastNodeLimit: Long = BroadcastNodeLimit)
      : DataFrame = {
    require(maxHops >= 1, "need at least one hop")
    val dir = edges.select(col("u").as("src"), col("v").as("dst"), col("w"))
      .unionAll(edges.select(col("v").as("src"), col("u").as("dst"), col("w")))
      .localCheckpoint(eager = true)
    val nodes = dir.select(col("src").as("node")).distinct()
      .localCheckpoint(eager = true)
    val smallState = nodes.count() <= broadcastNodeLimit
    var state = nodes.join(
      maybeBroadcast(seeds.select(col("node")).distinct()
        .withColumn("dist", lit(0L)), smallState),
      Seq("node"), "left")
    var frontier = state.filter(col("dist").isNotNull)
      .select(col("node").as("f_node"), col("dist").as("f_dist"))
    for (i <- 1 to maxHops) {
      val relaxed = dir.join(maybeBroadcast(frontier, smallState),
          dir("src") === col("f_node"))
        .select(col("dst").as("node"), (col("f_dist") + col("w")).as("dist"))
      val next = state.select(col("node"), col("dist"))
        .unionByName(relaxed)
        .groupBy("node").agg(min(col("dist")).as("dist"))
        .localCheckpoint(eager = true)
      if (i < maxHops) {
        // Improved = strictly smaller than the previous round's value
        // (first reach included: old null, new set).
        frontier = next.join(
            state.select(col("node"), col("dist").as("_old")), Seq("node"))
          .filter(col("dist").isNotNull &&
            (col("_old").isNull || col("dist") < col("_old")))
          .select(col("node").as("f_node"), col("dist").as("f_dist"))
      }
      state = next
    }
    state.select(col("node"), col("dist"))
  }

  /** FIXED-POINT seeded label propagation — the limit of
    * [[labelPropagation]] as `iters → ∞` — computed WITHOUT walking hops:
    * min-label propagation converges, per connected component, to the
    * smallest seed label in that component (or null if the component is
    * seedless). So the fixpoint is connected components (pointer-doubling,
    * O(log diameter) edge-join rounds, convergence-checked — the
    * [[Dedup.connectedComponents]] core) plus ONE component-min join — a
    * long-chain graph converges in log rounds where the per-hop loop would
    * need diameter rounds. Output covers edge-touched nodes, like
    * [[labelPropagation]]. */
  def labelPropagationFixpoint(edges: DataFrame, seeds: DataFrame): DataFrame = {
    // The node universe IS the edge endpoints here — the edges-only CC
    // entry point skips a redundant node derivation + reattach join.
    val cc = Dedup.connectedComponentsOfEdges(
      edges.select(col("u").as("src"), col("v").as("dst")))
    val compSeed = cc.join(seeds.select(col("node"), col("label")), Seq("node"))
      .groupBy("cluster_id").agg(min(col("label")).as("label"))
    cc.join(compSeed, Seq("cluster_id"), "left")
      .select(col("node"), col("label"))
  }

  /** k-core of an undirected edge list (`u < v` rows): the maximal
    * subgraph in which every node has degree ≥ k, found by iterative
    * peeling — drop all nodes with degree < k, recompute degrees over the
    * survivors, repeat to fixpoint. Output: (node, core_deg) for the
    * surviving nodes, with each node's degree INSIDE the core (≥ k by
    * construction). The k-core is unique and peel-order-independent, so
    * running the peel to convergence is deterministic and the oracle can
    * replicate it round-for-round.
    *
    * Scale shape: per round, one node-sized degree aggregate over the
    * surviving edges + two semi-joins filtering the edge list to
    * surviving endpoints. The survivor set only shrinks, and the edge
    * list is re-checkpointed each round it shrinks — each round's join reads
    * a materialized, already-reduced input instead of replaying the whole
    * peel lineage (the CC planning-OOM lesson). The survivor side of both
    * semi-joins is node-sized and broadcast only under
    * `broadcastNodeLimit` ([[BroadcastNodeLimit]] — same measured
    * conditional as the other iterative operators), keyed shuffles past
    * it.
    *
    * Convergence costs one node `count()` per round against the
    * checkpointed survivor table. `maxRounds` is a loud-failure guard
    * (like the CC round cap), not a semantic knob: real peels converge in
    * a handful of rounds — each round must remove ≥ 1 node to continue,
    * and removals cascade geometrically in practice. */
  /** Symmetric-edge-row limit under which [[kCore]] peels driver-side —
    * the same measured small-graph discipline as
    * [[Dedup.DriverCcEdgeLimit]] (the iterative loop's floor on a tiny
    * graph is 3 jobs per peel round, not data; a ≤1M-row collect is
    * ≤16 MB and the in-memory peel is O(E)). Similarity-pair graphs at
    * bench scale are hundreds of edges; a 100 TB co-occurrence graph
    * sails past the gate into the loop unchanged. */
  val DriverKCoreEdgeLimit = 1000000L

  /** In-memory k-core peel over a collected SYMMETRIC directed edge list:
    * repeatedly delete nodes of degree < k (queue-driven, O(E)); returns
    * (node, degree-within-core) for the survivors — the k-core is a
    * unique subgraph, so this is definitionally the loop's fixpoint.
    * DRIFT CONTRACT: `TwinDriftSpec` re-proves equality with the
    * distributed cascade on fresh random graphs every test run. */
  private[graft] def driverKCore(edges: Array[(Long, Long)], k: Long)
      : Array[(Long, Long)] = {
    import scala.collection.mutable
    val adj = mutable.HashMap.empty[Long, mutable.ArrayBuffer[Long]]
    edges.foreach { case (s, d) =>
      adj.getOrElseUpdate(s, mutable.ArrayBuffer.empty[Long]) += d
    }
    val deg = mutable.HashMap.empty[Long, Long]
    adj.foreach { case (n, ns) => deg(n) = ns.length.toLong }
    val removed = mutable.HashSet.empty[Long]
    val queue = mutable.ArrayDeque.empty[Long]
    deg.foreach { case (n, d) => if (d < k) queue.append(n) }
    while (queue.nonEmpty) {
      val n = queue.removeHead()
      if (!removed.contains(n)) {
        removed += n
        adj(n).foreach { m =>
          if (!removed.contains(m)) {
            val d = deg(m) - 1
            deg(m) = d
            if (d == k - 1) queue.append(m)
          }
        }
      }
    }
    deg.iterator.filter { case (n, _) => !removed.contains(n) }
      .map { case (n, d) => (n, d) }.toArray
  }

  def kCore(edges: DataFrame, k: Long, maxRounds: Int = 64,
            broadcastNodeLimit: Long = BroadcastNodeLimit,
            driverLimit: Long = DriverKCoreEdgeLimit): DataFrame = {
    require(k >= 1, "k-core needs k >= 1")
    var dir = edges.select(col("u").as("src"), col("v").as("dst"))
      .unionAll(edges.select(col("v").as("src"), col("u").as("dst")))
      .localCheckpoint(eager = true)
    var dirEdges = dir.count()
    // Small-graph gate — see [[DriverKCoreEdgeLimit]]; long ids only.
    if (dirEdges <= driverLimit && dir.schema.fields.forall(
      _.dataType == org.apache.spark.sql.types.LongType)) {
      val out = driverKCore(
        dir.collect().map(r => (r.getLong(0), r.getLong(1))), k)
      releaseCheckpoint(dir)
      val spark = edges.sparkSession
      import spark.implicits._
      return out.toSeq.toDF("node", "core_deg")
    }
    var converged = false
    var rounds = 0
    while (!converged && rounds < maxRounds) {
      rounds += 1
      val survivors = dir.groupBy("src").agg(count(lit(1)).as("d"))
        .filter(col("d") >= k).select(col("src").as("node"))
        .localCheckpoint(eager = true)
      val smallState = survivors.count() <= broadcastNodeLimit
      val next = dir
        .join(maybeBroadcast(survivors.withColumnRenamed("node", "src"),
          smallState), Seq("src"), "left_semi")
        .join(maybeBroadcast(survivors.withColumnRenamed("node", "dst"),
          smallState), Seq("dst"), "left_semi")
        .select("src", "dst")
        .localCheckpoint(eager = true)
      // Edge-count equality detects the fixpoint: a peel round that drops
      // no edge also dropped no node (degrees were unchanged inputs).
      val nextEdges = next.count()
      // `next` is materialized (the count above forced it) and its lineage
      // is truncated, so the previous round's edge copy and this round's
      // survivor table can release their storage blocks now — a deep
      // cascading peel otherwise pins O(rounds) edge-list copies.
      releaseCheckpoint(dir)
      releaseCheckpoint(survivors)
      converged = nextEdges == dirEdges
      dir = next
      dirEdges = nextEdges
    }
    if (!converged)
      throw new IllegalStateException(
        s"kCore(k=$k) did not converge in $maxRounds rounds — " +
          "raise maxRounds or inspect the graph")
    dir.groupBy("src").agg(count(lit(1)).as("core_deg"))
      .select(col("src").as("node"), col("core_deg"))
  }

  /** Per-node CORE NUMBERS via h-index iteration (the distributed k-core
    * decomposition): start every node at its degree and repeatedly replace
    * each node's value with the H-index of its neighbors' values — the
    * largest h such that ≥ h neighbors hold value ≥ h. The sequence is
    * monotone non-increasing and its fixpoint is exactly the coreness
    * (Lü et al., "The H-index of a network node"), so `kCore(k)`'s node
    * set equals `coreness ≥ k` — pinned by `GraphPropsSpec`. Runs a FIXED
    * `rounds` iterations: past convergence each round is the identity, so
    * any `rounds` ≥ the convergence depth yields the coreness while
    * keeping the round count — and therefore the DuckDB oracle's unrolled
    * replication — deterministic. Output: (node, coreness).
    *
    * Scale shape: per round ONE edges ⋈ node-sized state equi-join, a
    * dst-keyed top-`maxDegree` window gate, then the list aggregate over
    * the SAME key (the window's sort spills gracefully under skew; the
    * aggregate's per-node array is bounded by the cap — a super-hub can no
    * longer materialize a degree-sized row, see [[MaxDegree]]), and a
    * narrow sorted-array fold for the H-index. With the cap the computed
    * value is EXACTLY `min(coreness, maxDegree)`: the h-index at any
    * threshold h ≤ cap depends only on the top-h neighbor values, so
    * truncation saturates deep cores at the cap and distorts nothing
    * below it (initial degrees are `least`-capped for the same invariant).
    * State stays node-sized; the broadcast conditional and checkpoint
    * cadence match the other iterative operators. */
  /** In-memory replica of the h-index iteration — SEMANTICS-IDENTICAL to
    * the distributed rounds (same `least(deg, maxDegree)` start, same
    * top-`maxDegree` neighbor gate, same synchronous update, same FIXED
    * round count), so the small-graph gate can never diverge from the
    * loop or its unrolled DuckDB oracle. DRIFT CONTRACT: `TwinDriftSpec`
    * re-proves equality with the distributed rounds on fresh random
    * graphs every test run. */
  private[graft] def driverCoreness(edges: Array[(Long, Long)], rounds: Int,
                                    maxDegree: Long): Array[(Long, Long)] = {
    import scala.collection.mutable
    val adj = mutable.HashMap.empty[Long, mutable.ArrayBuffer[Long]]
    edges.foreach { case (s, d) =>
      adj.getOrElseUpdate(s, mutable.ArrayBuffer.empty[Long]) += d
    }
    var state = mutable.HashMap.empty[Long, Long]
    adj.foreach { case (n, ns) => state(n) = math.min(ns.length.toLong, maxDegree) }
    for (_ <- 1 to rounds) {
      val next = mutable.HashMap.empty[Long, Long]
      adj.foreach { case (n, ns) =>
        val vals = ns.map(state).sortBy(v => -v)
        val top = if (vals.length > maxDegree) vals.take(maxDegree.toInt) else vals
        // v_i desc and i asc make v_i ≥ i+1 a prefix property — the first
        // failure is final, and the prefix length IS the h-index.
        var h = 0L
        var i = 0
        while (i < top.length && top(i) >= i + 1) { h += 1; i += 1 }
        next(n) = h
      }
      state = next
    }
    state.toArray
  }

  def corenessHIndex(edges: DataFrame, rounds: Int = 4,
                     broadcastNodeLimit: Long = BroadcastNodeLimit,
                     maxDegree: Long = MaxDegree,
                     driverLimit: Long = DriverKCoreEdgeLimit): DataFrame = {
    require(rounds >= 1, "need at least one h-index round")
    require(maxDegree >= 1, "maxDegree must be positive")
    val dir = edges.select(col("u").as("src"), col("v").as("dst"))
      .unionAll(edges.select(col("v").as("src"), col("u").as("dst")))
      .localCheckpoint(eager = true)
    // Small-graph gate — [[DriverKCoreEdgeLimit]] discipline; long ids only.
    if (dir.count() <= driverLimit && dir.schema.fields.forall(
      _.dataType == org.apache.spark.sql.types.LongType)) {
      val out = driverCoreness(
        dir.collect().map(r => (r.getLong(0), r.getLong(1))), rounds, maxDegree)
      releaseCheckpoint(dir)
      val spark = edges.sparkSession
      import spark.implicits._
      return out.toSeq.toDF("node", "coreness")
    }
    var state = dir.groupBy("src").agg(count(lit(1)).as("d"))
      .select(col("src").as("node"), least(col("d"), lit(maxDegree)).as("c"))
      .localCheckpoint(eager = true)
    val smallState = state.count() <= broadcastNodeLimit
    // H-index of the DESC-sorted neighbor values: v_i decreasing and i
    // increasing make `v_i ≥ i` a prefix property, so the count IS the
    // max prefix length — one narrow fold, no second sort.
    val hIndex = expr(
      "aggregate(transform(cs, (v, i) -> CASE WHEN v >= i + 1 THEN 1L ELSE 0L END), " +
        "0L, (a, x) -> a + x)")
    // Top-maxDegree gate: rank ties arbitrarily — the KEPT multiset (the
    // cap largest values) is order-independent, so results stay
    // deterministic. Window and aggregate share the dst hash partitioning:
    // one exchange serves both.
    val byValueDesc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("dst")).orderBy(col("c").desc)
    for (t <- 1 to rounds) {
      state = dir
        .join(maybeBroadcast(state, smallState), dir("src") === col("node"))
        .select(col("dst"), col("c"))
        .withColumn("rn", row_number().over(byValueDesc))
        .filter(col("rn") <= maxDegree)
        .groupBy("dst")
        .agg(sort_array(collect_list(col("c")), asc = false).as("cs"))
        .select(col("dst").as("node"), hIndex.as("c"))
      if (t % 8 == 0 && t < rounds) state = state.localCheckpoint(eager = true)
    }
    state.select(col("node"), col("c").as("coreness"))
  }

  /** Global triangle statistics of an undirected edge list (`u < v` rows):
    * one row of (n_nodes, n_edges, n_triangles, max_degree).
    *
    * Algorithm: degree-ordered orientation + adjacency intersection. Each
    * edge is directed from its (degree, id)-smaller endpoint to the
    * larger; every triangle then has a unique lowest vertex a holding both
    * out-edges a→b, a→c, and is counted exactly once as a member of
    * |N+(u) ∩ N+(v)| over its oriented base edge u→v. Orienting by degree
    * (not id) bounds every out-degree by O(√m), so total intersection work
    * is O(m^1.5) worst-case instead of Σdeg² — the difference between a
    * power-law graph finishing and not. The degree table is node-sized;
    * its attach joins broadcast only under [[BroadcastNodeLimit]] (same
    * conditional as the iterative operators), keyed shuffles past it. */
  def triangleStats(edges: DataFrame,
                    broadcastNodeLimit: Long = BroadcastNodeLimit): DataFrame = {
    val deg = edges.select(col("u").as("n")).unionAll(edges.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
      // Consumed three times (both orientation attaches + degStats below) —
      // materialize once instead of re-running the edge-list aggregate.
      .localCheckpoint(eager = true)
    val smallState = deg.count() <= broadcastNodeLimit
    // Total order (d, n): strict for distinct nodes, so orientation is
    // well-defined and acyclic.
    val du = deg.select(col("n").as("u"), col("d").as("du"))
    val dv = deg.select(col("n").as("v"), col("d").as("dv"))
    val oriented = edges
      .join(maybeBroadcast(du, smallState), "u")
      .join(maybeBroadcast(dv, smallState), "v")
      .select(
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")), col("u"))
          .otherwise(col("v")).as("src"),
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")), col("v"))
          .otherwise(col("u")).as("dst"))
      .localCheckpoint(eager = true) // feeds adj AND tri — materialize once
    // For each oriented edge u→v, triangles closed above it are
    // |N+(u) ∩ N+(v)|. The adjacency table is NODE-sized (out-lists
    // O(√m)-bounded by the orientation) and feeds both attach joins, so
    // the joins move |E| + 2·|adj| rows and the intersection runs
    // CPU-local per row — a naive wedge self-join instead pushes
    // Σ outdeg² rows through a shuffle (measured ~1.5× slower end-to-end
    // at the 1.2 M-edge fixture graph, and growing with skew).
    // The adjacency attaches stay SHUFFLE joins on purpose: broadcasting
    // the list-heavy node-sized table measured ~2× SLOWER end-to-end at
    // the 1.2 M-edge fixture (6.6 s vs 3.3 s) — collecting + rebuilding
    // ~√m-element arrays per task dwarfs the exchange they avoid. Only the
    // narrow degree table above rides the broadcast conditional.
    val adj = oriented.groupBy("src").agg(collect_list(col("dst")).as("nbrs"))
      .localCheckpoint(eager = true)
    val tri = oriented
      .join(adj.select(col("src").as("u_"), col("nbrs").as("nu")),
        col("src") === col("u_"))
      .join(adj.select(col("src").as("v_"), col("nbrs").as("nv")),
        col("dst") === col("v_"))
      .select(size(array_intersect(col("nu"), col("nv"))).cast("long").as("t"))
      .agg(coalesce(sum(col("t")), lit(0L)).as("n_triangles"))
    // Single-row assembly WITHOUT any join: three scalar aggregates from
    // three lineages can only meet through some join flavor (and a 1×1
    // join on a constant key folds back to BroadcastNestedLoop, which the
    // repo-wide plan guard forbids) — so union them as (metric, value)
    // rows and pivot with one conditional aggregate instead.
    val degStats = deg
      .agg(count(lit(1)).as("n_nodes"), max(col("d")).as("max_degree"))
      .select(explode(array(
        struct(lit("n_nodes").as("m"), col("n_nodes").as("v")),
        struct(lit("max_degree").as("m"), col("max_degree").as("v")))).as("s"))
      .select(col("s.m").as("m"), col("s.v").as("v"))
    val long = edges.agg(count(lit(1)).as("v"))
      .select(lit("n_edges").as("m"), col("v"))
      .unionAll(degStats)
      .unionAll(tri.select(lit("n_triangles").as("m"), col("n_triangles").as("v")))
    long.agg(
      max(when(col("m") === "n_nodes", col("v"))).as("n_nodes"),
      max(when(col("m") === "n_edges", col("v"))).as("n_edges"),
      max(when(col("m") === "n_triangles", col("v"))).as("n_triangles"),
      max(when(col("m") === "max_degree", col("v"))).as("max_degree"))
  }
}
