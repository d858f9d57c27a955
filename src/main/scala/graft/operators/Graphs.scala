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

  /** Distinct undirected co-occurrence edges `(u, v), u < v` from a
    * (group, item) membership table: two items are adjacent iff they share
    * a group. One self-equi-join on the group key; both the membership
    * pre-distinct and the final edge distinct are hash aggregates with
    * map-side partials. A pathologically hot group (one order containing
    * thousands of items) would emit |g|² pairs — the same hot-band shape as
    * LSH dedup, and the same remedies apply (cap or salt the group). */
  def coOccurrenceEdges(df: DataFrame, groupCol: String, itemCol: String): DataFrame = {
    val m = df.select(col(groupCol).as("g"), col(itemCol).as("u")).distinct()
    m.join(m.withColumnRenamed("u", "v"), "g")
      .filter(col("u") < col("v"))
      .select("u", "v").distinct()
  }

  /** Global triangle statistics of an undirected edge list (`u < v` rows):
    * one row of (n_nodes, n_edges, n_triangles, max_degree).
    *
    * Algorithm: degree-ordered orientation (node-iterator++). Each edge is
    * directed from its (degree, id)-smaller endpoint to the larger; every
    * triangle then appears EXACTLY once as a path a→b→c plus the closing
    * edge a→c, so the count needs one wedge join + one closing semi-join.
    * Orienting by degree (not id) bounds every out-degree by O(√m), so the
    * wedge intermediate is O(m^1.5) worst-case instead of Σdeg² — the
    * difference between a power-law graph finishing and not. The degree
    * table is keys-sized; at web scale it broadcasts. */
  def triangleStats(edges: DataFrame): DataFrame = {
    val deg = edges.select(col("u").as("n")).unionAll(edges.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    // Total order (d, n): strict for distinct nodes, so orientation is
    // well-defined and acyclic.
    val du = deg.select(col("n").as("u"), col("d").as("du"))
    val dv = deg.select(col("n").as("v"), col("d").as("dv"))
    val oriented = edges.join(du, "u").join(dv, "v")
      .select(
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")), col("u"))
          .otherwise(col("v")).as("src"),
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")), col("v"))
          .otherwise(col("u")).as("dst"))
      .localCheckpoint(eager = true) // consumed 3× below — materialize once
    val wedges = oriented.as("e1")
      .join(oriented.as("e2"), col("e1.dst") === col("e2.src"))
      .select(col("e1.src").as("a"), col("e2.dst").as("c"))
    val tri = wedges.join(oriented,
        col("a") === col("src") && col("c") === col("dst"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
    val base = edges.agg(count(lit(1)).as("n_edges"))
    val degStats = deg.agg(count(lit(1)).as("n_nodes"), max(col("d")).as("max_degree"))
    base.crossJoin(degStats).crossJoin(tri)
      .select("n_nodes", "n_edges", "n_triangles", "max_degree")
  }
}
