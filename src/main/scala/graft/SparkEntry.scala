package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are contributed by per-module [[QueryPack]]s and concatenated here;
  * later packs must not reuse keys (asserted at first access).
  */
object SparkEntry {

  private def packs: Seq[QueryPack] = Seq(
    operators.CorePack,
    store.StorePack,
    functions.TextPack,
    functions.LmPack,
    functions.RetrievalPack,
    operators.DedupPack,
    operators.CurationPack,
    operators.TemporalPack,
    operators.AnalyticsPack,
    operators.PipelinePack,
    operators.SimilarityPack,
    operators.BpePack,
    operators.RecrawlPack,
    store.TakedownPack,
    sources.AvroPack,
    sources.WarcPack,
    sources.HttpPack,
    sources.PdfPack,
    sources.RobotsPack,
    operators.HtmlPack,
    operators.UrlPack,
    multimodal.MediaPack,
    multimodal.AudioFpPack,
    multimodal.CrawlMediaPack,
    serve.ServePack
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.CorePack.bucketCountsQuery(spark, "/root/testdata/sf0.001", 3600L)

  /** One per implemented operator from SURVEY.md §2. */
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] = {
    val all = packs.flatMap(_.queries.toSeq)
    require(all.size == all.map(_._1).distinct.size, "duplicate query keys across packs")
    all.toMap
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  lazy val oracleSql: Map[String, String] = {
    val all = packs.flatMap(_.oracles.toSeq)
    val unknown = all.map(_._1).toSet -- queries.keySet
    require(unknown.isEmpty, s"oracles without queries: $unknown")
    all.toMap
  }
}
