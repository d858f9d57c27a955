package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Chunking/packing invariants: full token coverage with exact overlap,
  * degenerate docs, and conservation + contiguity of packed bins. */
class ChunkingSpec extends SparkSpec {

  private lazy val ss: org.apache.spark.sql.SparkSession = spark

  test("chunks cover every token; overlap-stripped concat rebuilds the doc") {
    import ss.implicits._
    val rnd = new scala.util.Random(61)
    val docs = (0 until 50).map { i =>
      val n = rnd.nextInt(40) + 1 // 1..40 tokens, straddles one-chunk docs
      (i.toLong, (0 until n).map(j => s"w${i}_$j").mkString(" "))
    }
    val got = Chunking.chunk(docs.toDF("doc_id", "text"),
        chunkTokens = 8, overlapTokens = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .groupBy(_._1)
    for ((id, text) <- docs) {
      val toks = text.split(" ")
      val chunks = got(id).sortBy(_._2)
      // First chunk starts the doc; each later chunk repeats the previous
      // one's last 3 tokens (stride 5); union covers all tokens.
      assert(chunks.head._3.split(" ").head === toks.head)
      val rebuilt = chunks.head._3.split(" ") ++
        chunks.tail.flatMap(_._3.split(" ").drop(3))
      assert(rebuilt.toSeq === toks.toSeq, s"doc $id")
      assert(chunks.forall(_._4 > 0))
      assert(chunks.last._3.split(" ").last === toks.last)
    }
  }

  test("tabs, newlines and runs of spaces tokenize as single separators") {
    import ss.implicits._
    val docs = Seq((1L, " a\t b\n\nc   d ")).toDF("doc_id", "text")
    val got = Chunking.chunk(docs, 2, 0).collect()
      .map(r => (r.getLong(1), r.getString(2), r.getLong(3))).toSeq.sortBy(_._1)
    assert(got === Seq((0L, "a b", 2L), (1L, "c d", 2L)))
  }

  test("whitespace-only docs vanish; a one-token doc yields one chunk") {
    import ss.implicits._
    // "\n" and "\t\t" are the trap cases: trim strips only spaces, so they
    // must be killed by the empty-token filter, not the length guard.
    val docs = Seq((1L, "   "), (2L, "solo"), (3L, ""), (4L, "\n"),
      (5L, "\t\t"), (6L, "tail\t")).toDF("doc_id", "text")
    val got = Chunking.chunk(docs, 8, 3).collect()
      .map(r => (r.getLong(0), r.getString(2), r.getLong(3)))
    assert(got.toSeq.sorted === Seq((2L, "solo", 1L), (6L, "tail", 1L)))
  }

  test("chunk plans fully narrow; packing plans exactly one exchange") {
    import ss.implicits._
    graft.plans.GraftExtensions.register(spark)
    val docs = (0 until 100).map(i => (i.toLong, "a b c d e f g h i j"))
      .toDF("doc_id", "text")
    val chunkPlan = Chunking.chunk(docs, 4, 1)
      .queryExecution.executedPlan.toString
    assert(!chunkPlan.contains("Exchange"),
      s"chunking must not shuffle:\n$chunkPlan")
    // The window's shard partitioning also satisfies the downstream
    // (shard, bin) aggregation — subset-key clustering — so ONE exchange.
    val packPlan = Chunking.packSequences(docs, 16, 4)
      .groupBy("shard", "bin").count()
      .queryExecution.executedPlan.toString
    val exchanges = packPlan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges === 1, s"expected one exchange, got $exchanges:\n$packPlan")
  }

  test("packing conserves tokens, keeps offsets inside the budget, bins contiguous") {
    import ss.implicits._
    val rnd = new scala.util.Random(67)
    val docs = (0 until 400).map { i =>
      (i.toLong, (0 until rnd.nextInt(60) + 1).map(_ => "w").mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    graft.plans.GraftExtensions.register(spark) // md5_hash32 for shardOf
    val packed = Chunking.packSequences(df, ctxTokens = 128, numShards = 4)
    val rows = packed.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // (shard, doc_id, n_tokens, bin, bin_offset)
    assert(rows.map(_._3).sum ===
      docs.map(_._2.split(" ").length.toLong).sum) // conservation
    assert(rows.forall(r => r._5 >= 0 && r._5 < 128)) // offset in budget
    for ((_, inShard) <- rows.groupBy(_._1)) {
      val bins = inShard.map(_._4).distinct.sorted
      assert(bins === (0L to bins.max).toArray.toSeq, "bins must be contiguous")
    }
  }
}
