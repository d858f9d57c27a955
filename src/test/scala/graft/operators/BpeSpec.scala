package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def docs(texts: String*) = texts.toDF("text")

  test("wordTable lowercases, splits on whitespace runs, drops empties") {
    val wt = Bpe.wordTable(docs("Ab  ab\tAB", " x "), "text")
      .as[(String, Long)].collect().toMap
    assert(wt == Map("ab" -> 3L, "x" -> 1L))
  }

  test("train learns the most frequent pair with (count, lhs, rhs) tie-break") {
    // "ab" and "ba" both appear twice as pairs; lexicographic tie-break
    // must pick (a, b).
    val (merges, _) = Bpe.train(docs("abab abab"), k = 1)
    assert(merges.head.lhs == "a" && merges.head.rhs == "b")
    assert(merges.head.pair_count == 4L) // 2 per word occurrence x weight 2
  }

  test("merge application is greedy leftmost on overlapping runs") {
    // "aaa" under (a, a): leftmost pair merges, third 'a' survives alone.
    val (merges, toks) = Bpe.train(docs("aa aa aa aaa"), k = 1)
    assert(merges.head == Bpe.Merge(1, "a", "a", 5L)) // 3x"aa"=3 + "aaa"=2
    val byWord = toks.select(col("toks")).as[Seq[String]].collect().toSet
    assert(byWord == Set(Seq("aa"), Seq("aa", "a")))
  }

  test("later merges build on earlier ones (multi-char tokens)") {
    val (merges, toks) = Bpe.train(docs(Seq.fill(5)("abc").mkString(" ")), 2)
    assert(merges.map(m => (m.lhs, m.rhs)) == Seq(("a", "b"), ("ab", "c")))
    assert(toks.select(col("toks")).as[Seq[String]].collect().toSeq ==
      Seq(Seq("abc")))
  }

  test("train stops early when no adjacent pairs remain") {
    val (merges, _) = Bpe.train(docs("a b c a"), k = 5)
    assert(merges.isEmpty) // all words are single tokens; nothing to merge
  }

  test("encode counts per-doc tokens through the broadcast tokenizer") {
    val s = spark; import s.implicits._
    val corpus = Seq((1L, "ab ab cd"), (2L, "ab")).toDF("doc_id", "text")
    val (_, tok) = Bpe.train(corpus, k = 1) // learns (a,b) at count 3
    val enc = Bpe.encode(corpus, tok).as[(Long, Long)].collect().toMap
    // doc 1: "ab"(1 tok) x2 + "cd"(2 toks) = 4; doc 2: "ab" = 1.
    assert(enc == Map(1L -> 4L, 2L -> 1L))
  }

  test("encodeTokens reassembles per-doc sequences in word order") {
    val s = spark; import s.implicits._
    val corpus = Seq((1L, "cd ab  cd"), (2L, " ")).toDF("doc_id", "text")
    val (_, tok) = Bpe.train(corpus, k = 1) // (c,d) wins at count 2
    val seqs = Bpe.encodeTokens(corpus, tok)
      .as[(Long, Seq[String])].collect().toMap
    // doc 2 has no words → absent; doc 1 keeps word order across the
    // double space.
    assert(seqs === Map(1L -> Seq("cd", "a", "b", "cd")))
  }

  test("vocab sums weights over final tokens") {
    val (_, toks) = Bpe.train(docs("ab ab cd"), k = 1)
    val v = Bpe.vocab(toks).as[(String, Long)].collect().toMap
    // merge (a,b) wins at count 2; "cd" stays split as c, d
    assert(v == Map("ab" -> 2L, "c" -> 1L, "d" -> 1L))
  }
}
