package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for large-scale corpus pipelines (the
  * BASELINE north-star operators): tokenization, token/char statistics,
  * n-gram extraction, marker-based language scoring, and fingerprinting.
  *
  * Everything here is built-in Catalyst expressions — whole-stage codegen,
  * no UDFs — and every function is a narrow per-row projection (no shuffle),
  * so cost per row is constant from 1 MB to 100 TB. Deliberately
  * deterministic and SQL-replicable so the driver's DuckDB oracle can verify
  * results value-for-value.
  */
object TextFunctions {

  /** Canonical form: lowercase, whitespace collapsed, trimmed. */
  def normalize(c: Column): Column =
    lower(trim(regexp_replace(c, "\\s+", " ")))

  /** Whitespace tokens of the trimmed text. */
  def words(c: Column): Column = split(trim(c), "\\s+")

  /** Whitespace token count. */
  def tokenCount(c: Column): Column = size(words(c))

  /** BPE-ish lexer classes: alphabetic runs, digit runs, single other
    * non-space symbols. (ASCII classes — identical semantics in Java regex
    * and RE2, so oracle-replicable.) */
  val AlphaToken = "[A-Za-z]+"
  val NumToken = "[0-9]+"
  val PunctToken = "[^A-Za-z0-9\\s]"
  val AnyToken = s"$AlphaToken|$NumToken|$PunctToken"

  /** Count of regex-lexer tokens of the given class. */
  def regexTokenCount(c: Column, pattern: String): Column =
    regexp_count(c, lit(pattern))

  /** Occurrences of `marker` in ` text ` (space-padded so word boundaries
    * match) — counted by length difference, exact integer arithmetic. */
  def markerHits(c: Column, marker: String): Column = {
    val padded = concat(lit(" "), normalize(c), lit(" "))
    ((length(padded) - length(regexp_replace(padded,
      java.util.regex.Pattern.quote(marker), ""))) / marker.length).cast("long")
  }

  /** Marker lists for the n-gram/stopword language-ID heuristic. Scores are
    * comparable because each language contributes 3 single-word markers. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " of "),
    "de" -> Seq(" der ", " und ", " die "),
    "es" -> Seq(" el ", " que ", " los "),
    "fr" -> Seq(" le ", " et ", " les "))

  /** Total marker hits for one language. */
  def langScore(c: Column, markers: Seq[String]): Column =
    markers.map(markerHits(c, _)).reduce(_ + _)

  /** Argmax language with first-listed tie-break; 'und' when every score is
    * zero. Pure CASE cascade — deterministic and SQL-replicable. */
  def langPredict(c: Column): Column = {
    val scores = LangMarkers.map { case (l, ms) => l -> langScore(c, ms) }
    val cascade = scores.zipWithIndex.foldRight(lit("und")) {
      case (((lang, s), i), elseExpr) =>
        val laterBeats = scores.drop(i + 1).map { case (_, s2) => s >= s2 }
        val cond = (laterBeats :+ (s > 0)).reduce(_ && _)
        when(cond, lit(lang)).otherwise(elseExpr)
    }
    cascade
  }

  /** Unicode-script character histogram per document — the
    * script-level complement of [[langPredict]]'s word-marker language
    * ID: a multilingual corpus mix is audited (and mixed-script spam
    * flagged) by per-script character counts, not word lists. Exact
    * integer counts via codegen'd `regexp_count` over the Java script
    * classes (RE2 carries the same script properties, so the oracle
    * re-derives every column); `n_kana` folds Hiragana + Katakana.
    * Entirely narrow — at 100 TB this is a per-row scan function. */
  def scriptMix(docs: DataFrame, textCol: String = "text",
                idCol: String = "doc_id"): DataFrame = {
    def cnt(cls: String): Column =
      expr(s"regexp_count($textCol, '\\\\p{Is$cls}')").cast("long")
    docs.select(col(idCol),
      length(col(textCol)).cast("long").as("n_chars"),
      cnt("Latin").as("n_latin"),
      cnt("Cyrillic").as("n_cyrillic"),
      cnt("Han").as("n_han"),
      cnt("Arabic").as("n_arabic"),
      cnt("Greek").as("n_greek"),
      cnt("Hangul").as("n_hangul"),
      (cnt("Hiragana") + cnt("Katakana")).as("n_kana"),
      expr(s"regexp_count($textCol, '[0-9]')").cast("long").as("n_digit"))
  }

  /** Unicode NFC normalization (UAX #15) — the canonicalization every
    * text dedup key needs: "café" typed as e + COMBINING ACUTE and
    * "café" typed as the precomposed é are byte-different, visually
    * identical, and must hash equal; compatibility singletons like the
    * ANGSTROM SIGN fold to their canonical letter. Per-row JDK
    * `java.text.Normalizer` in a narrow per-partition pass (the same
    * justified string-decoder boundary as the URL/codec layers — no
    * UDF registry, no shuffle); the oracle runs DuckDB's OWN
    * `nfc_normalize`, so two independent implementations of the
    * Unicode composition tables must agree byte-for-byte. */
  def nfcNormalize(df: DataFrame, textCol: String = "text",
                   outCol: String = "text_nfc"): DataFrame = {
    val ti = df.schema.fieldIndex(textCol)
    val schema = df.schema.add(outCol, org.apache.spark.sql.types.StringType)
    df.mapPartitions { it =>
      it.map { row =>
        val t = row.getAs[String](ti)
        val n = if (t == null) null
        else java.text.Normalizer.normalize(t,
          java.text.Normalizer.Form.NFC)
        org.apache.spark.sql.Row.fromSeq(row.toSeq :+ n)
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** The abbreviations whose trailing period does NOT end a sentence —
    * the high-frequency set that dominates English prose (titles,
    * Latin forms, business suffixes). Matched case-insensitively on
    * the word before the period. */
  private val Abbrev = Set("mr", "mrs", "ms", "dr", "prof", "sr", "jr",
    "st", "vs", "etc", "eg", "e.g", "ie", "i.e", "fig", "no", "inc",
    "ltd", "co", "corp", "dept", "est", "approx", "jan", "feb", "mar",
    "apr", "jun", "jul", "aug", "sep", "sept", "oct", "nov", "dec")

  /** Rule-based sentence segmentation — the unit step between document
    * text and sequence packing/chunking (a packer that splits mid-
    * sentence wastes context on fragments). Deterministic rules, no
    * model: a boundary is a run of `.!?` followed by whitespace (or
    * end of text), EXCEPT a '.' whose preceding word is a known
    * abbreviation or a single LETTER (an initial — "J. Smith").
    * Decimal points and ellipses inside tokens never split (no
    * whitespace follows). Empty/whitespace-only segments are dropped;
    * null yields Nil; never throws. */
  def sentences(text: String): Seq[String] = {
    if (text == null) return Nil
    val out = Vector.newBuilder[String]
    val n = text.length
    var start = 0
    var i = 0
    @inline def precedingWord(j: Int): String = {
      var e = j
      var b = e
      while (b > start && !text.charAt(b - 1).isWhitespace) b -= 1
      text.substring(b, e)
    }
    while (i < n) {
      val c = text.charAt(i)
      if (c == '.' || c == '!' || c == '?') {
        var e = i
        while (e + 1 < n && (text.charAt(e + 1) == '.' ||
          text.charAt(e + 1) == '!' || text.charAt(e + 1) == '?')) e += 1
        val atEnd = e + 1 >= n
        val wsNext = !atEnd && text.charAt(e + 1).isWhitespace
        val isBoundary = (atEnd || wsNext) && {
          if (c != '.' || e > i) true // !, ?, or a ..!? run always ends
          else {
            val w = precedingWord(i).toLowerCase(java.util.Locale.ROOT)
            !(Abbrev.contains(w) ||
              (w.length == 1 && w.charAt(0).isLetter))
          }
        }
        if (isBoundary) {
          val s = text.substring(start, e + 1).trim
          if (s.nonEmpty) out += s
          start = e + 1
        }
        i = e + 1
      } else i += 1
    }
    val tail = text.substring(start).trim
    if (tail.nonEmpty) out += tail
    out.result()
  }

  /** DataFrame explode of [[sentences]]: one row per sentence with
    * (`sent_ix`, `sentence`). Documents yielding none produce no rows.
    * One narrow per-partition pass. */
  def explodeSentences(df: DataFrame, textCol: String = "text"): DataFrame = {
    val ti = df.schema.fieldIndex(textCol)
    val schema = df.schema
      .add("sent_ix", org.apache.spark.sql.types.LongType)
      .add("sentence", org.apache.spark.sql.types.StringType)
    df.mapPartitions { it =>
      it.flatMap { row =>
        sentences(row.getAs[String](ti)).iterator.zipWithIndex.map {
          case (s, ix) =>
            org.apache.spark.sql.Row.fromSeq(row.toSeq :+ ix.toLong :+ s)
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** SEGMENT-level language ID (r11 verdict #4): [[explodeSentences]] +
    * [[langPredict]] per sentence, scores exposed — real crawl documents
    * are mixed-language, and published pipelines (CCNet and kin) filter
    * on per-segment language, not the document argmax a boilerplate
    * banner can swing. Narrow per-partition segmentation plus codegen'd
    * marker counts — at 100 TB this is a scan function, no shuffle. */
  def langSegments(df: DataFrame, textCol: String = "text"): DataFrame = {
    val segs = explodeSentences(df, textCol)
    segs.select(segs.columns.map(col).toSeq ++
      (langPredict(col("sentence")).as("pred_lang") +:
        LangMarkers.map { case (l, ms) =>
          langScore(col("sentence"), ms).as(s"score_$l")
        }): _*)
  }

  /** Contiguous same-language SPANS of a [[langSegments]] output:
    * (doc_id, span_ix, span_lang, n_sents) — the unit a span-level
    * extractor keeps or drops (a French quote inside an English page is
    * one droppable span, not a reason to drop the page). One window
    * pass per document + one grouped aggregate; shuffle keyed by
    * doc_id, state bounded by a document's sentence count. */
  def langSpans(segments: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id").orderBy("sent_ix")
    segments
      .withColumn("_chg", when(lag(col("pred_lang"), 1).over(w).isNull ||
        lag(col("pred_lang"), 1).over(w) =!= col("pred_lang"), 1L)
        .otherwise(0L))
      .withColumn("span_ix", sum(col("_chg"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        - 1L)
      .groupBy(col("doc_id"), col("span_ix"))
      .agg(min(col("pred_lang")).as("span_lang"),
        count(lit(1)).as("n_sents"))
  }

  /** Per-document DOMINANT language of a [[langSegments]] output:
    * (doc_id, dom_lang, n_segments, dom_segments, share_permille) —
    * the mixed-language gate's inputs. Dominance by segment count,
    * ties broken lexicographically (deterministic); the share is an
    * integer permille so the gate threshold is engine-exact. */
  def langDominant(segments: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = segments.groupBy(col("doc_id"), col("pred_lang"))
      .agg(count(lit(1)).as("n"))
    val rk = Window.partitionBy("doc_id")
      .orderBy(col("n").desc, col("pred_lang").asc)
    counts
      .withColumn("rk", row_number().over(rk))
      .withColumn("n_segments",
        sum(col("n")).over(Window.partitionBy("doc_id")))
      .filter(col("rk") === 1)
      .select(col("doc_id"), col("pred_lang").as("dom_lang"),
        col("n_segments"), col("n").as("dom_segments"),
        (lit(1000L) * col("n") / col("n_segments")).cast("long")
          .as("share_permille"))
  }

  /** SPAN-LEVEL extraction (the step after [[langSpans]]): rebuild each
    * document keeping only the segments of its DOMINANT language — the
    * CCNet-style move that salvages a mixed-language page instead of
    * dropping it (a French quote inside an English article costs the
    * quote, not the article). Output: (doc_id, text_kept — segments
    * rejoined in document order, n_kept, n_dropped). One grouped
    * aggregate keyed by doc_id; segment order restored with an
    * array_sort over (sent_ix, sentence) structs so the reassembly is
    * partition-independent. */
  def keepDominantSpans(df: DataFrame, textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val segs = langSegments(df, textCol)
      .select(col("doc_id"), col("sent_ix"), col("sentence"),
        col("pred_lang"))
    // The dominant language derives from ONE pass via windows over the
    // same doc_id key (a langDominant join would fork the plan and
    // re-run segmentation + scoring per branch — the diverging-plans
    // trap). Tie-break matches langDominant: count desc, lang asc.
    val wCnt = Window.partitionBy(col("doc_id"), col("pred_lang"))
    val wDoc = Window.partitionBy(col("doc_id"))
      .orderBy(col("_nl").desc, col("pred_lang").asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    segs
      .withColumn("_nl", count(lit(1)).over(wCnt))
      .withColumn("dom_lang", first(col("pred_lang")).over(wDoc))
      .groupBy(col("doc_id"))
      .agg(
        array_join(transform(array_sort(collect_list(
          when(col("pred_lang") === col("dom_lang"),
            struct(col("sent_ix"), col("sentence"))))),
          s => s.getField("sentence")), " ").as("text_kept"),
        count(when(col("pred_lang") === col("dom_lang"), 1)).as("n_kept"),
        count(when(col("pred_lang") =!= col("dom_lang"), 1)).as("n_dropped"))
  }

  /** Word n-grams (n >= 2) as space-joined strings; documents shorter than n
    * yield an empty array. The token array is let-bound so the split runs
    * exactly once per row (see [[SqlLet]]) even though the sliding lookup
    * references it n times. */
  def wordNgrams(c: Column, n: Int): Column = {
    require(n >= 2, s"use words() for unigrams, got n=$n")
    SqlLet.let(words(c), w => slidingNgrams(w, n))
  }

  /** The sliding-window n-gram core over a PRE-BOUND token array — the one
    * copy of the slice/element_at idiom shared by [[wordNgrams]],
    * [[graft.operators.Dedup]]'s shingles, and
    * [[graft.operators.Curation]]'s repetition bigrams. */
  def slidingNgrams(w: Column, n: Int): Column =
    transform(slice(w, lit(1), greatest(size(w) - (n - 1), lit(0))), (x, i) =>
      (1 until n).foldLeft(x)((acc, k) =>
        concat(acc, lit(" "), element_at(w, i + k + 1))))

  /** Content fingerprint — md5 of the normalized text (the deterministic
    * document-identity hash used by exact dedup; `md5` is identical across
    * engines, so oracle-replicable, unlike xxhash64/murmur). */
  def fingerprint(c: Column): Column = md5(normalize(c))

  /** Top-k terms per document by tf·idf, with a RATIONAL idf
    * ((N+1)/(df+1) — no log: transcendental functions aren't bit-identical
    * across engines' libm, and a single multiply/divide chain is, so the
    * DuckDB oracle hash-compares exactly; the ranking is order-isomorphic to
    * log-idf for fixed tf since log is monotone).
    *
    * Plan shape (bounded at any corpus size): explode tokens → (doc, term)
    * count = tf (shuffle keyed on doc+term, partial agg) → df = count over
    * the tf table per term (shuffle bounded by vocabulary) → broadcast-or-
    * shuffle join tf⋈df on term → score → per-doc top-k (WindowGroupLimit
    * prunes before the final exchange). Output:
    * (doc_id, term, tf, df, score, rank), rank <= k, ties (score desc, term asc).
    */
  def tfIdfTopK(docs: DataFrame, numDocs: Long, k: Int,
                textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // tf feeds BOTH the df aggregate and the scored join — materialize it
    // once (eager localCheckpoint, released when unreferenced) instead of
    // re-running the explode+agg per branch. Its size is bounded by
    // Σ distinct terms per doc, far under the exploded token stream.
    val tf = docs
      .select(col(idCol), explode(words(normalize(col(textCol)))).as("term"))
      .groupBy(idCol, "term").agg(count(lit(1)).as("tf"))
      .localCheckpoint(eager = true)
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf.join(df, "term")
      .withColumn("score",
        round((col("tf") * (lit(numDocs) + lit(1.0d))) / (col("df") + lit(1.0d)), 6))
    val w = Window.partitionBy(idCol).orderBy(col("score").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(idCol), col("term"), col("tf"), col("df"), col("score"), col("rank"))
  }

  /** Corpus-statistics familiarity score — the integer-exact stand-in for
    * bigram log-probability quality scoring. Each document scores the sum
    * of `floor(log2(corpus count)) + 1` over its bigrams (computed as
    * `length(bin(count))` — pure integer ops, because transcendental
    * `log()` is a libm call with NO cross-engine bit guarantee, while the
    * binary digit count is the same everywhere). High scores = documents
    * made of common constructions; low = rare/garbled text — the same
    * ordering a real LM-perplexity filter induces, shuffles bounded by the
    * bigram vocabulary, no model call.
    *
    * Plan: one explode+groupBy builds the count model (vocabulary-sized),
    * one equi-join scores, one per-doc aggregate. Output:
    * (idCol, n_bigrams, familiarity). Documents with < 2 tokens have no
    * bigrams and are absent. */
  def bigramFamiliarity(docs: DataFrame, textCol: String = "text",
                        idCol: String = "doc_id"): DataFrame = {
    val bg = docs
      .select(col(idCol), explode(wordNgrams(col(textCol), 2)).as("ngram"))
      .localCheckpoint(eager = true) // feeds model build AND scoring join
    val model = bg.groupBy("ngram").agg(count(lit(1)).as("cnt"))
    bg.join(model, "ngram")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"),
        sum(length(bin(col("cnt")))).as("familiarity"))
  }

  /** Held-out [[bigramFamiliarity]]: the count model is built from TRAIN
    * documents only and scores the REST — the leakage-free formulation
    * (self-scoring inflates every document's score by its own bigrams;
    * a real perplexity filter trains its LM on a held-out corpus for
    * exactly this reason). Unseen bigrams contribute 0 familiarity and
    * are tallied separately as `n_oov` — the OOV rate is itself the
    * junk-detection signal (garbled text is mostly bigrams the train
    * split has never seen).
    *
    * Output: (idCol, n_bigrams, n_oov, familiarity) for every scored
    * (non-train) document with ≥ 1 bigram. Plan: one explode feeds both
    * the model build (train side, vocabulary-sized aggregate) and the
    * scoring LEFT join (bigram-keyed shuffle), then one per-doc
    * aggregate — same two-shuffle shape as the in-corpus variant. */
  def bigramFamiliarityHeldOut(docs: DataFrame, isTrain: Column,
                               textCol: String = "text",
                               idCol: String = "doc_id"): DataFrame = {
    val bg = docs
      .select(col(idCol), isTrain.as("_train"),
        explode(wordNgrams(col(textCol), 2)).as("ngram"))
      .localCheckpoint(eager = true) // feeds model build AND scoring join
    val model = bg.filter(col("_train"))
      .groupBy("ngram").agg(count(lit(1)).as("cnt"))
    bg.filter(!col("_train"))
      .join(model, Seq("ngram"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("cnt").isNull, 1L).otherwise(0L)).as("n_oov"),
        coalesce(sum(length(bin(col("cnt")))), lit(0L)).as("familiarity"))
  }

  /** CONDITIONAL bigram LM score — the CCNet-style cross-entropy filter in
    * the repo's integer-exact idiom. [[bigramFamiliarityHeldOut]] scores raw
    * JOINT counts, which conflates "predictable continuation" with "common
    * context"; a real LM filter scores log p(w2|w1) = log c(w1 w2) − log
    * c(w1 ·). Here both logs are the binary digit count (`length(bin(x))` =
    * floor(log2 x)+1 — exact integers, no libm, so the DuckDB oracle
    * hash-compares), giving per-doc
    * `score = Σ_known (bitlen c12 − bitlen c1) ≤ 0`: the closer to 0, the
    * more predictable the text under the train-split model; unseen bigrams
    * tally as `n_oov` exactly as in the held-out familiarity.
    *
    * Plan (bounded at any corpus size): one explode feeds the model build
    * and the scoring join; the context-normalizer join (model ⋈ per-w1
    * totals) happens on the VOCABULARY-sized model table, so the corpus
    * only pays ONE bigram-keyed shuffle for scoring plus the per-doc
    * aggregate — the same two-corpus-shuffle shape as the familiarity
    * queries. Output: (idCol, n_bigrams, n_oov, score) for every scored
    * (non-train) document with ≥ 1 bigram. */
  def conditionalCrossent(docs: DataFrame, isTrain: Column,
                          textCol: String = "text",
                          idCol: String = "doc_id"): DataFrame = {
    val bg = docs
      .select(col(idCol), isTrain.as("_train"),
        explode(wordNgrams(col(textCol), 2)).as("ngram"))
      .localCheckpoint(eager = true) // feeds model build AND scoring join
    val model = bg.filter(col("_train"))
      .groupBy("ngram").agg(count(lit(1)).as("cnt"))
    // Context totals c(w1 ·) and the normalizer join, both vocabulary-sized.
    val ctx = model
      .groupBy(split(col("ngram"), " ").getItem(0).as("w1"))
      .agg(sum("cnt").as("ctx_cnt"))
    val m = model.withColumn("w1", split(col("ngram"), " ").getItem(0))
      .join(ctx, "w1").select("ngram", "cnt", "ctx_cnt")
    bg.filter(!col("_train"))
      .join(m, Seq("ngram"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("cnt").isNull, 1L).otherwise(0L)).as("n_oov"),
        coalesce(sum(when(col("cnt").isNotNull,
          length(bin(col("cnt"))) - length(bin(col("ctx_cnt"))))
          .otherwise(0)), lit(0)).cast("long").as("score"))
  }

  /** Zipf-slope corpus audit: OLS slope of bit-length(frequency) against
    * bit-length(rank) over the corpus vocabulary — the log-log Zipf fit
    * (natural text ≈ −1) with both logs the EXACT integer log2 used
    * throughout this file, so the whole regression is integer arithmetic:
    *
    *   slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
    *
    * with x = bitlen(rank), y = bitlen(freq). The sums fit in longs at any
    * plausible vocabulary (Σxy ≤ |V|·bitlen(|V|)·bitlen(tokens) ≈ 1.5·10¹²
    * at a billion-term vocabulary); the final cross products are computed
    * in DECIMAL(38,0) where n·Σxy can pass 2⁶³. One rounded division at
    * the end.
    *
    * Ranks come from [[graft.operators.Numbering.assignGlobalIds]] —
    * range-sort + driver prefix-sum over per-partition counts — NOT a
    * single-partition row_number window: the vocabulary of a 100 TB corpus
    * is itself tens of millions of rows. A corpus whose frequency
    * histogram drifts from its recorded slope has changed composition —
    * the cheap drift alarm upstream of the expensive dedup/curation
    * reruns. Output: one row (n_terms, sxy, sxx, slope). */
  def zipfSlope(docs: DataFrame, textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.functions.{length => flen}
    def bitLen(c: Column): Column = flen(bin(c)).cast("long")
    val freq = docs
      .select(explode(words(normalize(col(textCol)))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("freq"))
    val ranked = graft.operators.Numbering.assignGlobalIds(
      freq, order = Seq(col("freq").desc, col("term").asc), out = "rank")
    val pts = ranked.select(bitLen(col("rank")).as("x"), bitLen(col("freq")).as("y"))
    val d38 = "decimal(38,0)"
    // Degenerate fit — every x equal (single-rank-bucket vocabulary, e.g.
    // one term), where n·Σx²−(Σx)² = 0 — yields NULL, not NaN: the slope
    // of a one-point cloud is undefined, and NaN would poison any
    // downstream drift comparison silently (cf. classifierAuc's
    // single-class NULL). SqlLet so the denominator evaluates once.
    val slope = SqlLet.let(
      (col("n_terms").cast(d38) * col("sxx").cast(d38)
        - col("sx").cast(d38) * col("sx").cast(d38)).cast("double"), den =>
      when(den === 0.0d, lit(null).cast("double")).otherwise(round(
        (col("n_terms").cast(d38) * col("sxy").cast(d38)
          - col("sx").cast(d38) * col("sy").cast(d38)).cast("double") / den,
        6)))
    pts.agg(count(lit(1)).cast("long").as("n_terms"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      .select(col("n_terms"), col("sxy").cast("long").as("sxy"),
        col("sxx").cast("long").as("sxx"), slope.as("slope"))
  }

  /** DSIR-style importance weights: per-document integer log-ratio of a
    * TARGET distribution (e.g. one curated source) vs the RAW corpus over
    * the doc's bigram features —
    * `weight = Σ (bitlen(c_target+1) − bitlen(c_raw+1))` (add-one so unseen
    * target bigrams contribute bitlen(1)=1, no null branch; bitlen = exact
    * integer log2 as everywhere else in this file). Documents whose
    * constructions are relatively MORE frequent in the target than in the
    * corpus at large weight higher — the ordering data-selection importance
    * resampling induces, with zero float accumulation so the DuckDB oracle
    * hash-compares.
    *
    * Plan: one explode feeds both count models; raw⋈target is a
    * vocabulary-sized LEFT join (target ⊆ raw by construction, so the
    * scoring join back to the corpus is INNER — every scored bigram is in
    * the raw model); then one per-doc aggregate. Two corpus-scale shuffles
    * total, same shape as [[conditionalCrossent]]. Output:
    * (idCol, lang, n_bigrams, weight) for every NON-target document with
    * ≥ 1 bigram. */
  def importanceWeights(docs: DataFrame, isTarget: Column,
                        textCol: String = "text",
                        idCol: String = "doc_id"): DataFrame = {
    val bg = docs
      .select(col(idCol), col("lang"), isTarget.as("_tgt"),
        explode(wordNgrams(col(textCol), 2)).as("ngram"))
      .localCheckpoint(eager = true) // feeds both models AND the scoring join
    val raw = bg.groupBy("ngram").agg(count(lit(1)).as("rc"))
    val tgt = bg.filter(col("_tgt")).groupBy("ngram").agg(count(lit(1)).as("tc"))
    val m = raw.join(tgt, Seq("ngram"), "left")
      .select(col("ngram"), col("rc"), coalesce(col("tc"), lit(0L)).as("tc"))
    bg.filter(!col("_tgt"))
      .join(m, "ngram")
      .groupBy(col(idCol), col("lang"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(length(bin(col("tc") + 1)) - length(bin(col("rc") + 1)))
          .cast("long").as("weight"))
  }
}
