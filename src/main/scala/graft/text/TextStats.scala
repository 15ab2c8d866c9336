package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Corpus-analysis operators for the training-data pipeline: token
  * counting, quality scoring, n-gram language identification, and
  * document fingerprinting — all pure `functions._` column expressions
  * (whole-stage codegen, no UDFs), each oracle-expressible in ANSI SQL.
  */
object TextStats {

  /** Whitespace token count (empty tokens dropped). */
  def tokenCount(text: Column): Column = Analyzer.tokenCount(text)

  /** Email pattern for [[scrubPii]] — character classes and bounded
    * quantifiers only, so Java regex (Spark codegen) and RE2 (DuckDB,
    * and most data-plane scrubbers) agree on every match. */
  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"

  /** Long digit runs (account/phone/SSN-ish identifiers). */
  val LongNumberRe = "[0-9]{9,}"

  /** PII redaction: emails → `<email>`, 9+-digit runs → `<num>`.
    * Pure codegen'd regexp_replace chain — rides inside the scan stage,
    * no UDF, no shuffle. Order matters: emails first, so an address
    * containing digits is redacted as one token, not chopped by the
    * number rule. */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailRe, "<email>"),
      LongNumberRe, "<num>")

  /** Heuristic quality signals (reference-free): length, token stats,
    * punctuation/digit/uppercase ratios, stopword hit-rate. */
  val EnStopwords: Seq[String] = Seq(
    "the", "of", "and", "a", "to", "in", "is", "it", "that", "for",
    "on", "with", "as", "was", "at", "by", "an", "be", "this", "are")

  def qualitySignals(docs: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val toks = Analyzer.tokenize(t)
    val nTok = size(toks)
    val stopHits = size(filter(toks, _.isin(EnStopwords: _*)))
    docs.select(col(idCol),
      length(t).as("n_chars"),
      nTok.as("n_tokens"),
      (length(t).cast("double") / greatest(nTok, lit(1)).cast("double"))
        .as("mean_token_len"),
      (length(regexp_replace(t, "[^.,;:!?]", "")).cast("double") /
        greatest(length(t), lit(1)).cast("double")).as("punct_ratio"),
      (length(regexp_replace(t, "[^0-9]", "")).cast("double") /
        greatest(length(t), lit(1)).cast("double")).as("digit_ratio"),
      (stopHits.cast("double") / greatest(nTok, lit(1)).cast("double"))
        .as("stopword_ratio"))
  }

  /** Composite quality score in [0,1]-ish: stopword presence up-weights,
    * digit/punct excess down-weights, degenerate lengths clipped. */
  def qualityScore(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame =
    qualitySignals(docs, idCol, textCol)
      .select(col(idCol),
        (least(col("n_tokens").cast("double") / lit(20.0), lit(1.0)) *
          lit(0.4) +
          least(col("stopword_ratio") * lit(4.0), lit(1.0)) * lit(0.4) +
          (lit(1.0) - least(col("digit_ratio") * lit(5.0), lit(1.0))) *
            lit(0.2)).as("quality"))

  /** Tiny trait-word lists for the language-ID heuristic. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "that", "with", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "que", "pour", "dans"),
    "es" -> Seq("el", "los", "las", "es", "que", "para", "con", "una"))

  /** N-gram/stopword language ID: argmax of marker-token hit counts,
    * deterministic tie-break (lexicographically last language code wins —
    * the struct max compares (hits, lang) fields in order), "und"
    * (undetermined) when nothing matches. */
  def languageId(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    val toks = Analyzer.tokenize(col(textCol))
    val scored = LangMarkers.map { case (lang, words) =>
      struct(size(filter(toks, _.isin(words: _*))).as("hits"),
        lit(lang).as("lang"))
    }
    val best = array_max(array(scored: _*))
    docs.select(col(idCol),
      when(best.getField("hits") > 0, best.getField("lang"))
        .otherwise(lit("und")).as("lang_pred"),
      best.getField("hits").as("marker_hits"))
  }

  /** Unigram-LM perplexity scoring — the deterministic baseline form of
    * the CCNet/CC-100 "LM quality filter" (Wenzek et al. 2020 filter
    * CommonCrawl by LM perplexity; a unigram model keeps the signal
    * reproducible with no external model artifact). The corpus itself
    * is the model: p(tok) = count(tok) / total tokens, and a document
    * scores its average negative log-probability
    * `nll = -(1/n) Σ ln p(tok_i)` — low = in-distribution text, high =
    * off-vocabulary or unusual token mix. Docs with no tokens are
    * dropped (no distribution to score).
    *
    * Scale: the vocabulary table is a hash-agg over tokens (map-side
    * combinable); scoring is one shuffle join keyed by token — at web
    * vocabulary sizes (~100M types) that join stays well within normal
    * shuffle range, and Zipf skew is harmless because the per-token
    * payload is a single double and the (doc, token) pairs of a hot
    * token spread across whatever partitions hold the docs.
    */
  def unigramNll(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame =
    unigramTokenNll(docs, idCol, textCol)
      .groupBy(idCol)
      .agg((sum("tok_nll") / count(lit(1))).as("nll"))

  /** Per-token-occurrence negative log-probability under the corpus
    * unigram model — the exact-aggregation seam: a caller needing
    * cross-engine-stable doc scores snaps `tok_nll` to integer micros
    * BEFORE summing (float sums are order-sensitive; integer sums are
    * associative). */
  def unigramTokenNll(docs: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol),
      explode(Analyzer.tokenize(col(textCol))).as("tok"))
    // three consumers (total, vocab, scoring) — Spark re-executes
    // duplicated subtrees, so cache the exploded corpus once (the
    // caller/bench cleans up, as with Dedup's persisted pipelines)
    toks.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val total = toks.agg(count(lit(1)).cast("double").as("__n"))
    val vocab = toks.groupBy("tok")
      .agg(count(lit(1)).cast("double").as("c"))
      .crossJoin(total) // 1-row total rides along, no driver action
      .select(col("tok"), (col("c") / col("__n")).as("p"))
    toks.join(vocab, "tok")
      .select(col(idCol), col("tok"), negate(log(col("p"))).as("tok_nll"))
  }

  /** Per-token NLL under a Jelinek-Mercer INTERPOLATED BIGRAM model —
    * the CCNet-style perplexity filter of [[unigramTokenNll]] upgraded
    * one order: p(w|prev) = λ·c(prev,w)/c(prev,·) + (1−λ)·c(w)/N,
    * doc-initial tokens backing off to the unigram term alone. The
    * corpus is its own model, so every scored bigram exists in the
    * count tables and the left joins never miss.
    *
    * Scale: one posexplode + one doc-keyed window (lag) + three
    * hash-aggs (unigram, bigram, context), then count-table joins keyed
    * by tok / (prev, tok) — the same shuffle shapes as the unigram
    * scorer with one extra (prev, tok)-keyed exchange; no vocabulary
    * ever broadcasts except the 1-row total. Cross-engine: counts are
    * exact integers, the probability is one fixed parenthesization
    * `λ·(cb/cp) + (1−λ)·(cu/N)`, and callers snap tok_nll to micros
    * before summing (q116). */
  def bigramTokenNll(docs: DataFrame, lambda: Double = 0.75,
                     idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol),
      posexplode(Analyzer.tokenize(col(textCol))).as(Seq("pos", "tok")))
    // feeds total, unigram, bigram AND scoring — cache once
    toks.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy("pos")
    val prevd = toks.withColumn("prev", lag("tok", 1).over(w))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val total = toks.agg(count(lit(1)).cast("double").as("__n"))
    val uni = toks.groupBy("tok")
      .agg(count(lit(1)).cast("double").as("cu"))
    val bi = prevd.filter(col("prev").isNotNull)
      .groupBy("prev", "tok").agg(count(lit(1)).cast("double").as("cb"))
    val ctx = bi.groupBy("prev").agg(sum("cb").as("cp"))
    prevd.join(uni, "tok")
      .crossJoin(broadcast(total))
      .join(bi, Seq("prev", "tok"), "left")
      .join(ctx, Seq("prev"), "left")
      .select(col(idCol), col("pos"), col("tok"), col("prev"),
        negate(log(
          when(col("prev").isNull, col("cu") / col("__n"))
            .otherwise(lit(lambda) * (col("cb") / col("cp")) +
              lit(1 - lambda) * (col("cu") / col("__n")))))
          .as("tok_nll"))
  }

  /** Interpolated Kneser-Ney bigram scoring (Kneser & Ney 1995; the
    * smoothing behind KenLM-style corpus-quality filters) — absolute
    * discount d on observed bigrams, with the freed mass backed off to
    * the CONTINUATION probability (how many distinct contexts a word
    * follows, not how often it occurs — the "San Francisco" fix):
    *
    *   p(w|v)  = (c(vw) − d)/c(v·) + d · N1+(v·)/c(v·) · pc(w)
    *   pc(w)   = (N1+(·w) + 1) / (D + V)     [+1: doc-initial-only words]
    *
    * with D = distinct bigram types, V = vocab size. Doc-initial tokens
    * score on pc alone. Scoring the training corpus itself means every
    * non-initial bigram was observed, so c(vw) ≥ 1 > d and every term is
    * finite.
    *
    * Shape mirrors [[bigramTokenNll]]: one cached token stream, one
    * doc-keyed window for `prev` (the only corpus-sized shuffle — the
    * same doc_id exchange the downstream per-doc aggregation reuses),
    * then vocab-/bigram-type-sized count tables joined back; AQE
    * broadcasts them when they fit. All divisions are single IEEE ops in
    * the same association order as the DuckDB oracle, so a micros snap
    * of the per-token NLL is engine-exact.
    */
  def knBigramTokenNll(docs: DataFrame, discount: Double = 0.75,
                       idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol),
      posexplode(Analyzer.tokenize(col(textCol))).as(Seq("pos", "tok")))
    // These three persists feed multiple consumers of the returned LAZY
    // frame and so outlive this call by design; the caller/bench's
    // post-action cleanup (or LRU eviction) releases them, as with
    // Dedup's persisted pipelines.
    toks.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy("pos")
    val prevd = toks.withColumn("prev", lag("tok", 1).over(w))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bi = prevd.filter(col("prev").isNotNull)
      .groupBy("prev", "tok").agg(count(lit(1)).cast("double").as("cb"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ctx = bi.groupBy("prev")
      .agg(sum("cb").as("cp"), count(lit(1)).cast("double").as("n1p"))
    val n1r = bi.groupBy("tok")
      .agg(count(lit(1)).cast("double").as("n1r"))
    val consts = bi.agg(count(lit(1)).cast("double").as("__d_types"))
      .crossJoin(toks.agg(
        countDistinct(col("tok")).cast("double").as("__v")))
    val d = lit(discount)
    // pc in the exact association order of the oracle:
    // (n1r + 1) / (d_types + v)
    val pc = (coalesce(col("n1r"), lit(0d)) + lit(1d)) /
      (col("__d_types") + col("__v"))
    prevd
      .join(n1r, Seq("tok"), "left")
      .crossJoin(broadcast(consts))
      .join(bi, Seq("prev", "tok"), "left")
      .join(ctx, Seq("prev"), "left")
      .select(col(idCol), col("pos"), col("tok"), col("prev"),
        negate(log(
          when(col("prev").isNull, pc)
            .otherwise((col("cb") - d) / col("cp") +
              d * col("n1p") / col("cp") * pc)))
          .as("tok_nll"))
  }

  /** Top-k DISCRIMINATIVE terms per group by add-one log-odds keyness
    * (the corpus-linguistics "keyness" measure; the simple-prior form
    * of Monroe et al. 2008's fightin'-words log-odds):
    *   score(t, g) = ln((c_g+1)/(N_g−c_g+1)) − ln((c_r+1)/(N_r−c_r+1))
    * with r the rest of the corpus — what vocabulary makes a language /
    * source / split DIFFERENT, the drift diagnostic between corpus
    * slices.
    *
    * Shape: one explode + (group, term) hash-agg, two roll-ups, a
    * vocabulary-keyed join and a per-group WindowGroupLimit top-k —
    * no global sort. All counts are exact integers; ranking compares
    * micros-SNAPPED scores (integer order is engine-exact, the q69
    * precedent), ties to the smaller term. */
  def keyTerms(docs: DataFrame, groupCol: String = "lang", k: Int = 10,
               textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(groupCol).as("g"),
      explode(Analyzer.tokenize(col(textCol))).as("tok"))
    val cl = toks.groupBy("g", "tok").agg(count(lit(1)).as("cl"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nl = cl.groupBy("g").agg(sum("cl").as("nl"))
    val cAll = cl.groupBy("tok").agg(sum("cl").as("c"))
    val nAll = nl.agg(sum("nl").as("n"))
    val d = "double"
    val scored = cl.join(nl, "g").join(cAll, "tok")
      .crossJoin(broadcast(nAll))
      .withColumn("score_micros", graft.util.Exact.micros(
        log((col("cl") + 1).cast(d) / (col("nl") - col("cl") + 1).cast(d)) -
          log((col("c") - col("cl") + 1).cast(d) /
            (col("n") - col("nl") - (col("c") - col("cl")) + 1).cast(d))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g")
      .orderBy(col("score_micros").desc, col("tok"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("g").as(groupCol), col("rank"), col("tok"),
        col("cl"), col("score_micros"))
  }

  /** Gopher-style repetition signals (Rae et al. 2021, appendix A1.1,
    * adapted to token n-grams since this corpus has no line structure):
    *
    *  - `top2_frac` / `top3_frac` — fraction of all 2-/3-grams taken by
    *    the single most frequent one (boilerplate headers/footers and
    *    keyword-stuffed spam score high);
    *  - `dup5_frac` — fraction of 5-gram occurrences that are repeats
    *    of another 5-gram in the same document.
    *
    * Docs shorter than n tokens contribute no n-grams and report 0.0.
    *
    * Scale: each signal is explode → hash-agg keyed (doc, gram) →
    * hash-agg keyed doc. Both aggregations combine map-side (partial
    * agg), keys never leave the document, so the shuffle volume is
    * O(distinct grams) and skew is bounded by the longest document —
    * no corpus-wide hot key exists by construction.
    */
  def repetitionSignals(docs: DataFrame, idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    def gramFracs(n: Int, alias: String, dup: Boolean): DataFrame = {
      val perGram = docs
        .select(col(idCol), explode(Analyzer.shingles(col(textCol), n))
          .as("g"))
        .groupBy(col(idCol), col("g")).agg(count(lit(1)).as("c"))
      val total = sum("c").cast("double")
      val frac =
        if (dup) (sum("c") - count(lit(1))).cast("double") / total
        else max("c").cast("double") / total
      perGram.groupBy(idCol).agg(frac.as(alias))
    }
    docs.select(col(idCol))
      .join(gramFracs(2, "top2_frac", dup = false), Seq(idCol), "left")
      .join(gramFracs(3, "top3_frac", dup = false), Seq(idCol), "left")
      .join(gramFracs(5, "dup5_frac", dup = true), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("top2_frac"), lit(0.0)).as("top2_frac"),
        coalesce(col("top3_frac"), lit(0.0)).as("top3_frac"),
        coalesce(col("dup5_frac"), lit(0.0)).as("dup5_frac"))
  }

  /** Order-sensitive document fingerprint: Σ over positions of
    * H(pos:token) mod 1e9+7 — stable, portable, overflow-safe. */
  /** Corpus vocabulary with a document-frequency floor — the tokenizer-
    * training / feature-hashing precursor: (term, df) for terms
    * appearing in ≥ `minDf` distinct documents. One distinct + one
    * hash-agg keyed by term (map-side combine applies). */
  def vocabulary(docs: DataFrame, minDf: Long,
                 idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame =
    docs.select(col(idCol),
        explode(array_distinct(Analyzer.tokenize(col(textCol))))
          .as("term"))
      .groupBy("term")
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)

  /** Per-document out-of-vocabulary stats against a vocabulary frame
    * (term column): (id, n_tokens, oov_tokens, oov_frac). Tokens count
    * with multiplicity. The vocab is zipf-bounded (≪ corpus) so it is
    * broadcast by default and the token stream is probed inside its own
    * scan stage — the corpus never shuffles before the per-doc count
    * (map-side combinable). `broadcastVocab = false` for a vocabulary
    * too large for executor memory. */
  def oovStats(docs: DataFrame, vocab: DataFrame,
               idCol: String = "doc_id", textCol: String = "text",
               broadcastVocab: Boolean = true): DataFrame = {
    val v = vocab.select(col("term"), lit(true).as("__inv"))
    val toks = docs.select(col(idCol),
      explode(Analyzer.tokenize(col(textCol))).as("term"))
    toks.join(if (broadcastVocab) broadcast(v) else v, Seq("term"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__inv").isNull, 1L).otherwise(0L)).as("oov_tokens"))
      .withColumn("oov_frac",
        col("oov_tokens").cast("double") / col("n_tokens").cast("double"))
  }

  /** Vocabulary coverage curve: the `topK` most frequent types by
    * occurrence count (ties to the lexicographically smaller term) with
    * the cumulative fraction of all token occurrences they cover — the
    * "how big must the vocab be" tokenizer-design curve. The type-count
    * table is corpus-wide but zipf-bounded; the top-K cut is a
    * TakeOrderedAndProject (never a global sort) and the running sum
    * windows over the K-row slice only — bounded by construction, like
    * [[graft.search.Search.paginate]]. Counts accumulate as integers
    * (exact); the fraction is one IEEE division per row. */
  def vocabCoverage(docs: DataFrame, topK: Int,
                    idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = docs
      .select(explode(Analyzer.tokenize(col(textCol))).as("term"))
      .groupBy("term")
      .agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val total = counts.agg(sum("cnt").as("__tot"))
    val order = Seq(col("cnt").desc, col("term").asc)
    counts.orderBy(order: _*).limit(topK)
      .withColumn("rank", row_number().over(Window.orderBy(order: _*)))
      .withColumn("cum_cnt",
        sum("cnt").over(Window.orderBy(order: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(total))
      .select(col("rank"), col("term"), col("cnt"), col("cum_cnt"),
        (col("cum_cnt").cast("double") / col("__tot").cast("double"))
          .as("cum_frac"))
  }

  /** n-gram language-model continuation table: for every (n−1)-token
    * context, the total continuation count and the most frequent next
    * token (ties to the lexicographically smaller token — deterministic).
    * One explode + one (context, next) hash-agg; the per-context argmax
    * is a rank-1 window that Spark prunes with WindowGroupLimit (no full
    * per-context sort materialization at scale). */
  def continuationTable(docs: DataFrame, n: Int,
                        idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    require(n >= 2, "need at least a 1-token context")
    import org.apache.spark.sql.expressions.Window
    val grams = docs.select(
      explode(Analyzer.shingles(col(textCol), n)).as("g"))
    val counts = grams.select(
        substring_index(col("g"), " ", n - 1).as("context"),
        substring_index(col("g"), " ", -1).as("next_tok"))
      .groupBy("context", "next_tok")
      .agg(count(lit(1)).as("cnt"))
    val byCtx = Window.partitionBy("context")
    counts
      .withColumn("total", sum("cnt").over(byCtx))
      .withColumn("rn", row_number().over(
        byCtx.orderBy(col("cnt").desc, col("next_tok").asc)))
      .filter(col("rn") === 1)
      .select(col("context"), col("total"), col("next_tok"), col("cnt"))
  }

  /** PMI collocations (Church & Hanks 1990, "Word association norms,
    * mutual information, and lexicography"): adjacent-token pairs
    * scored by pointwise mutual information
    * `pmi = ln( p(xy) / (p(x)·p(y)) )` — high-PMI bigrams are the
    * multiword expressions ("new york") a tokenizer/phrase-miner wants.
    * Noise floor via `minCount`.
    *
    * All counts are integers off two hash-aggs (unigrams, bigrams);
    * the PMI is evaluated in ONE fixed parenthesization
    * `((cnt·N)·N) / ((M·cx)·cy)` then ln — a deterministic op chain
    * both engines reproduce (the q53/q62 micros-ln precedent). The
    * unigram table is vocabulary-sized → broadcast joins. */
  def collocations(docs: DataFrame, minCount: Long = 5,
                   idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    val uni = docs
      .select(explode(Analyzer.tokenize(col(textCol))).as("t"))
      .groupBy("t").agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = uni.agg(sum("c").cast("double").as("__n"))
    val bc = docs
      .select(explode(Analyzer.shingles(col(textCol), 2)).as("g"))
      .select(substring_index(col("g"), " ", 1).as("w1"),
        substring_index(col("g"), " ", -1).as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val m = bc.agg(sum("cnt").cast("double").as("__m"))
    bc.filter(col("cnt") >= minCount)
      .join(broadcast(uni.select(col("t").as("w1"), col("c").as("cx"))),
        Seq("w1"))
      .join(broadcast(uni.select(col("t").as("w2"), col("c").as("cy"))),
        Seq("w2"))
      .crossJoin(broadcast(n))
      .crossJoin(broadcast(m))
      .withColumn("pmi",
        log(((col("cnt").cast("double") * col("__n")) * col("__n")) /
          ((col("__m") * col("cx").cast("double")) *
            col("cy").cast("double"))))
      .select(col("w1"), col("w2"), col("cnt"), col("pmi"))
  }

  def fingerprint(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol),
      posexplode(Analyzer.tokenize(col(textCol))).as(Seq("pos", "tok")))
    toks.select(col(idCol),
        (Dedup.portableHash(concat(col("pos"), lit(":"), col("tok")))
          % lit(1000000007L)).as("h"))
      .groupBy(idCol)
      .agg(sum("h").as("fingerprint"))
  }
}
