package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-pipeline analysis operators over a documents table: token/size
  * stats, quality scoring, marker-based language id, and content
  * fingerprinting. All are narrow, codegen-friendly column expressions —
  * no UDFs — so they run at scan speed on a 100 TB corpus.
  */
object TextAnalysis {

  /** Token pattern shared with the DuckDB oracle: words, digit runs, or
    * single non-space symbols (a BPE-ish first split).
    */
  val tokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  private def words(textCol: Column): Column = split(textCol, " ")

  private def countIn(arr: Column, values: Seq[String]): Column =
    size(filter(arr, w => w.isin(values.map(lit): _*)))

  val stopwords = Seq("the", "a", "of", "and", "to", "in")

  /** Per-document size/shape statistics + a deterministic quality score
    * (stopword ratio + short-doc penalty — the usual cheap heuristics).
    */
  def stats(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val w = words(col(textCol))
    docs.select(
      col(idCol),
      length(col(textCol)).as("n_chars_calc"),
      size(w).as("n_words"),
      size(regexp_extract_all(col(textCol), lit(tokenPattern), lit(0))).as("n_tokens"),
      size(array_distinct(w)).as("n_distinct_words"),
      countIn(w, stopwords).as("n_stopwords"))
      .withColumn("stopword_ratio",
        col("n_stopwords").cast("double") / col("n_words"))
      .withColumn("distinct_ratio",
        col("n_distinct_words").cast("double") / col("n_words"))
      .withColumn("quality_score",
        when(col("n_words") >= 20, lit(1.0)).otherwise(lit(0.5)) * col("distinct_ratio"))
  }

  /** Repetition signals per document — the boilerplate/degenerate-text
    * heuristics quality filters gate on (the "fraction of characters in
    * duplicated n-grams" family): over NON-distinct word bigrams,
    * `top_bigram_fraction` = occurrences of the most common bigram /
    * total bigrams, and `dup_bigram_fraction` = occurrences belonging to
    * any repeated bigram / total bigrams. Documents with fewer than 2
    * words have no bigrams and produce no row.
    *
    * Scale shape: one shuffle on (doc, bigram) for the counts, one on doc
    * for the rollup — the same bounded-fanout plan as shingling; nothing
    * is collected per row beyond two longs.
    */
  def repetition(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("pos"))
    val bigrams = docs
      .select(col(idCol), posexplode(words(col(textCol))).as(Seq("pos", "word")))
      .withColumn("w1", lead(col("word"), 1).over(w))
      .filter(col("w1").isNotNull)
      .select(col(idCol), concat_ws(" ", col("word"), col("w1")).as("bigram"))
    bigrams.groupBy(idCol, "bigram").agg(count(lit(1)).as("c"))
      .groupBy(idCol)
      .agg(
        sum("c").as("n_bigrams"),
        max("c").as("top_bigram_count"),
        (max("c").cast("double") / sum("c")).as("top_bigram_fraction"),
        (sum(when(col("c") > 1, col("c")).otherwise(0L)).cast("double") / sum("c"))
          .as("dup_bigram_fraction"))
  }

  /** Character-n-gram language id: each language has a signature profile
    * of char n-grams (space-padded, so word-boundary grams count too);
    * the score is the total occurrence count of the profile's grams in
    * the padded text, and the prediction is the argmax (ties broken by
    * fixed language order, `und` when no gram fires). Occurrences are
    * counted with the length-difference trick —
    * `(len(t) - len(replace(t, g, ''))) / len(g)` — which is a single
    * codegen'd expression per gram on both engines (identical
    * non-overlapping left-to-right scan semantics in Spark and DuckDB).
    * Swap the profiles for trained ones at deployment; the operator shape
    * (per-row argmax over k linear scores) is unchanged.
    */
  val defaultProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq(" the ", " th", "he ", " of ", " and "),
    "de" -> Seq(" der ", " die ", " und ", "ch ", " ein"),
    "fr" -> Seq(" le ", " les ", " de ", " et ", "ou "))

  def langId(
      docs: DataFrame,
      profiles: Map[String, Seq[String]] = defaultProfiles,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val langs = profiles.keys.toSeq.sorted
    def score(l: String): Column =
      profiles(l).map { g =>
        // bind the gram as a VALUE, never spliced into SQL text (the
        // mergePair rule): a trained profile's gram may carry quotes or
        // backslashes — " l'" is among the most frequent French grams —
        // and a spliced expr() would die at parse time or match the
        // wrong string
        ((length(col("graft_padded")) -
          length(replace(col("graft_padded"), lit(g)))) / lit(g.length))
          .cast("int")
      }.reduce(_ + _)
    val scored = docs
      // pad with spaces so boundary grams match at text edges
      .withColumn("graft_padded", concat(lit(" "), col(textCol), lit(" ")))
      .select(col(idCol) +: langs.map(l => score(l).as(s"hits_$l")): _*)
    // greatest() needs >= 2 children — a single-profile map (is-it-X-or-
    // und deployment) is legitimate and must not die at plan time
    val maxHits =
      if (langs.size == 1) col(s"hits_${langs.head}")
      else greatest(langs.map(x => col(s"hits_$x")): _*)
    // argmax with deterministic tiebreak: first lang (sorted) with max hits
    val best = langs.foldRight(lit("und")) { (l, acc) =>
      when(col(s"hits_$l") === maxHits && maxHits > 0, lit(l)).otherwise(acc)
    }
    scored.withColumn("lang_pred", best)
      .select(Seq(col(idCol), col("lang_pred")) ++ langs.map(l => col(s"hits_$l")): _*)
  }

  /** PII patterns shared with the DuckDB oracle — deliberately simple
    * character classes that mean the same thing in Java regex and RE2:
    * emails, and international-prefix phone numbers of the `+C-NNN-NNNN`
    * shape. Swap in audited patterns at deployment; the operator shape
    * (codegen'd scan-replace-count, no UDF) is what matters at 100 TB.
    */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phonePattern = "\\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}"

  /** PII scrub: replace emails/phones with typed placeholder tokens and
    * count the redactions per document (the audit trail a scrub job must
    * emit). Replacement runs email-first, and the phone COUNT is taken on
    * the email-scrubbed text — a phone-shaped string inside an email
    * local part (`a+1-555-0100@x.com`) is redacted as part of `<EMAIL>`,
    * so counting it as a phone would report a `<PHONE>` redaction that
    * never happened; counts always equal emitted placeholder tokens.
    */
  def scrubPii(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val emailScrubbed = regexp_replace(col(textCol), emailPattern, "<EMAIL>")
    docs.select(
      col(idCol),
      size(regexp_extract_all(col(textCol), lit(emailPattern), lit(0))).as("n_emails"),
      size(regexp_extract_all(emailScrubbed, lit(phonePattern), lit(0))).as("n_phones"),
      regexp_replace(emailScrubbed, phonePattern, "<PHONE>").as("clean_text"))
  }

  /** Corpus-relative term weighting — TF-IDF and BM25 per (document,
    * term): the scoring backbone of corpus search, keyword extraction,
    * and quality-by-informativeness filters.
    *
    * Shape at scale: ONE scan of the corpus into the (doc, term, tf)
    * count table, which is materialized (`localCheckpoint`) because four
    * consumers read it — doc lengths, document frequencies, the corpus
    * singleton (N, total tokens), and the final join; without the
    * materialization each consumer re-derives the scan+explode+aggregate
    * chain (measured: 4 full corpus scans, zero exchange reuse). All
    * downstream reductions are hash aggregates with map-side partials —
    * deliberately NOT windows: `count over (partition by term)` would
    * sort every occurrence of a stop-word-grade term into one partition,
    * the exact skew cliff partial aggregation avoids. The corpus
    * singleton rides along as a broadcast cross join, never a driver
    * action. No UDFs — `ln` and the arithmetic are codegen'd — and
    * nothing materializes the |docs|×|vocab| dense matrix: output stays
    * one row per OBSERVED (doc, term).
    *
    * `tfidf = tf · ln(1 + N/df)`;
    * `bm25 = ln(1 + (N - df + 0.5)/(df + 0.5)) ·
    *         tf·(k1+1)/(tf + k1·(1 - b + b·dl/avgdl))`
    * (the Robertson/Sparck-Jones idf in its always-positive form).
    */
  def termWeights(
      docs: DataFrame,
      k1: Double = 1.2,
      b: Double = 0.75,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = docs
      .select(col(idCol), explode(words(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
    // DISK-backed checkpoint, not the default deserialized in-memory
    // level: the per-(doc, term) table is token-stream-sized, and the
    // default level starves the downstream hash aggregates of execution
    // memory (the measured AGGREGATE_OUT_OF_MEMORY failure
    // Curation.importanceWeights documents; same shape here)
    val tf = toks.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
      .localCheckpoint(true, org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val dl = tf.groupBy(idCol).agg(sum("tf").as("dl"))
    val dft = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val corpus = dl.agg(
      count(lit(1)).as("n_docs"), sum("dl").as("total_tokens"))
    val avgdl = col("total_tokens").cast("double") / col("n_docs")
    val idfBm = log(lit(1.0) +
      (col("n_docs").cast("double") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val bm = idfBm * (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / avgdl))
    tf.join(dl, Seq(idCol))
      .join(dft, Seq("term"))
      .crossJoin(broadcast(corpus))
      .select(
        col(idCol), col("term"), col("tf"), col("df"), col("dl"),
        (col("tf") * log(lit(1.0) + col("n_docs").cast("double") / col("df")))
          .as("tfidf"),
        bm.as("bm25"))
  }

  /** Linear-model quality scoring — the classifier-filter stage of corpus
    * curation (fastText-style quality models reduce to exactly this at
    * serving time: a dot product over cheap features + a sigmoid). The
    * features are the already-verified [[stats]] columns; the weights are
    * caller-supplied (training happens offline — swap in learned weights
    * at deployment; the operator shape is what runs at 100 TB).
    *
    * `quality_prob = sigmoid(b + w_len·ln(1+n_words) + w_stop·stopword_ratio
    * + w_distinct·distinct_ratio)` — one codegen'd row-local expression,
    * no UDF, no shuffle beyond [[stats]]' none.
    */
  final case class QualityWeights(
      bias: Double = -2.0,
      wLogLen: Double = 0.6,
      wStopword: Double = 1.5,
      wDistinct: Double = 0.8)

  def qualityClassifier(
      docs: DataFrame,
      w: QualityWeights = QualityWeights(),
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val st = stats(docs, idCol, textCol)
    val z = lit(w.bias) +
      lit(w.wLogLen) * log(lit(1.0) + col("n_words")) +
      lit(w.wStopword) * col("stopword_ratio") +
      lit(w.wDistinct) * col("distinct_ratio")
    st.select(col(idCol), col("n_words"), col("stopword_ratio"),
        col("distinct_ratio"))
      .withColumn("quality_prob", lit(1.0) / (lit(1.0) + exp(-z)))
  }

  /** Content fingerprint: md5 of case-folded, symbol-stripped,
    * whitespace-collapsed text — the key for fuzzy-exact dedup of documents
    * differing only in formatting.
    */
  def fingerprint(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol),
      md5(trim(regexp_replace(lower(col(textCol)), "[^a-z0-9]+", " "))).as("fingerprint"))

  /** Vocabulary induction — the tokenizer-prep step of a training
    * pipeline: corpus word frequencies, `minCount` floor, ids assigned
    * by frequency rank (ties alphabetic, so the table is a pure function
    * of the corpus — re-runs and engines agree bit-for-bit).
    *
    * Scale shape: one shuffle builds the frequency table (map-side
    * combined — Zipf head terms collapse per partition first); the
    * rank-and-truncate runs on the POST-`minCount` vocabulary, which is
    * bounded by `maxSize` after the cut — orders of magnitude smaller
    * than the corpus, so the single-partition ranking window is a
    * bounded cost by construction (the same bounded-small-frame argument
    * as the CC endgame), not a corpus-scale sort.
    */
  def buildVocab(
      docs: DataFrame,
      minCount: Long = 2L,
      maxSize: Int = 1 << 16,
      textCol: String = "text"): DataFrame = {
    val cf = docs
      .select(explode(words(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("term").agg(count(lit(1)).as("cf"))
      .filter(col("cf") >= minCount)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(desc("cf"), asc("term"))
    cf.withColumn("token_id", (row_number().over(w) - 1).cast("long"))
      .filter(col("token_id") < maxSize)
  }

  /** Unigram language-model scoring — the perplexity-filter stage of
    * corpus curation (CCNet-style: score each document under a language
    * model and gate on perplexity; the unigram model is the cheap
    * in-corpus variant — no external model artifact, and the operator
    * shape is identical when the probabilities come from a trained LM
    * table instead).
    *
    * Per document: `avg_logprob` = Σ tf·ln p(w) / Σ tf with Laplace
    * smoothing p(w) = (cf(w)+α)/(N+α·V) over the corpus' own counts,
    * and `perplexity` = exp(−avg_logprob). High perplexity = the doc's
    * words are rare for the corpus (gibberish/noise candidates); lowest
    * perplexity = stopword soup.
    *
    * Scale shape (the [[termWeights]] skeleton): the (doc, term, tf)
    * table is built once (one shuffle, map-side combined — a stop-word's
    * occurrences collapse to one row per doc BEFORE the term-keyed
    * stages, so Zipf skew never concentrates raw occurrences); corpus
    * frequencies are one more bounded shuffle on term; the (N, V)
    * singleton joins as a broadcast cross join; the final rollup shuffles
    * the compact tf table on doc. Documents with zero tokens produce no
    * row (no tokens = nothing to score).
    *
    * Rounding: 6 dp on both engines (the bm25 rule — absorbs libm `ln`
    * / summation-order ulps); perplexity is exp of the ROUNDED average
    * so both engines exponentiate the identical double.
    */
  def unigramLogProb(
      docs: DataFrame,
      alpha: Double = 1.0,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = docs
      .select(col(idCol), explode(words(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
    // DISK_ONLY for the token-stream-sized tf table — see termWeights
    val tf = toks.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
      .localCheckpoint(true, org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val cf = tf.groupBy("term").agg(sum("tf").as("cf"))
    val corpus = cf.agg(sum("cf").as("nct"), count(lit(1)).as("v"))
    val logp = log((col("cf") + lit(alpha)) /
      (col("nct") + lit(alpha) * col("v")))
    val avg = sum(col("tf") * logp) / sum(col("tf"))
    tf.join(cf, Seq("term"))
      .crossJoin(broadcast(corpus))
      .groupBy(col(idCol))
      .agg(sum(col("tf")).as("n_tokens"), round(avg, 6).as("avg_logprob"))
      .select(col(idCol), col("n_tokens"), col("avg_logprob"),
        round(exp(-col("avg_logprob")), 6).as("perplexity"))
  }

  /** Bigram language model: adjacent-pair counts and Laplace-smoothed
    * conditional log-probability ln P(w2|w1) = ln (c(w1,w2)+α) /
    * (c(w1)+α·V) — the next step up from [[unigramLogProb]] on the same
    * CCNet-style filtering path, and the count table a KenLM-style
    * n-gram LM is built from.
    *
    * Scale shape: pair extraction is a map-only `transform` over the
    * token array (no shuffle until the count aggregate); the context
    * totals c(w1) come from the ALREADY-AGGREGATED pair table, never a
    * second corpus pass; the corpus vocabulary size is a one-row
    * broadcast. `minCount` prunes the Zipf tail (the overwhelming
    * majority of distinct bigrams are hapax) — at 100 TB that cut is
    * what keeps the emitted table bounded; the probabilities are
    * computed from the UNPRUNED totals, so pruning changes which rows
    * ship, never their values.
    */
  def bigramLm(
      docs: DataFrame,
      alpha: Double = 1.0,
      minCount: Long = 1L,
      textCol: String = "text"): DataFrame = {
    val ws = words(col(textCol))
    val pairs = docs
      .select(ws.as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(ws) - 2), i -> struct(ws[i] AS w1, ws[i + 1] AS w2))"))
        .as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .filter(length(col("w1")) > 0 && length(col("w2")) > 0)
    val c12 = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val c1 = c12.groupBy("w1").agg(sum("c12").as("c1"))
    val vocab = docs
      .select(explode(ws).as("t")).filter(length(col("t")) > 0)
      .agg(countDistinct(col("t")).as("v"))
    c12.join(c1, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .filter(col("c12") >= minCount)
      .select(col("w1"), col("w2"), col("c12"), col("c1"),
        round(log((col("c12") + lit(alpha)) / (col("c1") + lit(alpha) * col("v"))), 6)
          .as("logp"))
  }

  /** Document-level term co-occurrence with pointwise mutual information:
    * pmi(a,b) = ln(P(a,b) / (P(a)·P(b))) over document presence — the
    * classic phrase/collocation miner (word2vec-era association scoring).
    *
    * Scale shape: presence is a distinct (doc, term) projection (one
    * shuffle); terms with document frequency above `maxDfFraction`·N are
    * dropped BEFORE pairing — they are the stopword-like hubs whose
    * per-doc pair fan-out would otherwise dominate (a term in every doc
    * pairs with everything). The pair join is an equi-join on doc_id, so
    * candidates are Σ_doc k_doc² with k bounded by document length —
    * never corpus². N rides along as a broadcast one-row aggregate, not
    * a driver collect.
    */
  def pmiCooccurrence(
      docs: DataFrame,
      maxDfFraction: Double = 0.9,
      minPairCount: Long = 2L,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val dt = docs
      .select(col(idCol).as("doc_id"), explode(words(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
      .distinct()
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val df = dt.groupBy("term").agg(count(lit(1)).as("df"))
    val keep = df.crossJoin(broadcast(nDocs))
      .filter(col("df") <= col("n_docs") * maxDfFraction)
      .select("term", "df")
    // eager cut: both sides of the pair self-join consume the capped
    // presence table — without it the explode+distinct+df subtree runs
    // twice (the corpus would be tokenized twice at scale). DISK_ONLY:
    // the presence table is corpus-sized and feeds an even heavier
    // self-join — the default in-memory level is the measured
    // AGGREGATE_OUT_OF_MEMORY pattern (see Curation.importanceWeights)
    val dtk = dt.join(keep, "term").localCheckpoint(true,
      org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val left = dtk.select(col("doc_id"), col("term").as("w1"), col("df").as("df1"))
    val right = dtk.select(col("doc_id"), col("term").as("w2"), col("df").as("df2"))
    left.join(right, Seq("doc_id"))
      .filter(col("w1") < col("w2"))
      .groupBy("w1", "w2", "df1", "df2")
      .agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minPairCount)
      .crossJoin(broadcast(nDocs))
      // double math BEFORE the multiplies: long×long silently wraps
      // with ANSI off once df1·df2 crosses 2^63 (two hub terms under a
      // 0.9 cap at multi-billion-doc scale), turning the strongest
      // collocations into log-of-negative nulls; doubles are exact for
      // products under 2^53 and merely lose ulps beyond, which the 6-dp
      // round absorbs
      .select(col("w1"), col("w2"), col("c_ab"), col("df1"), col("df2"),
        round(log((col("c_ab").cast("double") * col("n_docs").cast("double"))
          / (col("df1").cast("double") * col("df2").cast("double"))), 6)
          .as("pmi"))
  }

  /** One greedy left-to-right BPE merge pass over a symbol array:
    * non-overlapping occurrences of adjacent (l, r) become the merged
    * token, leftmost first (so "aaa" under (a,a) → ["aa","a"]). A pure
    * `functions.aggregate` fold — literals bound via `lit`, never
    * spliced into an expr string (symbols come from corpus text and may
    * contain quotes).
    */
  private def mergePair(syms: Column, l: String, r: String): Column = {
    val init = struct(
      array().cast("array<string>").as("acc"), lit("").as("prev"))
    aggregate(syms, init,
      (st, x) =>
        when(st.getField("prev") === lit(l) && x === lit(r),
          struct(concat(st.getField("acc"), array(lit(l + r))).as("acc"),
            lit("").as("prev")))
          .otherwise(struct(
            when(st.getField("prev") === "", st.getField("acc"))
              .otherwise(concat(st.getField("acc"), array(st.getField("prev"))))
              .as("acc"),
            x.as("prev"))),
      st =>
        when(st.getField("prev") === "", st.getField("acc"))
          .otherwise(concat(st.getField("acc"), array(st.getField("prev")))))
  }

  /** Byte-pair-encoding merge induction — the learning step of a BPE
    * tokenizer (Sennrich et al. 2016): repeatedly count adjacent symbol
    * pairs frequency-weighted over the corpus and merge the most
    * frequent, emitting the ordered merge table `(rank, left, right,
    * pair_count, token)` that a tokenizer then replays.
    *
    * Scale shape: the corpus collapses to the DISTINCT-WORD frequency
    * table in one shuffle — the standard BPE-training input — and every
    * round after that runs on that bounded table: one map-side-combined
    * pair-count aggregate, ONE collected row (the argmax; ties broken
    * (count desc, left, right) so induction is deterministic), and a
    * map-only greedy rewrite, with a `localCheckpoint` per round capping
    * lineage exactly like the connected-components loop. Driver state is
    * one row per round. The registered query hash-gates the full merge
    * table against a DuckDB replay of the loop (one materialized CTE
    * block per round — ExtQueries.bpeMergesOracleSql), on top of the
    * closed-form TextAndJsonSpec pin.
    *
    * Local endgame (the `clusters()` idiom): the word-frequency table is
    * VOCAB-bounded, and a production vocab fits one machine even when the
    * corpus is 100 TB — so when the table's total symbol mass is at most
    * `localFinishMaxSyms`, collect it once and run the merge loop on the
    * driver with incrementally-maintained pair counts (only words
    * containing the merged pair are touched per round — the standard
    * tokenizer-trainer shape). Without this, the distributed loop is
    * `numMerges` SEQUENTIAL cluster jobs: fine for dozens of merges,
    * a driver-coordination bottleneck at a real 32 k-merge vocab.
    * Tie-breaks on the local path compare UTF-8 BYTES (`utf8Less`), the
    * exact ordering Spark's string sort uses, so which path runs can
    * never change the merge table (equivalence pinned byte-identical in
    * TextAndJsonSpec; `localFinishMaxSyms = 0` forces the distributed
    * path). The gate re-checks at every checkpoint boundary (every 4
    * merges): symbol mass only shrinks, so a corpus entering just above
    * the cap hops to the driver loop mid-train once it crosses under.
    */
  def bpeMerges(
      docs: DataFrame,
      numMerges: Int,
      minPairCount: Long = 2L,
      textCol: String = "text",
      localFinishMaxSyms: Long = 1L << 22): DataFrame = {
    val spark = docs.sparkSession
    var wordFreq = docs.select(explode(words(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(expr("filter(split(w, ''), s -> s != '')").as("syms"), col("freq"))
      .localCheckpoint()
    // one cheap aggregate decides the path; the symbol mass (not the row
    // count) is what bounds driver memory — vocab rows are tiny, their
    // symbol arrays are the payload
    val symMass = wordFreq
      .agg(coalesce(sum(size(col("syms"))), lit(0L)).cast("long"))
      .head().getLong(0)
    if (symMass <= localFinishMaxSyms) {
      val collected = wordFreq.collect().map(r =>
        (r.getSeq[String](0).toArray, r.getLong(1)))
      return localBpeMerges(spark, collected, numMerges, minPairCount)
    }
    val out = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long, String)]()
    var r = 0
    var go = true
    var sinceCkpt = 0
    while (r < numMerges && go) {
      val best = wordFreq
        .filter(size(col("syms")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(0, size(syms) - 2), i -> struct(syms[i] AS l, syms[i + 1] AS r))"))
          .as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("freq").as("cnt"))
        .orderBy(desc("cnt"), asc("l"), asc("r"))
        .limit(1).collect()
      if (best.isEmpty || best(0).getAs[Long]("cnt") < minPairCount) go = false
      else {
        val l = best(0).getString(0)
        val rr = best(0).getString(1)
        out += ((r + 1, l, rr, best(0).getAs[Long]("cnt"), l + rr))
        // checkpoint every few rounds, not every round: a handful of
        // stacked mergePair layers re-evaluate cheaply under the argmax
        // job, and each skipped checkpoint is one whole job saved
        sinceCkpt += 1
        val rewritten = wordFreq
          .select(mergePair(col("syms"), l, rr).as("syms"), col("freq"))
        if (sinceCkpt >= 4 || r + 1 == numMerges) {
          // the superseded checkpoint's blocks are released by the
          // ContextCleaner once the reference drops — Dataset.unpersist
          // is a no-op on localCheckpoint'd data (it only clears
          // CacheManager entries), so there is nothing to call here;
          // the vocab-bounded frame makes eager cleanup unnecessary
          wordFreq = rewritten.localCheckpoint()
          sinceCkpt = 0
          r += 1
          // Mid-train gate re-check (round-16 verdict task 5): merges
          // only SHRINK the symbol mass (each rewrite replaces two
          // symbols with one in every affected word), so a corpus that
          // entered just above `localFinishMaxSyms` crosses under it as
          // training proceeds — hop to the driver loop for the REMAINING
          // merges instead of paying a full cluster job per merge to the
          // end. One tiny aggregate per checkpoint (every 4 rounds) over
          // the vocab-bounded frame buys the crossover; ranks continue
          // where the distributed loop stopped, and both paths share the
          // byte-order tie-break, so the merge table is identical either
          // way (pinned in TextAndJsonSpec).
          if (r < numMerges && localFinishMaxSyms > 0) {
            val mass = wordFreq
              .agg(coalesce(sum(size(col("syms"))), lit(0L)).cast("long"))
              .head().getLong(0)
            if (mass <= localFinishMaxSyms) {
              val collected = wordFreq.collect().map(row =>
                (row.getSeq[String](0).toArray, row.getLong(1)))
              import spark.implicits._
              return out.toSeq
                .toDF("rank", "left", "right", "pair_count", "token")
                .unionByName(localBpeMerges(
                  spark, collected, numMerges - r, minPairCount,
                  rankOffset = r))
            }
          }
        } else {
          wordFreq = rewritten
          r += 1
        }
      }
    }
    import spark.implicits._
    out.toSeq.toDF("rank", "left", "right", "pair_count", "token")
  }

  /** UTF-8 byte-wise `<` — the ordering Spark's string comparisons use
    * (UTF8String compares bytes unsigned). `java.lang.String.compareTo`
    * orders by UTF-16 code UNIT, which disagrees for supplementary
    * characters (surrogates 0xD800+ sort below BMP chars 0xE000+), so
    * the local argmax tie-break must compare bytes or the two bpeMerges
    * paths could diverge on emoji-bearing vocab.
    */
  private def utf8Less(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  /** Local replica of [[mergePair]]'s greedy leftmost non-overlapping
    * rewrite — same fold, same `""`-sentinel semantics ("aaa" under
    * (a,a) → ["aa","a"]), so the two bpeMerges paths rewrite
    * identically. Symbols are never empty (training filters them), so
    * the sentinel cannot collide with data.
    */
  private def hasAdjacentPair(s: Array[String], l: String, r: String): Boolean = {
    var i = 0
    while (i < s.length - 1) {
      if (s(i) == l && s(i + 1) == r) return true
      i += 1
    }
    false
  }

  private def mergePairLocal(syms: Array[String], l: String, r: String): Array[String] = {
    val acc = new scala.collection.mutable.ArrayBuffer[String](syms.length)
    var prev = ""
    var i = 0
    while (i < syms.length) {
      val x = syms(i)
      if (prev == l && x == r) { acc += (l + r); prev = "" }
      else { if (prev != "") acc += prev; prev = x }
      i += 1
    }
    if (prev != "") acc += prev
    acc.toArray
  }

  /** Driver-side merge loop over the collected word-frequency table —
    * [[bpeMerges]]'s local endgame. Pair counts are maintained
    * INCREMENTALLY: an inverted index pair → candidate word ids limits
    * each round's rewrite to words that (may) contain the winning pair;
    * stale candidates (the word was rewritten since it was indexed) are
    * skipped by a containment re-check. Each round is O(affected words'
    * symbols + distinct pairs), the tokenizer-trainer cost shape —
    * 32 k merges never rescan the vocab 32 k times. The argmax is a full
    * scan of the pair-count map under the total order
    * (count desc, left utf8 asc, right utf8 asc), so map iteration
    * order can never leak into the output.
    */
  private def localBpeMerges(
      spark: org.apache.spark.sql.SparkSession,
      vocab: Array[(Array[String], Long)],
      numMerges: Int,
      minPairCount: Long,
      rankOffset: Int = 0): DataFrame = {
    import scala.collection.mutable
    val words: Array[Array[String]] = vocab.map(_._1)
    val freqs: Array[Long] = vocab.map(_._2)
    val counts = mutable.HashMap.empty[(String, String), Long]
    val index = mutable.HashMap.empty[(String, String), mutable.HashSet[Int]]
    def addWord(w: Int, sign: Long): Unit = {
      val s = words(w)
      var i = 0
      while (i < s.length - 1) {
        val p = (s(i), s(i + 1))
        val c = counts.getOrElse(p, 0L) + sign * freqs(w)
        if (c == 0L) counts.remove(p) else counts.update(p, c)
        if (sign > 0) index.getOrElseUpdate(p, mutable.HashSet.empty) += w
        i += 1
      }
    }
    var w = 0
    while (w < words.length) { addWord(w, 1L); w += 1 }
    val out = mutable.ArrayBuffer[(Int, String, String, Long, String)]()
    var rank = 0
    var go = true
    while (rank < numMerges && go) {
      var best: (String, String) = null
      var bestCnt = 0L
      counts.foreach { case (p, c) =>
        if (best == null || c > bestCnt ||
          (c == bestCnt && (utf8Less(p._1, best._1) ||
            (p._1 == best._1 && utf8Less(p._2, best._2))))) {
          best = p; bestCnt = c
        }
      }
      if (best == null || bestCnt < minPairCount) go = false
      else {
        val (l, r) = best
        out += ((rankOffset + rank + 1, l, r, bestCnt, l + r))
        val affected = index.remove(best).getOrElse(mutable.HashSet.empty)
        affected.foreach { wi =>
          if (hasAdjacentPair(words(wi), l, r)) {
            addWord(wi, -1L)
            words(wi) = mergePairLocal(words(wi), l, r)
            addWord(wi, 1L)
          }
        }
        rank += 1
      }
    }
    import spark.implicits._
    out.toSeq.toDF("rank", "left", "right", "pair_count", "token")
  }

  /** BPE tokenization — the APPLY step replaying a learned merge table
    * ([[bpeMerges]] output or any compatible `(rank, left, right)`
    * frame) over the corpus: each merge in rank order is one map-only
    * greedy [[mergePair]] rewrite, so encoding is a zero-shuffle chain
    * of `numMerges` transforms — no per-row loop, no UDF — up to
    * `maxChainMerges`; beyond that (a production-size vocab) the same
    * rank-order replay runs as JVM loops in `mapPartitions` over the
    * distinct-word frame, because a 32 k-layer Column chain is a
    * 32 k-node plan whose analyzer bill grows with the vocab. The
    * merge table is collected to the driver (bounded: one row per
    * learned merge, the same artifact a tokenizer ships) and bound into
    * the plan as literals (chain tier) or a broadcast (fast tier).
    *
    * Output: `(id, tokens, n_tokens)` where `tokens` is the word-major
    * token sequence (whitespace word boundaries are hard boundaries, as
    * in [[bpeMerges]] training).
    */
  def bpeEncode(
      docs: DataFrame,
      merges: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      maxChainMerges: Int = 64): DataFrame = {
    // getAs[Number]: a merge table round-tripped through parquet/DuckDB
    // may carry rank as BIGINT — the docstring invites "any compatible
    // (rank, left, right) frame", so don't hard-cast to Int
    val ordered = merges.select("rank", "left", "right")
      .collect().sortBy(_.getAs[Number]("rank").longValue)
      .map(r => (r.getString(1), r.getString(2)))
    // Dictionary encoding: the merge chain (higher-order functions are
    // interpreted, not codegen'd — ~linear in merges × symbols) runs
    // ONCE per DISTINCT word, not once per occurrence; documents then
    // look their words up. On a natural-language corpus occurrences
    // outnumber the vocabulary by orders of magnitude, and at 100 TB
    // the vocab side is the only part the merge chain ever touches.
    // textCol resolved via col(), never spliced into an expr string —
    // a non-identifier column name ("doc text") must work here like in
    // every sibling operator
    val occurrences = docs.select(col(idCol),
      posexplode(filter(split(col(textCol), " "), w => length(w) > 0))
        .as(Seq("pos", "w")))
    val vocabSyms = occurrences.select("w").distinct()
      .withColumn("syms", expr("filter(split(w, ''), s -> s != '')"))
    // Two replay tiers, same semantics. At or under `maxChainMerges` the
    // replay is one Column layer per merge (zero-UDF, the shape every
    // catalog query uses). ABOVE it — a production 32 k-merge vocab —
    // that chain is a 32 k-node plan: analyzer/optimizer cost grows with
    // the VOCAB SIZE, not the data, and each layer is an interpreted
    // higher-order pass. The fast tier replays the SAME rank-order
    // greedy passes as plain JVM loops inside mapPartitions over the
    // distinct-word frame (mergePairLocal is the byte-pinned local
    // replica of mergePair; symbols come from the very same split
    // expression, so splitting semantics cannot diverge), with a
    // has-pair pre-scan so merges absent from a word cost O(|word|)
    // and nothing allocates. Equivalence is spec-pinned on a
    // 100-merge table.
    val encoded =
      if (ordered.length <= maxChainMerges)
        ordered.foldLeft(vocabSyms) { case (df, (l, r)) =>
          df.withColumn("syms", mergePair(col("syms"), l, r))
        }.withColumnRenamed("syms", "toks")
      else {
        val spark = docs.sparkSession
        import spark.implicits._
        val bc = spark.sparkContext.broadcast(ordered)
        vocabSyms.select(col("w"), col("syms")).as[(String, Seq[String])]
          .mapPartitions { it =>
            val table = bc.value
            it.map { case (word, s0) =>
              var s = s0.toArray
              var k = 0
              while (k < table.length) {
                val (l, r) = table(k)
                if (hasAdjacentPair(s, l, r)) s = mergePairLocal(s, l, r)
                k += 1
              }
              (word, s.toSeq)
            }
          }.toDF("w", "toks")
      }
    val assembled = occurrences.join(encoded, Seq("w"))
      .groupBy(col(idCol))
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("pos"), col("toks")))),
        x => x.getField("toks"))).as("tokens"))
    // left join back so wordless documents keep an empty token list
    docs.select(col(idCol)).join(assembled, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("tokens"), array().cast("array<string>")).as("tokens"))
      .withColumn("n_tokens", size(col("tokens")).cast("long"))
  }

  /** Inverted index: term → document frequency + sorted posting list
    * (the retrieval-side complement of [[termWeights]]'s scoring).
    * Postings are emitted as a comma-joined string so the row is a
    * stable scalar for downstream storage and comparison.
    *
    * Scale shape: ONE shuffle — `collect_set` deduplicates map-side, so
    * what crosses the wire per term is its distinct-doc set, not its
    * occurrence stream. The honest 100 TB caveat is the Zipf head: a
    * stopword's posting list is O(corpus) and no cap inside a single
    * aggregation can prune it early — production either drops known
    * stopwords / df > threshold terms FIRST (a cheap pre-count
    * semi-join, the standard IR move) or shards postings by doc-id
    * range. `maxPostings` truncates the emitted list as a last-resort
    * output bound; `df` always reports the true count.
    */
  def invertedIndex(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      maxPostings: Int = Int.MaxValue): DataFrame =
    docs
      .select(col(idCol), explode(words(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("term")
      .agg(sort_array(collect_set(col(idCol))).as("plist"))
      .select(col("term"),
        size(col("plist")).cast("long").as("df"),
        array_join(
          expr(s"transform(slice(plist, 1, $maxPostings), x -> cast(x AS string))"),
          ",").as("postings"))
}
