package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryPack, Tables}

/** Text-analysis operators for the training-data pipeline mandate:
  * language-ID (stopword n-gram heuristic), quality scoring, token
  * counting (whitespace + BPE-ish regex), and document fingerprinting
  * (rolling hash). All single-scan, shuffle-free per-row expressions —
  * the ideal 100 TB shape — with oracle checks on the documents table.
  *
  * Scores stay in rational arithmetic (int ratios) so cross-engine
  * doubles match exactly; the fingerprint uses MD5 nibbles + a modular
  * left-fold, portable to any engine with md5().
  */
object TextAnalysisQueries extends QueryPack {

  private val stopwords = Map(
    "en" -> Seq("the", "and", "of", "to", "in"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "es" -> Seq("el", "la", "de", "que", "los"),
    "fr" -> Seq("le", "la", "et", "les", "des"))

  private def words: Column = split(col("text"), " ")

  private def hitCount(lang: String): Column =
    size(filter(words, w => stopwords(lang).map(sw => w === sw).reduce(_ || _)))
      .cast("long")

  /** Stopword-hit language ID with a deterministic priority tiebreak.
    * (The synthetic corpus is English-like words regardless of its lang
    * column, so this checks the operator, not corpus truth.)
    */
  private def textLangid(s: SparkSession, dir: String): DataFrame = {
    val scored = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang").as("labeled_lang"),
        hitCount("en").as("n_en"), hitCount("de").as("n_de"),
        hitCount("es").as("n_es"), hitCount("fr").as("n_fr"))
    scored
      .withColumn("best", greatest(col("n_en"), col("n_de"), col("n_es"), col("n_fr")))
      .withColumn("pred_lang",
        when(col("best") === 0, "unknown")
          .when(col("n_en") === col("best"), "en")
          .when(col("n_de") === col("best"), "de")
          .when(col("n_es") === col("best"), "es")
          .otherwise("fr"))
      .select(col("doc_id"), col("labeled_lang"), col("pred_lang"),
        col("n_en"), col("n_de"), col("n_es"), col("n_fr"))
      .orderBy(col("doc_id"))
  }

  /** Length / punctuation / stopword-ratio quality heuristics; the
    * composite score is a pure rational expression (no transcendentals)
    * so it is bit-identical across engines.
    */
  private def textQuality(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text"), col("n_chars"))
      .withColumn("n_tokens", size(filter(words, w => w =!= "")).cast("long"))
      .withColumn("n_stop", hitCount("en"))
      .withColumn("n_punct",
        (length(col("text")) - length(regexp_replace(col("text"), "[^a-z0-9 ]", ""))).cast("long"))
      .withColumn("avg_word_len",
        (length(regexp_replace(col("text"), " ", "")).cast("double") / col("n_tokens")))
      .withColumn("stop_ratio", col("n_stop").cast("double") / col("n_tokens"))
      .withColumn("quality_score",
        least(col("n_tokens").cast("double") / 20.0, lit(1.0)) * (lit(1.0) - col("stop_ratio") / 2.0))
      .select(col("doc_id"), col("n_tokens"), col("n_stop"), col("n_punct"),
        round(col("avg_word_len"), 4).as("avg_word_len"),
        round(col("stop_ratio"), 4).as("stop_ratio"),
        round(col("quality_score"), 4).as("quality_score"))
      .orderBy(col("doc_id"))

  /** Whitespace tokens vs a BPE-ish regex segmentation (letter runs,
    * digit runs, single other chars) — the usual pre-tokenizer split.
    */
  private def textTokens(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        size(filter(words, w => w =!= "")).cast("long").as("ws_tokens"),
        regexp_count(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]")).cast("long").as("bpe_tokens"),
        round(length(col("text")).cast("double") / lit(4.0), 2).as("est_llm_tokens"))
      .orderBy(col("doc_id"))

  /** Order-sensitive rolling fingerprint: fold words through
    * h = (h * 31 + wh) mod 1e9+7, where wh is the word's first 4 MD5
    * nibbles — distinguishes docs with equal word sets but different
    * order (which set-based Jaccard cannot).
    */
  private def textFingerprint(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        aggregate(
          filter(words, w => w =!= ""),
          lit(0L),
          (acc, w) => (acc * 31L + conv(substring(md5(w.cast("binary")), 1, 4), 16, 10).cast("long")) % 1000000007L)
          .as("fingerprint"),
        md5(col("text").cast("binary")).as("text_md5"))
      .orderBy(col("doc_id"))

  /** Collocation mining: adjacent-bigram PMI over the English slice —
    * the statistic a tokenizer-training / phrase-detection pipeline
    * computes corpus-wide. Bigrams come straight off each doc's token
    * array (a per-row `transform` over index positions — no positional
    * explode + self-join, which would shuffle every token twice); only
    * (w1, w2) pairs enter the count aggregates. PMI inputs are all exact
    * integer counts; the single ln() runs on identical doubles in both
    * engines.
    */
  def textBigramPmi(s: SparkSession, dir: String): DataFrame =
    bigramPmiCore(Tables.documents(s, dir))

  /** The PMI core over any documents-shaped input, so ScaleBench can run
    * the identical plan on the replicated 10×/30× corpus.
    */
  def bigramPmiCore(documents: DataFrame): DataFrame = {
    val docs = documents
      .filter(col("lang") === "en")
      .select(words.as("w"))
    val toks = docs
      .select(explode_outer(col("w")).as("word"))
      .filter(col("word") =!= "")
    val uni = toks.groupBy(col("word")).agg(count(lit(1)).as("c"))
    // r15 (guide §1.1/§2.4): both corpus totals DERIVE from the grouped
    // counts — n_tok = Σ c over the unigram table, n_big = Σ c12 over
    // the unfiltered bigram table (exact integers, identical values) —
    // so each branch reuses its aggregate's exchange instead of paying
    // a second full explode over the corpus. Plan: 4 parquet scans → 2
    // (one tokenize pass, one bigram pass; both explodes run ONCE).
    val nTok = uni.agg(sum(col("c")).as("n_tok"))
    val bi = docs
      .filter(size(col("w")) >= 2)
      .select(explode_outer(expr(
        "transform(sequence(1, size(w) - 1), " +
          "i -> struct(element_at(w, i) AS w1, element_at(w, i + 1) AS w2))")).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .filter(col("w1") =!= "" && col("w2") =!= "")
    val c12All = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val nBig = c12All.agg(sum(col("c12")).as("n_big"))
    val c12 = c12All.filter(col("c12") >= 10)
    c12
      // no broadcast hint on the vocabulary joins: uni is the corpus's
      // DISTINCT-TOKEN table, which grows without bound (web-scale text
      // has 10⁸+ tokens) — the support-filtered c12 is the naturally
      // small side, and AQE picks the build side from runtime sizes.
      // Only the two 1-row totals are pinned as broadcasts.
      .join(uni.select(col("word").as("w1"), col("c").as("c1")), "w1")
      .join(uni.select(col("word").as("w2"), col("c").as("c2")), "w2")
      .crossJoin(broadcast(nTok))
      .crossJoin(broadcast(nBig))
      // pmi = ln( (c12/n_big) / ((c1/n_tok)(c2/n_tok)) ), assembled in the
      // exact operand order both engines replay: double·long promotions
      // left-to-right, one division, one ln
      .select(col("w1"), col("w2"), col("c12"),
        round(log((col("c12").cast("double") * col("n_tok") * col("n_tok")) /
          (col("n_big").cast("double") * col("c1") * col("c2"))), 4).as("pmi"))
      .orderBy(desc("pmi"), asc("w1"), asc("w2"))
      .limit(50)
  }

  /** Context-window chunking: split each document into fixed 64-token
    * chunks — the sequence-packing precursor every training pipeline
    * runs. Pure per-row explode (sequence + slice), no shuffle before
    * the presentation sort; row growth is total_tokens/64, proportional
    * to corpus size. `greatest(..., 1)` guards the empty doc (Spark's
    * `sequence(0, -1)` would otherwise infer a NEGATIVE step and emit
    * two chunks).
    */
  private def textChunk(s: SparkSession, dir: String): DataFrame = {
    val budget = 64
    Tables.documents(s, dir)
      .select(col("doc_id"),
        filter(words, w => w =!= "").as("toks"))
      .select(col("doc_id"), col("toks"), size(col("toks")).cast("long").as("n_tokens"),
        explode(expr(s"sequence(0, greatest(CAST(ceil(size(toks) / $budget.0D) AS INT), 1) - 1)"))
          .as("chunk_id"))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        least(lit(budget.toLong), col("n_tokens") - col("chunk_id") * budget)
          .as("chunk_tokens"),
        concat_ws(" ", slice(col("toks"), col("chunk_id") * budget + 1, lit(budget)))
          .as("chunk_text"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  /** Train/eval decontamination: word-5-gram shingle overlap between the
    * corpus and a held-out "benchmark" slice (doc_id ≡ 0 mod 7 within
    * the bounded probe window). The gram equi-join is the blocked plan —
    * never an all-pairs compare — and at real scale the eval set is tiny
    * next to the corpus, so it broadcasts: the decontamination shape at
    * 100 TB. Ratio = shared grams / eval grams, exact rational rounded
    * once.
    */
  /** The contamination core, parameterized over the bounded document
    * slice so ScaleBench's 10× run benchmarks the SAME plan as the
    * oracle key. Expects (doc_id, text); callers bound the input.
    */
  def contaminationCore(documents: DataFrame): DataFrame = {
    val docs = documents
      .select(col("doc_id"), filter(words, w => w =!= "").as("toks"))
      .filter(size(col("toks")) >= 5)
      .select(col("doc_id"),
        explode(expr("transform(sequence(1, size(toks) - 4), " +
          "i -> concat_ws(' ', slice(toks, i, 5)))")).as("gram"))
      .distinct()
    val eval_ = docs.filter(col("doc_id") % 7 === 0)
      .select(col("doc_id").as("eval_id"), col("gram"))
    val corpus = docs.filter(col("doc_id") % 7 =!= 0)
      .select(col("doc_id").as("corpus_id"), col("gram"))
    val evalSizes = broadcast(eval_.groupBy(col("eval_id"))
      .agg(count(lit(1)).as("n_eval_grams")))
    corpus.join(broadcast(eval_), "gram")
      .groupBy(col("corpus_id"), col("eval_id"))
      .agg(count(lit(1)).as("n_shared"))
      .join(evalSizes, "eval_id")
      // threshold on the UNROUNDED ratio (the oracle does the same) so a
      // value rounding up to 0.5 cannot pass on one engine only
      .withColumn("raw", col("n_shared").cast("double") / col("n_eval_grams"))
      .filter(col("raw") >= 0.5)
      .select(col("corpus_id"), col("eval_id"), col("n_shared"),
        round(col("raw"), 4).as("overlap"))
  }

  private def textContamination(s: SparkSession, dir: String): DataFrame =
    contaminationCore(Tables.documents(s, dir).filter(col("doc_id") < 2000))
      .orderBy(col("corpus_id"), col("eval_id"))

  /** Sequence packing: greedy 256-token first-fit bins per source in
    * doc_id order — `graft.pipeline.Packing.packGreedy` over the token
    * counts (see Packing's scaladoc for the exact-vs-chunked trade; the
    * chunked scale path is spec-certified against this form). The DuckDB
    * twin replays the same fold as a recursive CTE stepping one doc per
    * source per iteration — pure integer state, so the oracle is exact.
    */
  private def textPack(s: SparkSession, dir: String): DataFrame = {
    val withTokens = Tables.documents(s, dir)
      .select(col("source"), col("doc_id"),
        size(filter(words, w => w =!= "")).cast("long").as("n_tokens"))
    graft.pipeline.Packing.packGreedy(withTokens, budget = 256L)
      .toDF()
      .orderBy(col("source"), col("doc_id"))
  }

  /** Gopher-style repetition diagnostics per document: distinct-token
    * fraction, top-token fraction, and duplicate-bigram fraction — the
    * quality gates that catch boilerplate and generated spam. Counting
    * goes through explode → (doc, gram) → per-doc aggregates (two
    * co-partitioned doc_id shuffles, linear in tokens) rather than a
    * per-row O(len²) nested array scan: at 100 TB the grouped count is
    * the shape that partial-aggregates map-side. Ratios are divisions
    * of exact per-doc integers rounded once — bit-identical on both
    * engines.
    */
  private def textRepetition(s: SparkSession, dir: String): DataFrame =
    repetitionCore(Tables.documents(s, dir)).orderBy(col("doc_id"))

  def repetitionCore(documents: DataFrame): DataFrame = {
    val docs = documents.select(col("doc_id"), words.as("w"))
    val tokCounts = docs
      .select(col("doc_id"), explode_outer(col("w")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("n"))
    val perDocTok = tokCounts.groupBy(col("doc_id"))
      .agg(sum(col("n")).as("n_tokens"), count(lit(1)).as("n_distinct"),
        max(col("n")).as("top_n"))
    val biCounts = docs
      .filter(size(col("w")) >= 2)
      .select(col("doc_id"), explode_outer(expr(
        "transform(sequence(1, size(w) - 1), " +
          "i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))")).as("bg"))
      .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("n"))
    val perDocBi = biCounts.groupBy(col("doc_id"))
      .agg(sum(col("n")).as("n_bi"), count(lit(1)).as("n_bi_distinct"))
    perDocTok.join(perDocBi, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"), col("top_n"),
        round(col("n_distinct").cast("double") / col("n_tokens"), 4)
          .as("distinct_frac"),
        round(col("top_n").cast("double") / col("n_tokens"), 4).as("top_frac"),
        round(coalesce(
          (col("n_bi") - col("n_bi_distinct")).cast("double") / col("n_bi"),
          lit(0.0)), 4).as("dup_bigram_frac"))
  }

  /** BM25 retrieval scoring (k1 = 1.2, b = 0.75) of the corpus against a
    * fixed 3-term query — the ranking function a data pipeline uses to
    * mine topical subsets. Plan: term postings come from one explode
    * filtered AT THE SCAN to the query terms (the fact shuffle carries
    * only matching (doc, term) rows); document lengths are a second
    * single-scan aggregate; df and the global (N, Σdl) are tiny
    * broadcasts. Per-term weights land in fixed columns via conditional
    * aggregation — the final score is a FIXED-ORDER three-term sum, so
    * no floating addition ever depends on partition order; both engines
    * assemble identical doubles and round once.
    */
  private def textBm25(s: SparkSession, dir: String): DataFrame =
    bm25Core(Tables.documents(s, dir))
      .orderBy(desc("score"), asc("doc_id"))
      .limit(20)

  def bm25Core(documents: DataFrame): DataFrame = {
    val terms = Seq("join", "vector", "scan")
    val k1 = 1.2
    val b = 0.75
    // r15 rework (guide §2.4 — remove shuffles outright): the query has
    // THREE FIXED terms, so per-doc term frequencies are scan-level
    // array expressions (tf_i = occurrences of term_i in the token
    // array), not an explode + (doc, term) aggregate. The old plan paid
    // an explode, a (doc, tok) hash aggregate, a df re-aggregate, a
    // dl-side join and a final per-doc re-aggregate — five wide/stage
    // edges, measured 9 scheduled jobs at sf0.1 for ~0.2 s of task
    // work. Now: one stats pass (N, Σdl, df per term — ONE tiny
    // broadcast row), one scoring pass with zero exchanges before the
    // top-k. At 100 TB both passes stream the corpus once each and
    // nothing token-shaped ever crosses the fabric.
    // Arithmetic is operand-for-operand the old expression (idf, the
    // tf-saturation denominator, the fixed w0+w1+w2 sum), so every
    // double — and the oracle hash — is bit-identical.
    val perDoc = documents.select(col("doc_id"), words.as("w"))
      .select(col("doc_id"),
        size(filter(col("w"), w => w =!= "")).cast("long").as("dl"),
        size(filter(col("w"), w => w === terms(0))).cast("long").as("tf0"),
        size(filter(col("w"), w => w === terms(1))).cast("long").as("tf1"),
        size(filter(col("w"), w => w === terms(2))).cast("long").as("tf2"))
    val consts = perDoc.agg(
      count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"),
      sum(when(col("tf0") > 0, 1L).otherwise(0L)).as("df0"),
      sum(when(col("tf1") > 0, 1L).otherwise(0L)).as("df1"),
      sum(when(col("tf2") > 0, 1L).otherwise(0L)).as("df2"))
    // idf = ln(1 + (N − df + 0.5)/(df + 0.5)); tf-sat denominator uses
    // dl/avgdl = dl·N/Σdl — every operand an exact integer, promoted
    // in the same order both engines replay
    def idf(dfc: Column): Column =
      log(lit(1.0) + (col("n_docs") - dfc + lit(0.5)) / (dfc + lit(0.5)))
    def wgt(tf: Column, dfc: Column): Column =
      idf(dfc) * (tf * (k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) +
          lit(b) * col("dl").cast("double") * col("n_docs") / col("sum_dl")))
    perDoc
      .filter(col("tf0") > 0 || col("tf1") > 0 || col("tf2") > 0)
      .crossJoin(broadcast(consts))
      .select(col("doc_id"),
        ((col("tf0") > 0).cast("long") + (col("tf1") > 0).cast("long") +
          (col("tf2") > 0).cast("long")).as("n_terms_hit"),
        round(
          coalesce(when(col("tf0") > 0, wgt(col("tf0"), col("df0"))), lit(0.0)) +
          coalesce(when(col("tf1") > 0, wgt(col("tf1"), col("df1"))), lit(0.0)) +
          coalesce(when(col("tf2") > 0, wgt(col("tf2"), col("df2"))), lit(0.0)),
          4).as("score"))
  }

  /** Corpus-level BOILERPLATE detection: word-3-grams shared by ≥ 3
    * DISTINCT documents are "boilerplate" — the cross-document
    * repeated-fragment diagnostic of C4/RefinedWeb-style cleaning, the
    * complement of text_repetition's WITHIN-document stats. Per doc:
    * distinct-gram count, boilerplate-gram count, and their ratio.
    *
    * Plan (r8 rework, 4 wide edges → 2): per-doc gram dedup happens IN
    * THE ARRAY (`array_distinct` before the explode — set semantics per
    * doc need no (doc, gram) shuffle at all), then document-frequency is
    * a count window OVER gram on the exploded pairs (one gram exchange;
    * the old agg-then-rejoin planned an extra exchange per side — the
    * transition-matrix window-over-counts probe, reapplied to a
    * high-cardinality key), then one doc_id re-aggregate. Never an
    * all-pairs compare; both remaining shuffles carry (doc, gram) rows
    * linear in text size. The ratio divides exact per-doc integers once
    * — bit-identical on both engines.
    */
  private def textBoilerplate(s: SparkSession, dir: String): DataFrame =
    boilerplateCore(Tables.documents(s, dir)).orderBy(col("doc_id"))

  def boilerplateCore(documents: DataFrame): DataFrame = {
    val grams = documents
      .select(col("doc_id"), filter(words, w => w =!= "").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"),
        explode(array_distinct(expr("transform(sequence(1, size(toks) - 2), " +
          "i -> concat_ws(' ', slice(toks, i, 3)))"))).as("gram"))
    grams
      .withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("gram")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        count(when(col("df") >= 3, 1)).as("n_boiler"))
      .select(col("doc_id"), col("n_grams"), col("n_boiler"),
        round(col("n_boiler").cast("double") / col("n_grams"), 4)
          .as("boiler_frac"))
  }

  /** The SKEW-ROBUST twin of [[boilerplateCore]], for ScaleBench's
    * hot-gram A/B (r16, verdict item 2): df via groupBy(gram) — whose
    * map-side partials collapse a hot gram BEFORE the exchange — then a
    * rejoin that AQE's skew-join splitting can break up at runtime. The
    * count WINDOW of the oracle key puts every row of a hot gram in ONE
    * task, and skew-join handling never applies to windows (guide
    * §2.5). Same rows by construction (count per gram attached to each
    * (doc, gram) row either way); NOT the declared key because the
    * second gram exchange measured 3× worse at sf0.1 (r15 probe) and
    * the fixtures' hottest gram holds ~2% of gram rows — no straggler
    * to pay for. On a corpus where one gram owns half the rows, this is
    * the shape that survives; see the ScaleBench rows.
    */
  def boilerplateRejoinCore(documents: DataFrame): DataFrame = {
    val grams = documents
      .select(col("doc_id"), filter(words, w => w =!= "").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"),
        explode(array_distinct(expr("transform(sequence(1, size(toks) - 2), " +
          "i -> concat_ws(' ', slice(toks, i, 3)))"))).as("gram"))
    val dfs = grams.groupBy(col("gram")).agg(count(lit(1)).as("df"))
    grams.join(dfs, "gram")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        count(when(col("df") >= 3, 1)).as("n_boiler"))
      .select(col("doc_id"), col("n_grams"), col("n_boiler"),
        round(col("n_boiler").cast("double") / col("n_grams"), 4)
          .as("boiler_frac"))
  }

  /** Gopher-style QUALITY-FILTER RULE BATTERY: the boolean gates of a
    * pre-training cleaning pass (Rae et al. 2021's document filters,
    * adapted to this corpus's scale) — token count in [30, 100k], mean
    * word length in [3, 10], ≥ 2 stopword hits, ≥ 80% alphabetic words,
    * symbol-to-token ratio ≤ 10% — and the conjunctive keep decision.
    * text_quality is the CONTINUOUS scoring twin; this is the hard
    * filter a pipeline actually drops rows with.
    *
    * Every rule is an exact INTEGER cross-comparison (3·n ≤ chars ≤
    * 10·n, 10·alpha ≥ 8·n, …) — no float thresholds to drift
    * cross-engine. Pure per-row scan, zero hash exchanges
    * (plan-audited): the only shape a quality pass over 100 TB can
    * afford.
    */
  private def textGopherRules(s: SparkSession, dir: String): DataFrame =
    gopherRulesCore(Tables.documents(s, dir)).orderBy(col("doc_id"))

  def gopherRulesCore(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), col("text"))
      .withColumn("toks", filter(words, w => w =!= ""))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("n_wchars",
        length(regexp_replace(col("text"), " ", "")).cast("long"))
      .withColumn("n_stop", hitCount("en"))
      .withColumn("n_alpha",
        size(filter(col("toks"), w => w.rlike("[a-z]"))).cast("long"))
      .withColumn("n_sym",
        (length(col("text")) -
          length(regexp_replace(col("text"), "[^a-z0-9 ]", ""))).cast("long"))
      .select(col("doc_id"), col("n_tokens"),
        when(col("n_tokens") >= 30 && col("n_tokens") <= 100000, 1L)
          .otherwise(0L).as("r_len"),
        when(col("n_wchars") >= col("n_tokens") * 3 &&
          col("n_wchars") <= col("n_tokens") * 10, 1L)
          .otherwise(0L).as("r_wordlen"),
        when(col("n_stop") >= 2, 1L).otherwise(0L).as("r_stop"),
        when(col("n_alpha") * 10 >= col("n_tokens") * 8, 1L)
          .otherwise(0L).as("r_alpha"),
        when(col("n_sym") * 10 <= col("n_tokens"), 1L)
          .otherwise(0L).as("r_sym"))
      .withColumn("keep",
        col("r_len") * col("r_wordlen") * col("r_stop") * col("r_alpha") *
          col("r_sym"))

  /** Unigram-LM log-probability scoring — the perplexity-proxy quality
    * filter of CCNet-style cleaning (there a KenLM 5-gram; the unigram
    * form is the engine-native first rung): per doc, Σ c_w · ln(n_w/N)
    * over its word types under the CORPUS unigram distribution, plus
    * the per-token average. Low (very negative) average ⇒ the doc is
    * full of rare tokens — gibberish, codes, boilerplate IDs.
    *
    * Float determinism (the interesting part): a grouped SUM of doubles
    * is partition-order-dependent, so the per-doc total is folded over
    * the SORTED (word, term) array instead — collect the doc's type
    * terms, `array_sort` (word is unique per doc → total order), then
    * a left `aggregate` fold from 0.0. DuckDB replays the identical
    * fold with list_sort + list_reduce. Each term is c·ln(n/N) on
    * identical doubles (one ln per type, PMI/BM25 precedent); ties
    * can't reorder; init-0.0 left folds agree bit-for-bit with
    * DuckDB's first-element-init fold because 0.0 + x ≡ x here (terms
    * are products of nonnegative counts with ln ≤ 0).
    *
    * Plan (r9 rework — the tfidf/bigram one-exchange discipline applied
    * here): the token stream explodes ONCE and crosses ONE wide edge —
    * an explicit hash(word) repartition that satisfies BOTH the
    * (doc, word) count's clustering (subset key) and the corpus
    * word-count WINDOW riding on top of it (the old agg-then-rejoin
    * form exploded twice and shuffled four times: word counts, (doc,
    * word) counts, the join's re-exchange, the per-doc re-agg). The
    * corpus total comes from a scan-level token-count sum over
    * documents — no explode, one cheap broadcast row. Token-less docs
    * are absent on both engines (no types to score).
    */
  private def textUnigramLogprob(s: SparkSession, dir: String): DataFrame =
    unigramLogprobCore(Tables.documents(s, dir)).orderBy(col("doc_id"))

  def unigramLogprobCore(documents: DataFrame): DataFrame = {
    val toks = documents
      .select(col("doc_id"),
        explode(filter(words, w => w =!= "")).as("word"))
    // probed r15: deriving the total as Σ c over dwc (reusing the
    // repartition exchange, one tokenization) measured WORSE — 351 →
    // 497 task-ms and one extra job: a full (doc, word) hash
    // re-aggregate costs more than re-splitting the text in a
    // scan-level projection. Kept at the two-branch shape.
    val total = documents
      .agg(sum(size(filter(words, w => w =!= "")).cast("long")).as("t"))
    val dwc = toks
      .repartition(col("word"))
      .groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("c"))
    dwc
      .withColumn("n", sum(col("c")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("word")))
      .crossJoin(broadcast(total))
      .withColumn("term",
        col("c").cast("double") *
          log(col("n").cast("double") / col("t").cast("double")))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"),
        collect_list(struct(col("word"), col("term"))).as("terms"))
      .select(col("doc_id"), col("n_tokens"),
        expr("aggregate(array_sort(terms), CAST(0.0 AS DOUBLE), " +
          "(acc, x) -> acc + x.term)").as("logp"))
      .select(col("doc_id"), col("n_tokens"),
        round(col("logp"), 4).as("sum_logp"),
        round(col("logp") / col("n_tokens"), 4).as("avg_logp"))
  }

  /** The SKEW-ROBUST twin of [[unigramLogprobCore]] (r16, ScaleBench
    * hot-word A/B — see [[boilerplateRejoinCore]] for the rationale):
    * corpus word counts via groupBy (map-side partials collapse hot
    * words) + an AQE-splittable rejoin, instead of the sum window that
    * pins every row of a hot word to one task. Identical rows: n per
    * (doc, word) is the same integer either way, and the per-doc sorted
    * fold is untouched.
    */
  def unigramLogprobRejoinCore(documents: DataFrame): DataFrame = {
    val toks = documents
      .select(col("doc_id"),
        explode(filter(words, w => w =!= "")).as("word"))
    val total = documents
      .agg(sum(size(filter(words, w => w =!= "")).cast("long")).as("t"))
    val dwc = toks
      .groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("c"))
    val wc = dwc.groupBy(col("word")).agg(sum(col("c")).as("n"))
    dwc
      .join(wc, "word")
      .crossJoin(broadcast(total))
      .withColumn("term",
        col("c").cast("double") *
          log(col("n").cast("double") / col("t").cast("double")))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"),
        collect_list(struct(col("word"), col("term"))).as("terms"))
      .select(col("doc_id"), col("n_tokens"),
        expr("aggregate(array_sort(terms), CAST(0.0 AS DOUBLE), " +
          "(acc, x) -> acc + x.term)").as("logp"))
      .select(col("doc_id"), col("n_tokens"),
        round(col("logp"), 4).as("sum_logp"),
        round(col("logp") / col("n_tokens"), 4).as("avg_logp"))
  }

  /** BIGRAM-LM document scoring — the second-order extension of
    * `text_unigram_logprob` (fluency-sensitive quality scoring: a doc of
    * real sentences beats a bag of common words, which the unigram score
    * cannot distinguish): per doc, the summed and per-bigram-averaged
    * log of the add-1-smoothed conditional probability
    * P(w2|w1) = (C(w1,w2) + 1) / (C(w1→) + V), with C(w1→) the corpus
    * count of bigrams starting w1 and V the corpus vocabulary size.
    *
    * Float determinism is the unigram key's sorted-fold contract one
    * order higher: per-doc (w1, w2) pairs are unique after counting, so
    * the fold over the array_sort'ed (w1, w2, term) structs is a total
    * order both engines replay bit-for-bit; each term is c·ln of
    * identical exact-integer ratios (counts < 2^53).
    *
    * Plan: per-doc bigram counts (one hash agg), then BOTH corpus
    * statistics ride ONE w1 exchange — the prefix-count window
    * partitions by w1, and the (w1, w2) bigram-count window's clustering
    * is satisfied by that same hash(w1) partitioning, so Spark plans a
    * sort, not a second exchange (window order matters: pn first). No
    * rejoin, no second corpus pass; the vocab scalar broadcasts.
    */
  private def textBigramLogprob(s: SparkSession, dir: String): DataFrame =
    bigramLogprobCore(Tables.documents(s, dir)).orderBy(col("doc_id"))

  def bigramLogprobCore(documents: DataFrame): DataFrame = {
    val toks = documents
      .select(col("doc_id"), filter(words, w => w =!= "").as("ws"))
    // array_distinct BEFORE the explode (the boilerplate-key trick): the
    // distinct agg sees per-doc TYPES, not the full token volume — same V
    // by definition (distinct of per-doc distincts), ~20% off the key.
    // Probed alternative (r9): deriving V from dbc's w1 ∪ w2 does NOT
    // reuse dbc's exchange (column pruning splits the subtrees → 3 scans,
    // 6 exchanges) and measures slower.
    val vocab = toks.select(explode(array_distinct(col("ws"))).as("w"))
      .agg(countDistinct(col("w")).as("v"))
    val dbc = toks
      .filter(size(col("ws")) >= 2)
      .select(col("doc_id"),
        explode(expr("transform(sequence(1, size(ws) - 1), " +
          "i -> named_struct('w1', element_at(ws, i), 'w2', element_at(ws, i + 1)))"))
          .as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      // explicit hash(w1) BEFORE the count: hashpartitioning(w1)
      // satisfies the (doc, w1, w2) aggregate's ClusteredDistribution
      // (subset key) AND the w1 windows downstream — so the bigram
      // stream crosses ONE wide edge, not two (the ENSURE_REQUIREMENTS
      // plan shuffled it for the count and AGAIN for the window). The
      // trade is the count's map-side partial phase, worth ~nothing
      // here: (doc, w1, w2) is nearly unique per row, partials barely
      // collapse. Honest measurement: flat at sf0.1 AND at 10× (the
      // explode + per-doc collect dominate at these sizes) — this is a
      // shuffle-VOLUME halving that pays where shuffle is the
      // constraint, i.e. real cluster fabric, not a local[32] page
      // cache. Skew note: the w1 windows pinned the hot-prefix
      // exposure already; this adds no new skew surface.
      .repartition(col("w1"))
      .groupBy(col("doc_id"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("c"))
    val wPre = org.apache.spark.sql.expressions.Window.partitionBy("w1")
    val wBg = org.apache.spark.sql.expressions.Window.partitionBy("w1", "w2")
    dbc
      .withColumn("pn", sum(col("c")).over(wPre))
      .withColumn("cnt", sum(col("c")).over(wBg))
      .crossJoin(broadcast(vocab))
      .withColumn("term", col("c").cast("double") *
        log((col("cnt") + 1).cast("double") / (col("pn") + col("v")).cast("double")))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_bigrams"),
        collect_list(struct(col("w1"), col("w2"), col("term"))).as("terms"))
      .select(col("doc_id"), col("n_bigrams"),
        expr("aggregate(array_sort(terms), CAST(0.0 AS DOUBLE), " +
          "(acc, x) -> acc + x.term)").as("logp"))
      .select(col("doc_id"), col("n_bigrams"),
        round(col("logp"), 4).as("sum_logp"),
        round(col("logp") / col("n_bigrams"), 4).as("avg_logp"))
  }

  /** The BOUNDED-MEMORY twin of [[bigramLogprobCore]] (r16, verdict
    * item 3 — guide §5): the per-doc `collect_list` + `array_sort`
    * buffers a whole document's distinct-bigram stream in ONE
    * aggregation buffer, and a TypedImperativeAggregate buffer cannot
    * spill — a pathological document at corpus scale is an OOM, not a
    * slowdown. Here the same left-to-right fold streams instead: rows
    * sort by (doc, w1, w2) inside a window (UnsafeExternalSorter —
    * SPILLABLE), a running-frame sum adds the terms one by one in
    * exactly the array fold's order (running aggregation evaluates
    * incrementally per row; 0.0-init left fold ≡ null-skipping sum here
    * since terms are non-null), and the last row per doc carries the
    * total. Bit-identical outputs: (w1, w2) is unique per doc, struct
    * array_sort orders by (w1, w2) before ever reaching term, and both
    * engines compare strings as binary UTF-8 — same order, same adds.
    */
  def bigramLogprobStreamCore(documents: DataFrame): DataFrame = {
    val toks = documents
      .select(col("doc_id"), filter(words, w => w =!= "").as("ws"))
    val vocab = toks.select(explode(array_distinct(col("ws"))).as("w"))
      .agg(countDistinct(col("w")).as("v"))
    val dbc = toks
      .filter(size(col("ws")) >= 2)
      .select(col("doc_id"),
        explode(expr("transform(sequence(1, size(ws) - 1), " +
          "i -> named_struct('w1', element_at(ws, i), 'w2', element_at(ws, i + 1)))"))
          .as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .repartition(col("w1"))
      .groupBy(col("doc_id"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("c"))
    val wPre = org.apache.spark.sql.expressions.Window.partitionBy("w1")
    val wBg = org.apache.spark.sql.expressions.Window.partitionBy("w1", "w2")
    val byDocOrdered = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("w1"), col("w2"))
    val byDocRun = byDocOrdered
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val byDocAll = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
    dbc
      .withColumn("pn", sum(col("c")).over(wPre))
      .withColumn("cnt", sum(col("c")).over(wBg))
      .crossJoin(broadcast(vocab))
      .withColumn("term", col("c").cast("double") *
        log((col("cnt") + 1).cast("double") / (col("pn") + col("v")).cast("double")))
      .select(col("doc_id"), col("w1"), col("w2"), col("c"), col("term"))
      .withColumn("logp", sum(col("term")).over(byDocRun))
      .withColumn("rn", row_number().over(byDocOrdered))
      .withColumn("n_rows", count(lit(1)).over(byDocAll))
      .withColumn("n_bigrams", sum(col("c")).over(byDocAll))
      .filter(col("rn") === col("n_rows"))
      .select(col("doc_id"), col("n_bigrams"),
        round(col("logp"), 4).as("sum_logp"),
        round(col("logp") / col("n_bigrams"), 4).as("avg_logp"))
  }

  /** BPE tokenizer training's inner step: corpus-wide adjacent
    * character-pair frequencies, top-50. The scale discipline is WHERE
    * the pair explode happens: first collapse the token stream to the
    * VOCAB (word → occurrence count — the domain every real BPE trainer
    * iterates on; ~types, not ~tokens), then enumerate each DISTINCT
    * word's adjacent pairs once, weighted by its count. The per-word
    * char explode — the expensive fan-out — thus runs over thousands of
    * types instead of millions of tokens; at 100 TB the vocab table is
    * megabytes while the token stream is the corpus. Two wide edges
    * (word groupBy, pair groupBy over a tiny domain) + TakeOrdered;
    * counts are integers, ties break on the pair string.
    */
  def bpePairsCore(documents: DataFrame): DataFrame = {
    val vocab = documents
      .select(explode(filter(words, w => w =!= "")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("wcount"))
    vocab
      .filter(length(col("w")) >= 2)
      .select(col("wcount"),
        explode(expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
          .as("pair"))
      .groupBy(col("pair"))
      .agg(sum(col("wcount")).as("pair_count"))
      .orderBy(col("pair_count").desc, col("pair"))
      .limit(50)
  }

  private def textBpePairs(s: SparkSession, dir: String): DataFrame =
    bpePairsCore(Tables.documents(s, dir))

  /** Vocabulary coverage curve — for each vocab budget k, the exact share
    * of all token OCCURRENCES covered by the k most frequent types (the
    * tokenizer-design metric next to `text_bpe_pairs`: how big must the
    * word-level vocab be before the long tail forces subword units).
    *
    * The scale trick: a global top-k over the vocab needs a total-order
    * rank, but token coverage does NOT need per-word ranks — types with
    * the SAME count contribute the same tokens whichever of them the
    * top-k cut keeps, so the curve is exact from COUNT-OF-COUNTS alone:
    * collapse vocab → (count, n_types) classes (a table bounded by
    * distinct count VALUES, ≲√(2·tokens) — the histogram-family bound,
    * never corpus- or vocab-sized), cumulate over classes descending,
    * and split the one boundary class arithmetically:
    * covered(k) = tokens_before + min(nt, k − types_before)·c.
    * Two token-stream exchanges (word counts; tiny count-of-counts);
    * the budget probe is a broadcast theta-join on the class table. All
    * integer; the coverage ratio is one double division, rounded.
    */
  private def textVocabCoverage(s: SparkSession, dir: String): DataFrame =
    vocabCoverageCore(Tables.documents(s, dir),
      s.range(1).select(explode(array(
        lit(10L), lit(100L), lit(1000L), lit(10000L))).as("k")))

  def vocabCoverageCore(documents: DataFrame, ks: DataFrame): DataFrame = {
    val wc = documents
      .select(explode(filter(words, w => w =!= "")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val cc = wc.groupBy(col("c")).agg(count(lit(1)).as("nt"))
      .withColumn("tokc", col("c") * col("nt"))
    // ordered window over the count-of-counts table: single partition by
    // construction, bounded by distinct count values (histogram posture)
    val byCountDesc = org.apache.spark.sql.expressions.Window
      .orderBy(col("c").desc)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
    val cum = cc
      .withColumn("types_before", sum(col("nt")).over(byCountDesc) - col("nt"))
      .withColumn("tokens_before", sum(col("tokc")).over(byCountDesc) - col("tokc"))
      .withColumn("total_tokens", sum(col("tokc")).over(wAll))
    ks.join(broadcast(cum), col("types_before") < col("k"))
      .groupBy(col("k"))
      .agg(
        max(col("tokens_before") +
          least(col("nt"), col("k") - col("types_before")) * col("c"))
          .as("covered_tokens"),
        max(col("total_tokens")).as("tt"))
      .select(col("k"), col("covered_tokens"),
        round(col("covered_tokens").cast("double") / col("tt").cast("double"), 6)
          .as("coverage"))
      .orderBy(col("k"))
  }

  /** Unicode-honest tokenization certified CROSS-ENGINE (r10 verdict
    * what's-missing #5 — unicodeTokens was spec-only; the whitespace
    * contract of every other text key is documented in §2.9 and stays):
    * the Spark side runs the REAL [[graft.pipeline.Tokenize.unicodeTokens]]
    * (Java codepoint-class regex: CJK unigrams via script classes,
    * word runs via a class INTERSECTION `[\p{L}\p{N}]&&[^CJK]`), while
    * the DuckDB oracle restates the word class in RE2's portable
    * subset by ENUMERATING the slice's non-CJK scripts
    * (`[\p{Latin}\p{Cyrillic}\p{N}]+` — RE2 has no class intersection).
    * On this slice the two formulations are provably the same function,
    * so the hash certifies token-level agreement: case folding of
    * Latin/Cyrillic, accents kept, Han/Hiragana/Katakana/Hangul
    * unigrams, digit runs, apostrophe/punct separation, and the
    * script-BOUNDARY run `abc世界def` → [abc, 世, 界, def] that a
    * greedy un-intersected word class would swallow whole.
    *
    * Both engines read THE SAME parquet file (the roundtrip-key
    * construction: synthetic SF-independent slice, content-addressed
    * path mirrored in the static SQL, RoundtripPathSpec-pinned) — so
    * the key ALSO certifies unicode string round-tripping through
    * parquet cross-engine.
    */
  private[graft] val UnicodeTokensSpec =
    "graft unicode token slice v1: 360 docs x 3 phrases; scripts " +
      "latin(+accents),cyrillic,han,hiragana,katakana,hangul,digits," +
      "punct; script-boundary runs; parquet"
  private[graft] def unicodeSlicePath: String =
    CoreQueries.contentAddressedPath("graft_unicode_tokens", UnicodeTokensSpec)

  private def unicodeSlice(s: SparkSession): DataFrame = {
    val phrases = array(
      lit("Hello, WORLD!"),
      lit("café crème brûlée"),
      lit("Привет МИР слово"),
      lit("这是一个测试"),
      lit("テスト です"),
      lit("한국어 텍스트"),
      lit("abc世界def"),
      lit("don't stop 42 x99"),
      lit("--- !!! ..."))
    // 4 and 7 are coprime with 9, so each slot independently cycles
    // through all nine phrases — 360 deterministic 3-phrase docs
    s.range(0, 360).select(
      col("id").as("doc_id"),
      concat_ws(" ",
        element_at(phrases, (pmod(col("id"), lit(9)) + 1).cast("int")),
        element_at(phrases, (pmod(col("id") * 4, lit(9)) + 1).cast("int")),
        element_at(phrases, (pmod(col("id") * 7, lit(9)) + 1).cast("int")))
        .as("text"))
      .coalesce(1)
  }

  private def textUnicodeTokens(s: SparkSession, dir: String): DataFrame = {
    CoreQueries.ensureWritten(s, unicodeSlicePath) {
      unicodeSlice(s).write
        .mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(unicodeSlicePath)
    }
    s.read.parquet(unicodeSlicePath)
      .select(col("doc_id"),
        explode(graft.pipeline.Tokenize.unicodeTokens(col("text"))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"), countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("token"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_unicode_tokens" -> (textUnicodeTokens _),
    "text_vocab_coverage" -> (textVocabCoverage _),
    "text_bpe_pairs"      -> (textBpePairs _),
    "text_bigram_logprob" -> (textBigramLogprob _),
    "text_unigram_logprob" -> (textUnigramLogprob _),
    "text_boilerplate"   -> (textBoilerplate _),
    "text_gopher_rules"  -> (textGopherRules _),
    "text_repetition"    -> (textRepetition _),
    "text_bm25"          -> (textBm25 _),
    "text_pack"          -> (textPack _),
    "text_langid"        -> (textLangid _),
    "text_quality"       -> (textQuality _),
    "text_tokens"        -> (textTokens _),
    "text_fingerprint"   -> (textFingerprint _),
    "text_bigram_pmi"    -> (textBigramPmi _),
    "text_chunk"         -> (textChunk _),
    "text_contamination" -> (textContamination _))

  private def duckHits(langList: String): String =
    s"len(list_filter(string_split(text, ' '), w -> list_contains([$langList], w)))"

  private val hitsEn = duckHits("'the','and','of','to','in'")
  private val hitsDe = duckHits("'der','die','und','das','ist'")
  private val hitsEs = duckHits("'el','la','de','que','los'")
  private val hitsFr = duckHits("'le','la','et','les','des'")

  val oracle: Map[String, String] = Map(
    // the RE2 restatement of unicodeTokens on this slice's scripts:
    // CJK classes first (alternation is leftmost-FIRST in both
    // engines, so a CJK codepoint tokenizes alone), word class
    // enumerated (RE2 has no &&-intersection) — reads the parquet the
    // Spark side just wrote
    "text_unicode_tokens" ->
      """SELECT token, count(*) AS n, count(DISTINCT doc_id) AS n_docs
        |FROM (
        |  SELECT doc_id, unnest(regexp_extract_all(lower(text),
        |    '[\p{Han}\p{Hiragana}\p{Katakana}\p{Hangul}]|[\p{Latin}\p{Cyrillic}\p{N}]+'))
        |    AS token
        |  FROM read_parquet('/tmp/graft_unicode_tokens_5a40fca8/*.parquet')
        |)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // count-of-counts restated: same class cumulation, same boundary
    // split; HUGEINT window sums cast back to BIGINT before the arithmetic
    "text_vocab_coverage" ->
      """WITH tok AS (
        |  SELECT w FROM (
        |    SELECT unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS w
        |    FROM documents) t),
        |wc AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
        |cc AS (SELECT c, CAST(count(*) AS BIGINT) AS nt,
        |         CAST(c * count(*) AS BIGINT) AS tokc
        |       FROM wc GROUP BY c),
        |cum AS (
        |  SELECT c, nt, tokc,
        |    CAST(sum(nt) OVER (ORDER BY c DESC) - nt AS BIGINT) AS types_before,
        |    CAST(sum(tokc) OVER (ORDER BY c DESC) - tokc AS BIGINT) AS tokens_before,
        |    CAST(sum(tokc) OVER () AS BIGINT) AS total_tokens
        |  FROM cc),
        |ks AS (SELECT CAST(k AS BIGINT) AS k
        |       FROM (VALUES (10), (100), (1000), (10000)) AS t(k))
        |SELECT k,
        |  max(tokens_before + least(nt, k - types_before) * c) AS covered_tokens,
        |  round(CAST(max(tokens_before + least(nt, k - types_before) * c) AS DOUBLE)
        |    / CAST(max(total_tokens) AS DOUBLE), 6) AS coverage
        |FROM ks JOIN cum ON types_before < k
        |GROUP BY k
        |ORDER BY k""".stripMargin,
    "text_bpe_pairs" ->
      """WITH vocab AS (
        |  SELECT w, count(*) AS wcount FROM (
        |    SELECT unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS w
        |    FROM documents)
        |  GROUP BY w),
        |pairs AS (
        |  SELECT substring(w, CAST(i AS INTEGER), 2) AS pair, wcount
        |  FROM (SELECT w, wcount, unnest(range(1, length(w))) AS i
        |        FROM vocab WHERE length(w) >= 2))
        |SELECT pair, CAST(sum(wcount) AS BIGINT) AS pair_count
        |FROM pairs GROUP BY pair
        |ORDER BY pair_count DESC, pair LIMIT 50""".stripMargin,
    "text_bigram_logprob" ->
      """WITH t AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS ws
        |  FROM documents),
        |v AS (
        |  SELECT count(DISTINCT w) AS v
        |  FROM (SELECT unnest(ws) AS w FROM t)),
        |big AS (
        |  SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
        |  FROM (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i
        |        FROM t WHERE len(ws) >= 2) x),
        |dbc AS (SELECT doc_id, w1, w2, CAST(count(*) AS BIGINT) AS c
        |        FROM big GROUP BY doc_id, w1, w2),
        |bc AS (SELECT w1, w2, CAST(sum(c) AS BIGINT) AS cnt FROM dbc GROUP BY w1, w2),
        |pc AS (SELECT w1, CAST(sum(c) AS BIGINT) AS pn FROM dbc GROUP BY w1),
        |terms AS (
        |  SELECT d.doc_id, d.c,
        |    struct_pack(w1 := d.w1, w2 := d.w2,
        |      term := CAST(d.c AS DOUBLE) *
        |        ln(CAST(cnt + 1 AS DOUBLE) / CAST(pn + v.v AS DOUBLE))) AS wt
        |  FROM dbc d JOIN bc USING (w1, w2) JOIN pc USING (w1) CROSS JOIN v),
        |agg AS (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
        |    list_reduce(
        |      list_prepend(0.0, list_transform(list_sort(list(wt)), x -> x.term)),
        |      (a, b) -> a + b) AS logp
        |  FROM terms GROUP BY doc_id)
        |SELECT doc_id, n_bigrams,
        |  round(logp, 4) AS sum_logp,
        |  round(logp / n_bigrams, 4) AS avg_logp
        |FROM agg
        |ORDER BY doc_id""".stripMargin,
    "text_unigram_logprob" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), w -> w <> ''))
        |    AS word
        |  FROM documents),
        |wc AS (SELECT word, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY word),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM wc),
        |dwc AS (SELECT doc_id, word, CAST(count(*) AS BIGINT) AS c
        |        FROM toks GROUP BY doc_id, word),
        |terms AS (
        |  SELECT d.doc_id, d.c,
        |    struct_pack(word := d.word,
        |      term := CAST(d.c AS DOUBLE) * ln(CAST(w.n AS DOUBLE) / CAST(tt.t AS DOUBLE)))
        |      AS wt
        |  FROM dwc d JOIN wc w USING (word) CROSS JOIN tot tt),
        |agg AS (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
        |    list_reduce(
        |      list_prepend(0.0, list_transform(list_sort(list(wt)), x -> x.term)),
        |      (a, b) -> a + b) AS logp
        |  FROM terms GROUP BY doc_id)
        |SELECT doc_id, n_tokens,
        |  round(logp, 4) AS sum_logp,
        |  round(logp / n_tokens, 4) AS avg_logp
        |FROM agg
        |ORDER BY doc_id""".stripMargin,
    "text_boilerplate" ->
      """WITH d AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS toks
        |  FROM documents),
        |d2 AS (SELECT * FROM d WHERE len(toks) >= 3),
        |grams AS (
        |  SELECT DISTINCT doc_id, array_to_string(toks[i : i + 2], ' ') AS gram
        |  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 1)) AS i FROM d2) t),
        |gc AS (SELECT gram, count(*) AS df FROM grams GROUP BY gram)
        |SELECT g.doc_id,
        |  count(*) AS n_grams,
        |  count(*) FILTER (WHERE gc.df >= 3) AS n_boiler,
        |  round(CAST(count(*) FILTER (WHERE gc.df >= 3) AS DOUBLE) / count(*), 4)
        |    AS boiler_frac
        |FROM grams g JOIN gc ON g.gram = gc.gram
        |GROUP BY g.doc_id
        |ORDER BY g.doc_id""".stripMargin,
    "text_gopher_rules" ->
      s"""WITH base AS (
        |  SELECT doc_id,
        |    len(list_filter(string_split(text, ' '), w -> w <> '')) AS n_tokens,
        |    length(replace(text, ' ', '')) AS n_wchars,
        |    $hitsEn AS n_stop,
        |    len(list_filter(string_split(text, ' '),
        |      w -> w <> '' AND regexp_matches(w, '[a-z]'))) AS n_alpha,
        |    length(text) - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g'))
        |      AS n_sym
        |  FROM documents),
        |rules AS (
        |  SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        |    CAST(CASE WHEN n_tokens BETWEEN 30 AND 100000 THEN 1 ELSE 0 END
        |      AS BIGINT) AS r_len,
        |    CAST(CASE WHEN n_wchars >= n_tokens * 3 AND n_wchars <= n_tokens * 10
        |      THEN 1 ELSE 0 END AS BIGINT) AS r_wordlen,
        |    CAST(CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END AS BIGINT) AS r_stop,
        |    CAST(CASE WHEN n_alpha * 10 >= n_tokens * 8 THEN 1 ELSE 0 END
        |      AS BIGINT) AS r_alpha,
        |    CAST(CASE WHEN n_sym * 10 <= n_tokens THEN 1 ELSE 0 END
        |      AS BIGINT) AS r_sym
        |  FROM base)
        |SELECT doc_id, n_tokens, r_len, r_wordlen, r_stop, r_alpha, r_sym,
        |  r_len * r_wordlen * r_stop * r_alpha * r_sym AS keep
        |FROM rules
        |ORDER BY doc_id""".stripMargin,
    "text_repetition" ->
      """WITH docs AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |tok AS (SELECT doc_id, unnest(w) AS tok FROM docs),
        |tc AS (
        |  SELECT doc_id, tok, count(*) AS n
        |  FROM tok WHERE tok <> '' GROUP BY doc_id, tok),
        |pt AS (
        |  SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_tokens,
        |    count(*) AS n_distinct, max(n) AS top_n
        |  FROM tc GROUP BY doc_id),
        |bg0 AS (
        |  SELECT d.doc_id, d.w[i] || ' ' || d.w[i + 1] AS bg
        |  FROM docs d, unnest(range(1, len(d.w))) AS u(i)),
        |bc AS (SELECT doc_id, bg, count(*) AS n FROM bg0 GROUP BY doc_id, bg),
        |pb AS (
        |  SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_bi,
        |    count(*) AS n_bi_distinct
        |  FROM bc GROUP BY doc_id)
        |SELECT pt.doc_id, pt.n_tokens, pt.n_distinct, pt.top_n,
        |  round(CAST(pt.n_distinct AS DOUBLE) / pt.n_tokens, 4) AS distinct_frac,
        |  round(CAST(pt.top_n AS DOUBLE) / pt.n_tokens, 4) AS top_frac,
        |  round(coalesce(
        |    CAST(pb.n_bi - pb.n_bi_distinct AS DOUBLE) / pb.n_bi, 0.0), 4)
        |    AS dup_bigram_frac
        |FROM pt LEFT JOIN pb ON pt.doc_id = pb.doc_id
        |ORDER BY pt.doc_id""".stripMargin,
    "text_bm25" ->
      """WITH docs AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |dlt AS (
        |  SELECT doc_id, len(list_filter(w, x -> x <> '')) AS dl FROM docs),
        |cst AS (
        |  SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl
        |  FROM dlt),
        |tok AS (SELECT doc_id, unnest(w) AS tok FROM docs),
        |tfq AS (
        |  SELECT doc_id, tok, count(*) AS tf
        |  FROM tok WHERE tok IN ('join', 'vector', 'scan')
        |  GROUP BY doc_id, tok),
        |dfq AS (SELECT tok, count(*) AS df FROM tfq GROUP BY tok),
        |wg AS (
        |  SELECT t.doc_id, t.tok,
        |    ln(1.0 + (c.n_docs - d.df + 0.5) / (d.df + 0.5))
        |      * (t.tf * (1.2 + 1.0))
        |      / (t.tf + 1.2 * (1.0 - 0.75
        |          + 0.75 * CAST(l.dl AS DOUBLE) * c.n_docs / c.sum_dl)) AS wgt
        |  FROM tfq t
        |  JOIN dfq d ON t.tok = d.tok
        |  JOIN dlt l ON t.doc_id = l.doc_id
        |  CROSS JOIN cst c)
        |SELECT doc_id, count(*) AS n_terms_hit,
        |  round(coalesce(sum(CASE WHEN tok = 'join' THEN wgt END), 0.0)
        |      + coalesce(sum(CASE WHEN tok = 'vector' THEN wgt END), 0.0)
        |      + coalesce(sum(CASE WHEN tok = 'scan' THEN wgt END), 0.0), 4)
        |    AS score
        |FROM wg
        |GROUP BY doc_id
        |ORDER BY score DESC, doc_id ASC
        |LIMIT 20""".stripMargin,
    // the greedy fold as a recursive CTE: one doc per source advances
    // per iteration (rn joins rn+1), carrying (bin_id, fill) — the same
    // integer state machine Packing.fold runs
    "text_pack" ->
      """WITH RECURSIVE d AS (
        |  SELECT source, doc_id,
        |    len(list_filter(string_split(text, ' '), w -> w <> '')) AS n,
        |    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
        |  FROM documents
        |), pack AS (
        |  SELECT source, doc_id, n, rn,
        |    CAST(0 AS BIGINT) AS bin_id, CAST(n AS BIGINT) AS fill
        |  FROM d WHERE rn = 1
        |  UNION ALL
        |  SELECT d.source, d.doc_id, d.n, d.rn,
        |    CASE WHEN p.fill > 0 AND p.fill + d.n > 256
        |         THEN p.bin_id + 1 ELSE p.bin_id END,
        |    CASE WHEN p.fill > 0 AND p.fill + d.n > 256
        |         THEN CAST(d.n AS BIGINT) ELSE p.fill + d.n END
        |  FROM d JOIN pack p ON d.source = p.source AND d.rn = p.rn + 1
        |)
        |SELECT source, doc_id, CAST(n AS BIGINT) AS n_tokens, bin_id
        |FROM pack
        |ORDER BY source, doc_id""".stripMargin,
    "text_chunk" ->
      """WITH d AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS toks
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, toks, len(toks) AS n_tokens,
        |    unnest(range(0, greatest(CAST(ceil(len(toks) / 64.0) AS BIGINT), 1))) AS chunk_id
        |  FROM d)
        |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
        |  CAST(least(64, n_tokens - chunk_id * 64) AS BIGINT) AS chunk_tokens,
        |  array_to_string(toks[chunk_id * 64 + 1 : chunk_id * 64 + 64], ' ') AS chunk_text
        |FROM c
        |ORDER BY doc_id, chunk_id""".stripMargin,
    "text_contamination" ->
      """WITH d0 AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS toks
        |  FROM documents WHERE doc_id < 2000
        |), d AS (SELECT * FROM d0 WHERE len(toks) >= 5),
        |grams AS (
        |  SELECT DISTINCT doc_id, array_to_string(toks[i : i + 4], ' ') AS gram
        |  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 3)) AS i FROM d) t
        |), ev AS (SELECT doc_id AS eval_id, gram FROM grams WHERE doc_id % 7 = 0),
        |co AS (SELECT doc_id AS corpus_id, gram FROM grams WHERE doc_id % 7 <> 0),
        |es AS (SELECT eval_id, count(*) AS n_eval_grams FROM ev GROUP BY eval_id),
        |sh AS (
        |  SELECT co.corpus_id, ev.eval_id, count(*) AS n_shared
        |  FROM co JOIN ev ON co.gram = ev.gram
        |  GROUP BY co.corpus_id, ev.eval_id)
        |SELECT sh.corpus_id, sh.eval_id, sh.n_shared,
        |  round(sh.n_shared / es.n_eval_grams, 4) AS overlap
        |FROM sh JOIN es ON sh.eval_id = es.eval_id
        |WHERE sh.n_shared / es.n_eval_grams >= 0.5
        |ORDER BY sh.corpus_id, sh.eval_id""".stripMargin,
    "text_bigram_pmi" ->
      """WITH docs AS (
        |  SELECT string_split(text, ' ') AS w FROM documents WHERE lang = 'en'
        |), toks AS (
        |  SELECT unnest(w) AS word FROM docs
        |), toks2 AS (SELECT word FROM toks WHERE word <> ''),
        |uni AS (SELECT word, count(*) AS c FROM toks2 GROUP BY word),
        |n AS (SELECT count(*) AS n_tok FROM toks2),
        |bi0 AS (
        |  SELECT t.w[i] AS w1, t.w[i + 1] AS w2
        |  FROM docs t, unnest(range(1, len(t.w))) AS u(i)
        |), bi AS (SELECT w1, w2 FROM bi0 WHERE w1 <> '' AND w2 <> ''),
        |nb AS (SELECT count(*) AS n_big FROM bi),
        |c12 AS (
        |  SELECT w1, w2, count(*) AS c12 FROM bi GROUP BY w1, w2 HAVING count(*) >= 10)
        |SELECT c12.w1, c12.w2, c12.c12,
        |  round(ln((CAST(c12.c12 AS DOUBLE) * n.n_tok * n.n_tok) /
        |    (CAST(nb.n_big AS DOUBLE) * u1.c * u2.c)), 4) AS pmi
        |FROM c12
        |JOIN uni u1 ON u1.word = c12.w1
        |JOIN uni u2 ON u2.word = c12.w2
        |CROSS JOIN n CROSS JOIN nb
        |ORDER BY pmi DESC, w1 ASC, w2 ASC
        |LIMIT 50""".stripMargin,
    "text_langid" ->
      s"""WITH scored AS (
        |  SELECT doc_id, lang AS labeled_lang,
        |    $hitsEn AS n_en, $hitsDe AS n_de, $hitsEs AS n_es, $hitsFr AS n_fr
        |  FROM documents)
        |SELECT doc_id, labeled_lang,
        |  CASE WHEN greatest(n_en, n_de, n_es, n_fr) = 0 THEN 'unknown'
        |       WHEN n_en = greatest(n_en, n_de, n_es, n_fr) THEN 'en'
        |       WHEN n_de = greatest(n_en, n_de, n_es, n_fr) THEN 'de'
        |       WHEN n_es = greatest(n_en, n_de, n_es, n_fr) THEN 'es'
        |       ELSE 'fr' END AS pred_lang,
        |  n_en, n_de, n_es, n_fr
        |FROM scored
        |ORDER BY doc_id""".stripMargin,
    "text_quality" ->
      s"""WITH base AS (
        |  SELECT doc_id,
        |    len(list_filter(string_split(text, ' '), w -> w <> '')) AS n_tokens,
        |    $hitsEn AS n_stop,
        |    length(text) - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g')) AS n_punct,
        |    CAST(length(replace(text, ' ', '')) AS DOUBLE)
        |      / len(list_filter(string_split(text, ' '), w -> w <> '')) AS awl,
        |    CAST($hitsEn AS DOUBLE)
        |      / len(list_filter(string_split(text, ' '), w -> w <> '')) AS sr
        |  FROM documents)
        |SELECT doc_id, n_tokens, n_stop, n_punct,
        |  round(awl, 4) AS avg_word_len,
        |  round(sr, 4) AS stop_ratio,
        |  round(least(CAST(n_tokens AS DOUBLE) / 20.0, 1.0) * (1.0 - sr / 2.0), 4) AS quality_score
        |FROM base
        |ORDER BY doc_id""".stripMargin,
    "text_tokens" ->
      """SELECT doc_id,
        |  len(list_filter(string_split(text, ' '), w -> w <> '')) AS ws_tokens,
        |  len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS bpe_tokens,
        |  round(CAST(length(text) AS DOUBLE) / 4.0, 2) AS est_llm_tokens
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    "text_fingerprint" ->
      """SELECT doc_id,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      list_transform(list_filter(string_split(text, ' '), w -> w <> ''),
        |        w -> ((strpos('0123456789abcdef', substr(md5(w), 1, 1)) - 1) * 4096
        |            + (strpos('0123456789abcdef', substr(md5(w), 2, 1)) - 1) * 256
        |            + (strpos('0123456789abcdef', substr(md5(w), 3, 1)) - 1) * 16
        |            + (strpos('0123456789abcdef', substr(md5(w), 4, 1)) - 1)))),
        |    (acc, wh) -> (acc * 31 + wh) % 1000000007) AS fingerprint,
        |  md5(text) AS text_md5
        |FROM documents
        |ORDER BY doc_id""".stripMargin)
}
