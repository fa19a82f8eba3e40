package graft.functions

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Stable._

/** Text-analysis surface for training-data pipelines: corpus statistics,
  * token counting, word frequency, quality scoring, language
  * identification (self-trained char-trigram profiles), and document
  * fingerprinting.
  *
  * All operators are single-pass groupBy/explode shapes: tokenization
  * stays inside whole-stage codegen (built-in `split`/`transform`, no
  * UDFs), and the only shuffles are the final aggregations on (small)
  * group keys. Word-frequency at 100 TB is the classic skew case — the
  * partial (map-side) aggregation Spark inserts automatically is what
  * keeps hot words from hot-spotting a reducer.
  */
object TextAnalysis {
  type Q = (SparkSession, String) => DataFrame

  /** Documents with the size-gated scan spread applied
    * ([[graft.Tables.spread]]) — used ONLY by the operators whose
    * fused map-side work is heavy enough to beat the extra exchange's
    * first-run cost (q80's repetition signals, q82's regex redaction,
    * q85's gram explode; measured −0.3 to −1.7 s cold). Round-18 A/B
    * note: applying this to EVERY text operator was tried and
    * REVERTED — the bench times each query's FIRST run, and for the
    * small per-doc transforms the added exchange's extra codegen
    * stage + scheduling cost more than the map parallelism returned
    * (+0.2-0.9 s per query cold, while warm runs broke even). */
  private def spreadDocs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.spread(Tables.documents(spark, sfDir), col("doc_id"))

  // ---------------------------------------------------------------- q42
  /** Corpus statistics per (lang, source): doc counts, char/token
    * counts and averages. Token count = whitespace tokenization. */
  def q42TextStats(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir)
      .withColumn("n_words", size(split(col("text"), " ")))
      // BPE-ish subword count: greedy ≤4-char alpha chunks — the cheap
      // regex proxy for byte-pair token budgeting at corpus scale
      .withColumn("n_subtoks", regexp_count(col("text"), lit("[a-z]{1,4}")))
    d.groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        asLong(sum(col("n_words"))).as("total_words"),
        asLong(sum(col("n_subtoks"))).as("total_subtoks"),
        (sum(col("n_words")).cast("double") / count(lit(1))).as("avg_words"),
        asLong(max(col("n_chars"))).as("max_chars"))
      .orderBy(col("lang"), col("source"))
  }

  // ---------------------------------------------------------------- q43
  /** Global word frequency, top 20 (count desc, word asc). */
  def q43WordCount(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word"))
      .limit(20)
  }

  // ---------------------------------------------------------------- q44
  /** Per-document quality features: token count, average word length,
    * stop-word ratio, distinct-word ratio, and a composite score. All
    * ratios are exact integer divisions done in double — identical on
    * both engines. */
  def q44QualityScore(spark: SparkSession, sfDir: String): DataFrame = {
    val stop = Seq("the", "a", "of", "and", "to", "in")
    val d = Tables.documents(spark, sfDir)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_words", size(col("toks")))
      .withColumn("n_stop", size(expr(
        s"filter(toks, w -> w IN (${stop.map("'" + _ + "'").mkString(",")}))")))
      .withColumn("n_uniq", size(array_distinct(col("toks"))))
    d.select(col("doc_id"), col("lang"),
        asLong(col("n_words")).as("n_words"),
        ((col("n_chars") - (col("n_words") - 1)).cast("double")
          / col("n_words")).as("avg_word_len"),
        (col("n_stop").cast("double") / col("n_words")).as("stop_ratio"),
        (col("n_uniq").cast("double") / col("n_words")).as("uniq_ratio"),
        (col("n_stop") * lit(100) / col("n_words")
          + col("n_uniq") * lit(100) / col("n_words")).cast("double")
          .as("quality"))
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------- q45
  /** Language ID by character-trigram profiles learned from the corpus
    * itself: top-32 trigrams per labeled lang → classify each doc by
    * profile-hit count (argmax, lang-asc tie-break). Self-referential
    * train/apply is intentional — it exercises the two-pass
    * profile-broadcast shape; accuracy against the labels is what the
    * unit test checks. Rows-only (no portable oracle: profile tie-breaks
    * hinge on engine-identical top-k, which IS this query). */
  def q45LangId(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sfDir)
    // trigrams are hashed to 64-bit immediately: every downstream
    // groupBy/join shuffles fixed-width longs instead of strings.
    // stride-2 position sampling halves the gram volume with no
    // meaningful signal loss (profiles and scores use the same stride).
    // CharGramHashes is the codegen'd O(n)-per-doc form — the
    // composable transform(sequence…substring) it replaces re-scanned
    // the UTF-8 bytes per gram (O(n²)/doc), which dominated the query.
    val grams = docs.select(col("doc_id"), col("lang"),
        explode_outer(CharGramHashes.charGramHashes(col("text"))).as("g"))
      .filter(col("g").isNotNull)
      .cache() // used twice: profile build + scoring pass
    val profile = grams.groupBy(col("lang"), col("g"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("n").desc, col("g"))))
      .filter(col("rk") <= 32)
      .select(col("lang").as("plang"), col("g"))
    val scored = grams.select(col("doc_id"), col("g"))
      .join(broadcast(profile), Seq("g"))
      .groupBy(col("doc_id"), col("plang"))
      .agg(count(lit(1)).as("hits"))
    val best = scored.withColumn("rk", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("hits").desc, col("plang"))))
      .filter(col("rk") === 1)
      .select(col("doc_id"), col("plang").as("predicted"), col("hits"))
    docs.select(col("doc_id"), col("lang").as("actual"))
      .join(best, Seq("doc_id"), "left")
      .select(col("doc_id"), col("actual"), col("predicted"),
        (col("predicted") === col("actual")).as("correct"))
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------- q46
  /** Document fingerprinting: full-content hash + winnowing-style
    * min-hash over word 4-gram rolling windows. Equal fingerprints ⇒
    * duplicate candidates in O(n) (vs pairwise O(n²)). xxhash64 ⇒
    * rows-only; the dup-detection property is unit-tested. */
  def q46Fingerprint(spark: SparkSession, sfDir: String): DataFrame =
    fingerprints(Tables.documents(spark, sfDir))

  /** Fingerprint any (doc_id, text) frame — the reusable building block
    * behind q46 (and the unit tests, which feed it synthesized dups). */
  def fingerprints(docs: DataFrame): DataFrame = {
    val d = docs.withColumn("toks", split(col("text"), " "))
    d.select(col("doc_id"),
        xxhash64(col("text")).as("content_hash"),
        expr("""
          aggregate(
            transform(sequence(1, greatest(size(toks) - 3, 1)),
              i -> xxhash64(concat_ws(' ', element_at(toks, i),
                element_at(toks, i + 1), element_at(toks, i + 2),
                element_at(toks, i + 3)))),
            CAST(9223372036854775807 AS BIGINT),
            (acc, h) -> CASE WHEN h < acc THEN h ELSE acc END)""").as("min_gram_hash"),
        asLong(size(col("toks"))).as("n_words"))
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------- q68
  /** The canonical training-data prep pipeline COMPOSED end-to-end in
    * one plan — exactly what a user runs before tokenization at corpus
    * scale:
    *   1. exact dedup (keep lowest doc_id per identical text),
    *   2. quality gate (≥5 words, distinct-word ratio ≥ 0.6),
    *   3. per-(lang, source) token budget (words + BPE-ish subtokens).
    * Every stage is one of the library's graded operators; composing
    * them stays a single Catalyst plan (dedup window → filter →
    * aggregate), so the optimizer pipelines the whole thing with one
    * shuffle per stage. Fully DuckDB-oracled. */
  def q68PipelinePrep(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("text")).orderBy(col("doc_id"))
    Tables.documents(spark, sfDir)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_words", size(col("toks")))
      .withColumn("n_uniq", size(array_distinct(col("toks"))))
      .filter(col("n_words") >= 5 &&
        col("n_uniq").cast("double") / col("n_words") >= 0.6)
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        asLong(sum(col("n_words"))).as("total_words"),
        asLong(sum(regexp_count(col("text"), lit("[a-z]{1,4}"))))
          .as("total_subtoks"))
      .orderBy(col("lang"), col("source"))
  }

  // ---------------------------------------------------------------- q74
  /** BPE merge-candidate mining — the inner statistic of tokenizer vocab
    * induction: global frequency of adjacent character pairs inside
    * words, top 30 (the pair a BPE trainer would merge first, plus the
    * next 29). Two explodes (word, then in-word pair) feeding one
    * count — the same map-side-partial word-skew shape as q43; at
    * corpus scale the pair alphabet is tiny (≤ chars²), so the final
    * aggregation state is bounded regardless of input size. */
  def q74BpeMerges(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.documents(spark, sfDir)
      .select(explode_outer(split(col("text"), " ")).as("w"))
      .filter(col("w").isNotNull && length(col("w")) >= 2)
      .select(explode_outer(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
        .as("pair"))
      .filter(col("pair").isNotNull)
      .groupBy(col("pair"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(30)
  }

  // ---------------------------------------------------------------- q80
  /** Within-document repetition signals — the Gopher-style repetition
    * quality filters: duplicate-token fraction, most-frequent-token
    * fraction, duplicate word-bigram fraction, and the keep/drop flag a
    * pipeline would gate on. Pure per-row expression work (map-only, no
    * shuffle at any corpus size; the ORDER BY is the graded output's,
    * not the operator's). The top-token count is O(n log n) per doc —
    * sort, then one longest-run aggregate pass (see
    * [[repetitionSignals]]); no per-distinct-token re-scan survives at
    * any document length. */
  def q80RepetitionFilter(spark: SparkSession, sfDir: String): DataFrame =
    repetitionSignals(spreadDocs(spark, sfDir))
      .drop("text").orderBy(col("doc_id"))

  /** The signal stage alone — stateless and map-only, so it runs
    * unchanged on a streaming `docs` frame (append mode, no watermark);
    * StreamingSpec pins stream == batch. Keeps `text` so downstream
    * stages (the PII scrub, packing) compose without a re-join. */
  def repetitionSignals(docs: DataFrame): DataFrame = {
    val d = docs
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n", size(col("toks")))
      .withColumn("u", size(array_distinct(col("toks"))))
      // most-frequent-token count as the LONGEST RUN of the sorted token
      // array — O(n log n) per doc. The previous higher-order form
      // (array_max over per-distinct-token filter re-scans) was O(u·n)
      // per doc: invisible on kToken web docs but the per-row hot spot
      // on real corpora (10^3 distinct × 10^4 tokens = 10^7 ops/doc).
      // Equal tokens are adjacent after array_sort, so max frequency ==
      // longest run; oracle hash unchanged (pinned in PipelineSpec on a
      // pathological long-doc fixture).
      .withColumn("topc", expr(
        """aggregate(array_sort(toks),
             named_struct('prev', cast(null as string), 'run', 0, 'best', 0),
             (a, x) -> named_struct(
               'prev', x,
               'run', if(x <=> a.prev, a.run + 1, 1),
               'best', greatest(a.best, if(x <=> a.prev, a.run + 1, 1))),
             a -> a.best)"""))
      // guard: sequence(1, 0) is DESCENDING in Spark but empty in
      // DuckDB — greatest(n-1, 1) + the n>=2 CASE keeps both engines on
      // the same arithmetic for one-token docs. try_element_at on the
      // i+1 access: a ONE-token doc's single window has no second
      // element (ANSI element_at throws; the value is irrelevant — the
      // n>=2 CASE discards the bigram row anyway).
      .withColumn("bigrams", expr(
        """transform(sequence(1, greatest(size(toks) - 1, 1)),
           i -> concat_ws(' ', element_at(toks, i), try_element_at(toks, i + 1)))"""))
      .withColumn("nb", size(col("bigrams")))
      .withColumn("ub", size(array_distinct(col("bigrams"))))
      .withColumn("dup_bigram_frac",
        when(col("n") >= 2,
          (col("nb") - col("ub")).cast("double") / col("nb"))
        .otherwise(lit(0.0)))
    d.select(col("doc_id"), col("text"),
        asLong(col("n")).as("n_words"),
        ((col("n") - col("u")).cast("double") / col("n")).as("dup_tok_frac"),
        (col("topc").cast("double") / col("n")).as("top_tok_frac"),
        col("dup_bigram_frac"),
        (col("topc").cast("double") / col("n") > 0.12 ||
          col("dup_bigram_frac") > 0.10).as("repetitive"))
  }

  // ---------------------------------------------------------------- q82
  /** PII redaction — the scrub stage every training pipeline runs before
    * tokenization. The corpus is synthetic word soup with no PII, so the
    * query first APPENDS a deterministic contact line derived from
    * doc_id (same arithmetic in the oracle), then redacts emails and
    * phone numbers with anchored regexes and proves byte-exact
    * equivalence via md5 of the redacted text. Map-only: a per-row
    * transform with zero shuffles at any corpus size, and the regexes
    * are RE2-compatible so the semantics port across engines. */
  def q82PiiRedact(spark: SparkSession, sfDir: String): DataFrame =
    redactPii(spreadDocs(spark, sfDir)).orderBy(col("doc_id"))

  /** The scrub stage alone — stateless and map-only (streams unchanged;
    * StreamingSpec pins stream == batch). */
  def redactPii(docs: DataFrame): DataFrame = {
    val email = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
    val phone = "\\+1-555-[0-9]{4}"
    val d = docs
      .withColumn("raw", concat(col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@mail.example call +1-555-"),
        lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0")))
      .withColumn("red", regexp_replace(
        regexp_replace(col("raw"), email, "<EMAIL>"), phone, "<PHONE>"))
    d.select(col("doc_id"),
        asLong(regexp_count(col("raw"), lit(email))).as("n_emails"),
        asLong(regexp_count(col("raw"), lit(phone))).as("n_phones"),
        asLong(length(col("raw"))).as("chars_raw"),
        asLong(length(col("red"))).as("chars_red"),
        md5(col("red")).as("digest"))
  }

  // ---------------------------------------------------------------- q85
  /** Exact-substring duplication detector (the Lee et al. "Deduplicating
    * Training Data" statistic): word 8-gram spans shared by ≥ 2
    * documents, with document frequency and total occurrence counts —
    * the spans an exact-substring deduper would cut. One explode + one
    * aggregation: the classic map-side-partial word-skew shape. The
    * group key here is the raw gram STRING so the DuckDB oracle can
    * reproduce it; at 100 TB you key on xxhash64(gram) (the
    * `shingle_hashes` expression) and shuffle fixed-width longs —
    * identical plan, ~10× less shuffle volume. */
  def q85SubstringDup(spark: SparkSession, sfDir: String): DataFrame = {
    val g = 8
    spreadDocs(spark, sfDir)
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= g)
      .select(col("doc_id"), explode_outer(expr(
        s"transform(sequence(1, size(toks) - ${g - 1}), i -> concat_ws(' ', slice(toks, i, $g)))"))
        .as("gram"))
      .filter(col("gram").isNotNull)
      .groupBy(col("gram"))
      .agg(countDistinct(col("doc_id")).as("df"),
        count(lit(1)).as("occurrences"))
      .filter(col("df") >= 2)
      .orderBy(col("df").desc, col("occurrences").desc, col("gram"))
      .limit(20)
  }

  // --------------------------------------------------------------- q148
  /** Global repeated-passage REMOVAL — the cleaning counterpart to
    * q85's statistic (C4 drops duplicated three-sentence spans;
    * MassiveText cuts repeated passages): each document partitions into
    * consecutive 8-word passages, any passage whose exact text occurs
    * ≥ 2 times corpus-wide is dropped, and the survivors reassemble in
    * original order into the cleaned text with per-doc kept/dropped
    * accounting (a fully-boilerplate doc survives as an empty row — the
    * audit sees it — rather than vanishing). C4 keys on newline-split
    * lines; this corpus is unpunctuated word soup, so deterministic
    * fixed-width segmentation stands in for line breaks — the plan is
    * separator-independent.
    *
    * Scale shape: passages PARTITION the words (unlike q85's
    * overlapping grams), so the explode is |corpus words|-sized and
    * map-only; hot passages come from one hash aggregate with map-side
    * partials whose output is boilerplate — tiny by definition — and
    * return as a BROADCAST anti-join, so the corpus is never shuffled
    * to be filtered; the only corpus-sized shuffle is the final
    * groupBy(doc_id) reassembly, which any doc-granular rewrite pays.
    * In-doc passage order survives the shuffle via array_sort over
    * (pos, passage) structs — no window, no assumption about
    * collect_list order. Group key is the raw passage string for
    * oracle reproducibility; at 100 TB count and anti-join on
    * xxhash64(passage) (the `shingle_hashes` discipline) — identical
    * plan, fixed 8-byte keys. */
  def q148PassageDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val hot = passageRows(docs).groupBy(col("passage"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2)
      .select(col("passage"))
    removePassages(docs, hot)
  }

  /** (doc_id, pos, passage) rows — the deterministic non-overlapping
    * 8-word segmentation shared by batch q148 and the streaming
    * passage-count fold (graft.streaming.StreamingPassages). Map-only:
    * one codegen'd split + transform + posexplode, no shuffle. */
  private[graft] def passageRows(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), posexplode(expr(
        "transform(sequence(0, cast(ceil(size(w) / 8.0) as int) - 1), " +
          "i -> array_join(slice(w, i * 8 + 1, 8), ' '))")))
      .toDF("doc_id", "pos", "passage")

  /** Cleaning + reassembly given ANY hot-passage frame — shared by
    * batch q148 (hot = one corpus aggregate) and the streaming view
    * (hot = merge of per-batch count partials), so stream == batch is
    * a plan-level equivalence over the same code, not a coincidence. */
  private[graft] def removePassages(docs: DataFrame, hot: DataFrame): DataFrame = {
    val kept = passageRows(docs)
      .join(broadcast(hot.select(col("passage"))), Seq("passage"), "left_anti")
    val clean = kept.groupBy(col("doc_id"))
      .agg(
        array_join(expr(
            "transform(array_sort(collect_list(struct(pos, passage))), " +
              "x -> x.passage)"), " ").as("clean_text"),
        count(lit(1)).as("n_kept"))
    val tot = docs.select(col("doc_id"),
      expr("cast(ceil(size(split(text, ' ')) / 8.0) as bigint)")
        .as("n_passages"))
    tot.join(clean, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_passages") - coalesce(col("n_kept"), lit(0L)))
          .as("n_dropped"))
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------- q90
  /** TF-IDF term scoring: top-3 most characteristic terms per document.
    * tf per (doc, term) comes out of one hash aggregate with map-side
    * partials (word skew is absorbed the same way q43's word count
    * handles it); df per term is a VOCABULARY-sized aggregate over the
    * tf frame, broadcast back onto it — the tf exchange is shared by
    * both consumers (exchange reuse), so the corpus explode runs once
    * and no second corpus-frame shuffle or sort exists (the window
    * form this replaces re-shuffled and sorted the whole tf frame on
    * term). |corpus| comes from parquet footers (cached driver
    * metadata, no pre-plan job — the q84 pattern).
    *
    * The score is the log-free rarity ratio tf·N/df: within a fixed
    * document log(N/df) is a monotone transform per TERM but the
    * integer ratio keeps the arithmetic exactly reproducible
    * cross-engine (tf·N is an exact BIGINT, one double division on
    * identical operands), where ln() rounding is engine-library
    * dependent — same determinism discipline as the engine's decimal
    * money sums. Ranking ties break by term asc.
    *
    * Scale note: the top-3 window sorts each doc's own term list (tens
    * of rows per partition key, never a corpus sort); the df branch
    * shuffles only |vocab| partial-combined rows and returns as a
    * bounded broadcast — no second corpus scan, no second corpus-frame
    * shuffle. */
  def q90Tfidf(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val n = Tables.footerRowCount(spark, s"$sfDir/documents.parquet")
    val tf = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode_outer(split(col("text"), " ")).as("term"))
      .filter(col("term").isNotNull && col("term") =!= "")
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term"))
    // df as a VOCABULARY-sized aggregate broadcast back (round 18): the
    // former frame-less window shuffled and sorted the whole (doc,
    // term, tf) frame a second time just to count rows per term. The
    // aggregate's partial combine collapses that to |vocab| rows before
    // any exchange, and the broadcast join attaches it with no second
    // corpus-frame shuffle. The tf exchange under both consumers is
    // byte-identical, so Spark's exchange reuse runs the explode + tf
    // aggregation ONCE (the double-scan the old join form was replaced
    // for predates exchange reuse of this shape; verified single-scan
    // in plans/r18/q90_tfidf_after.txt). Vocabulary-sized broadcasts
    // are the q45-profile discipline — bounded at any corpus scale.
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(df), Seq("term"))
      .withColumn("score", (col("tf") * lit(n)).cast("double") / col("df"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        col("score"), col("rk").cast("long").as("rk"))
      .orderBy(col("doc_id"), col("rk"))
  }

  // ---------------------------------------------------------------- q91
  /** Overlapping context windows (doc → training chunks): C=64-token
    * chunks every S=48 tokens (16-token overlap) — the long-document
    * counterpart to q71's packing (q71 concatenates short docs up to a
    * budget; this splits long docs across stride windows so no span is
    * lost at a chunk boundary). Chunk count is the exact integer
    * ceil form 1 + ⌈max(n−C,0)/S⌉; the final chunk may be short.
    * Chunks are identified by md5 of the re-joined token span (byte-
    * exact cross-engine, the q82 discipline) so the oracle pins CONTENT,
    * not just counts, without hauling full text through the diff.
    *
    * Scale shape: map-only fan-out (explode_outer of a computed
    * transform + isNotNull — the InferFiltersFromGenerate-safe form);
    * output ∝ Σ chunks, no shuffle at all before the output sort. */
  /** Frame form — map-only and stateless, so it runs unchanged on a
    * STREAM (chunking-at-ingest; StreamingSpec pins stream == batch).
    * Unordered; the batch query adds the total order. */
  def chunkWindows(docs: DataFrame, C: Int = 64, S: Int = 48): DataFrame =
    docs
      .withColumn("toks", split(col("text"), " "))
      .withColumn("nc",
        lit(1) + expr(s"(greatest(size(toks) - $C, 0) + ${S - 1}) div $S"))
      .select(col("doc_id"), explode_outer(expr(
        s"""transform(sequence(0, CAST(nc - 1 AS INT)), i -> named_struct(
              'idx', CAST(i AS BIGINT),
              'span', slice(toks, i * $S + 1, $C)))""")).as("ch"))
      .filter(col("ch").isNotNull)
      .select(col("doc_id"), col("ch.idx").as("chunk_idx"),
        size(col("ch.span")).cast("long").as("chunk_toks"),
        md5(array_join(col("ch.span"), " ")).as("chunk_md5"))

  def q91ChunkWindows(spark: SparkSession, sfDir: String): DataFrame =
    chunkWindows(Tables.documents(spark, sfDir))
      .orderBy(col("doc_id"), col("chunk_idx"))

  // ---------------------------------------------------------------- q96
  /** Per-language median quality gate (the CCNet-style "keep the better
    * half per language" filter): score = distinct-word ratio, cutoff =
    * each language's DISCRETE lower-median score (the actual element at
    * rank ⌈n/2⌉ by (score, doc_id) — deliberately not an interpolating
    * percentile, whose (1−g)·a+g·b vs a+(b−a)·g evaluation order
    * differs between engines by an ulp and could flip gate membership;
    * picking a real data value makes the ≥ comparison exact). Keep docs
    * scoring ≥ their language's cutoff, summarize per language.
    *
    * Scale note: the exact rank-median needs a per-lang sort (bounded
    * by the largest language); at 100 TB the drop-in is an
    * approx_percentile cutoff (q69's sketch) or a threshold-selection
    * pass (q84) — the gate join itself is a broadcast of |langs| rows
    * either way. */
  def q96QualityGate(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Null text => null score; drop those rows BEFORE the rank so the
    // median element can't shift, and rank nulls-last anyway — Spark
    // sorts NULLs first, DuckDB's ORDER BY sorts them last, so an
    // unfiltered null would silently desynchronize the two medians.
    val scored = Tables.documents(spark, sfDir)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("score",
        size(array_distinct(col("toks"))).cast("double") / size(col("toks")))
      .select(col("doc_id"), col("lang"), col("n_chars"), col("score"))
      .filter(col("score").isNotNull)
    val byScore = Window.partitionBy(col("lang"))
      .orderBy(col("score").asc_nulls_last, col("doc_id"))
    val byLang = Window.partitionBy(col("lang"))
    // One pass: rank + a second frame-less window flood the per-lang
    // cutoff to every row, so the expensive score expression (split +
    // array_distinct over full text) is evaluated ONCE per document —
    // the former med-then-join form re-evaluated it on both join
    // branches. Same rows, same oracle.
    scored
      .withColumn("rn", row_number().over(byScore))
      .withColumn("n", count(lit(1)).over(byLang))
      .withColumn("cutoff",
        max(when(col("rn") === expr("(n + 1) div 2"), col("score")))
          .over(byLang))
      .filter(col("score") >= col("cutoff"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_kept"),
        asLong(sum(col("n_chars"))).as("kept_chars"),
        asLong(min(col("doc_id"))).as("first_doc"),
        asLong(max(col("doc_id"))).as("last_doc"))
      .orderBy(col("lang"))
  }

  // ---------------------------------------------------------------- q118
  /** Word co-occurrence / collocation mining: top adjacent bigrams by a
    * PMI-style association score — the phrase-discovery pass a
    * tokenizer-training or n-gram-LM pipeline runs over a corpus.
    *
    * score = c_xy · T / (c_x · c_y): the log-free rational form of PMI
    * (log is monotone per pair; the ratio multiplies exact BIGINTs and
    * divides ONCE in double — the q90 determinism discipline, ln()'s
    * libm drift never enters). Support floor c_xy ≥ 30 keeps the rank
    * stable under the score's heavy tail.
    *
    * Scale shape: bigram fan-out is map-only (explode of a computed
    * transform); both aggregates take map-side partials (word skew
    * absorbed); unigram counts re-attach by two equi-joins of the
    * ALREADY-AGGREGATED pair frame (⌀ pairs ≪ corpus tokens); the
    * corpus-total T is one broadcast row (q97 discipline). */
  def q118WordCooccurrence(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    val pairs = toks
      .select(explode_outer(expr(
        """transform(sequence(1, greatest(size(toks) - 1, 1)),
           i -> struct(element_at(toks, i) AS w1,
                       element_at(toks, i + 1) AS w2))""")).as("p"))
      .filter(col("p.w1").isNotNull && col("p.w2").isNotNull)
      .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .agg(count(lit(1)).as("c_xy"))
      .filter(col("c_xy") >= 30)
    val uni = toks.select(explode_outer(col("toks")).as("w"))
      .filter(col("w").isNotNull)
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val total = uni.agg(asLong(sum(col("c"))).as("t_total"))
    pairs
      .join(uni.select(col("w").as("w1"), col("c").as("c_x")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("c").as("c_y")), Seq("w2"))
      .join(broadcast(total))
      .select(col("w1"), col("w2"), col("c_xy"), col("c_x"), col("c_y"),
        ((col("c_xy") * col("t_total")).cast("double")
          / (col("c_x") * col("c_y"))).as("score"))
      .orderBy(col("score").desc, col("w1"), col("w2"))
      .limit(20)
  }

  // ---------------------------------------------------------------- q123
  /** BM25 ranking for a fixed 3-term query — the IR scoring step after
    * q90's TF-IDF: per-term saturation (k1) and document-length
    * normalization (b), the scoring function retrieval-augmented
    * pipelines actually rank with.
    *
    * Determinism: idf enters as the LOG-FREE rarity ratio N/df, so
    * libm never enters the plan. This is a deliberate BM25-family
    * VARIANT, not classic BM25: the ratio is monotone in df per term
    * (single-term rankings agree), but once scores SUM across terms
    * the cross-term weighting differs from log-idf, so multi-term
    * rankings can diverge from the textbook formula. What the oracle
    * pins is that both engines evaluate this exact variant bit-for-bit:
    * every division is spelled with identical association, and the
    * per-document total is a FIXED-ORDER sum of the three per-term
    * conditional aggregates (a float sum() over terms would be
    * reduction-order-dependent). k1 = 1.2, b = 0.75.
    *
    * Scale shape: the tf frame is filtered to the query's terms BEFORE
    * aggregation (∝ matching postings, not corpus tokens); dl rides
    * the same pass; avgdl is one broadcast row; df is a window count
    * over the 3-term postings frame. */
  def q123Bm25(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val terms = Seq("join", "scan", "filter")
    val n = Tables.footerRowCount(spark, s"$sfDir/documents.parquet")
    val toks = Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
        explode_outer(col("toks")).as("term"))
      .filter(col("term").isNotNull)
    val avgdl = toks.groupBy(col("doc_id")).agg(first(col("dl")).as("dl"))
      .agg((sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val tf = toks.filter(col("term").isin(terms: _*))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("term"))))
    val scored = tf.join(broadcast(avgdl))
      .withColumn("s",
        (col("tf") * lit(2.2))
          / (col("tf") + lit(1.2)
            * (lit(1.0) - lit(0.75) + lit(0.75) * col("dl") / col("avgdl")))
          * (lit(n.toDouble) / col("df")))
    scored.groupBy(col("doc_id"))
      .agg((coalesce(max(when(col("term") === "join", col("s"))), lit(0.0))
          + coalesce(max(when(col("term") === "scan", col("s"))), lit(0.0))
          + coalesce(max(when(col("term") === "filter", col("s"))), lit(0.0)))
        .as("bm25"),
        count(lit(1)).as("n_terms_hit"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(20)
  }

  // --------------------------------------------------------------- q205
  /** VOCABULARY COVERAGE CURVE — the tokenizer-sizing question asked
    * before every BPE/unigram train: how much of the corpus token mass
    * does a top-V vocabulary cover, and what OOV rate does each budget
    * leave? One explode+count builds the frequency table, ONE window
    * ranks it ((freq desc, token) — total order, rank ties impossible),
    * and each budget's coverage is a grouped sum over the vocab table
    * joined against the 4-row broadcast budget list. The global ranking
    * window runs over the VOCAB table, not the corpus — Heaps' law
    * keeps |vocab| orders below |tokens| at any scale (and past memory,
    * the same curve is served from the top-V truncation of this exact
    * frequency table, since budgets beyond V are off the curve by
    * construction). OOV rate is one IEEE division of exact BIGINTs. */
  def q205VocabCoverage(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val freq = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy(col("tok")).agg(count(lit(1)).as("f"))
    // Corpus totals ride the SAME single-partition ranking window
    // (full frame) instead of a second aggregate — one vocab-table pass
    // computes rank AND totals, so the corpus is exploded exactly once.
    val wOrd = Window.orderBy(col("f").desc, col("tok"))
    val wAll = wOrd.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val ranked = freq.select(col("f"),
      row_number().over(wOrd).as("r"),
      sum(col("f")).over(wAll).as("total_toks"),
      count(lit(1)).over(wAll).as("total_types"))
    import spark.implicits._
    val budgets = Seq(100L, 1000L, 10000L, 100000L).toDF("vocab_size")
    ranked.join(broadcast(budgets), col("r") <= col("vocab_size"))
      .groupBy(col("vocab_size"), col("total_toks"), col("total_types"))
      .agg(count(lit(1)).as("n_types_used"),
        sum(col("f")).as("covered_toks"))
      .select(col("vocab_size"), col("n_types_used"), col("covered_toks"),
        col("total_toks"), col("total_types"),
        ((col("total_toks") - col("covered_toks")).cast("double")
          / col("total_toks").cast("double")).as("oov_rate"))
      .orderBy(col("vocab_size"))
  }

  lazy val defs: Map[String, Q] = Map(
    "q205_vocab_coverage" -> q205VocabCoverage,
    "q90_tfidf" -> q90Tfidf,
    "q118_word_cooccurrence" -> q118WordCooccurrence,
    "q123_bm25" -> q123Bm25,
    "q91_chunk_windows" -> q91ChunkWindows,
    "q96_quality_gate" -> q96QualityGate,
    "q42_text_stats" -> q42TextStats,
    "q43_word_count" -> q43WordCount,
    "q44_quality_score" -> q44QualityScore,
    "q45_lang_id" -> q45LangId,
    "q46_fingerprint" -> q46Fingerprint,
    "q68_pipeline_prep" -> q68PipelinePrep,
    "q74_bpe_merges" -> q74BpeMerges,
    "q80_repetition_filter" -> q80RepetitionFilter,
    "q82_pii_redact" -> q82PiiRedact,
    "q85_substring_dup" -> q85SubstringDup,
    "q148_passage_dedup" -> q148PassageDedup,
  )

  /** q45/q46 are hash/model-dependent ⇒ rows-only. */
  lazy val sql: Map[String, String] = Map(
    // Rank ties impossible ((freq DESC, token) is total), so row_number
    // agrees across engines; OOV is one division of exact BIGINTs.
    "q205_vocab_coverage" -> """
      WITH toks AS (
        SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
      freq AS (
        SELECT tok, count(1) AS f FROM toks
        WHERE length(tok) > 0 GROUP BY 1),
      ranked AS (
        SELECT f, row_number() OVER (ORDER BY f DESC, tok) AS r,
          CAST(sum(f) OVER () AS BIGINT) AS total_toks,
          count(1) OVER () AS total_types
        FROM freq),
      budgets AS (SELECT CAST(unnest([100, 1000, 10000, 100000]) AS BIGINT)
                    AS vocab_size)
      SELECT vocab_size, count(1) AS n_types_used,
        CAST(sum(f) AS BIGINT) AS covered_toks,
        total_toks, total_types,
        CAST(total_toks - CAST(sum(f) AS BIGINT) AS DOUBLE)
          / CAST(total_toks AS DOUBLE) AS oov_rate
      FROM ranked JOIN budgets ON r <= vocab_size
      GROUP BY vocab_size, total_toks, total_types
      ORDER BY vocab_size""",
    // Constants are CAST AS DOUBLE: DuckDB's bare 2.2 is a DECIMAL
    // literal, and tf*DECIMAL(2.2) is exact where Spark's double
    // multiply rounds — the cast makes both engines do the identical
    // float op. Association mirrors the Spark expression tree exactly.
    "q123_bm25" -> """
      WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      x AS (
        SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
          unnest(toks) AS term
        FROM t),
      n AS (SELECT CAST(count(1) AS DOUBLE) AS n_docs FROM documents),
      a AS (
        SELECT CAST(sum(dl) AS DOUBLE) / count(1) AS avgdl
        FROM (SELECT doc_id, min(dl) AS dl FROM x GROUP BY doc_id)),
      tf AS (
        SELECT doc_id, term, count(1) AS tf, min(dl) AS dl
        FROM x WHERE term IN ('join', 'scan', 'filter')
        GROUP BY doc_id, term),
      p AS (
        SELECT tf.*, count(1) OVER (PARTITION BY term) AS df FROM tf),
      s AS (
        SELECT doc_id, term,
          (tf * CAST(2.2 AS DOUBLE))
            / (tf + CAST(1.2 AS DOUBLE)
              * (CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE)
                 + CAST(0.75 AS DOUBLE) * dl / avgdl))
            * (n_docs / df) AS s
        FROM p CROSS JOIN a CROSS JOIN n)
      SELECT doc_id,
        coalesce(max(CASE WHEN term = 'join' THEN s END), 0.0)
          + coalesce(max(CASE WHEN term = 'scan' THEN s END), 0.0)
          + coalesce(max(CASE WHEN term = 'filter' THEN s END), 0.0)
          AS bm25,
        count(1) AS n_terms_hit
      FROM s
      GROUP BY doc_id
      ORDER BY bm25 DESC, doc_id
      LIMIT 20""",
    "q118_word_cooccurrence" -> """
      WITH t AS (
        SELECT string_split(text, ' ') AS toks FROM documents),
      pc AS (
        SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
          i -> toks[i] || ' ' || toks[i+1])) AS pr
        FROM t),
      pairs AS (
        SELECT split_part(pr, ' ', 1) AS w1, split_part(pr, ' ', 2) AS w2,
          count(1) AS c_xy
        FROM pc GROUP BY 1, 2 HAVING count(1) >= 30),
      u AS (SELECT unnest(toks) AS w FROM t),
      uni AS (SELECT w, count(1) AS c FROM u GROUP BY 1),
      tot AS (SELECT CAST(count(1) AS BIGINT) AS t_total FROM u)
      SELECT w1, w2, c_xy, a.c AS c_x, b.c AS c_y,
        CAST(c_xy * t_total AS DOUBLE) / (a.c * b.c) AS score
      FROM pairs
        JOIN uni a ON a.w = w1
        JOIN uni b ON b.w = w2
        CROSS JOIN tot
      ORDER BY score DESC, w1, w2
      LIMIT 20""",
    "q90_tfidf" -> """
      WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents),
      t AS (
        SELECT doc_id, term, count(*) AS tf
        FROM toks WHERE term <> '' GROUP BY 1, 2),
      d AS (SELECT term, count(*) AS df FROM t GROUP BY 1),
      nn AS (SELECT count(*) AS n FROM documents),
      s AS (
        SELECT t.doc_id, t.term, t.tf, d.df,
          CAST(t.tf * nn.n AS DOUBLE) / d.df AS score
        FROM t JOIN d USING (term) CROSS JOIN nn)
      SELECT doc_id, term, CAST(tf AS BIGINT) AS tf,
        CAST(df AS BIGINT) AS df, score, CAST(rk AS BIGINT) AS rk
      FROM (
        SELECT *, row_number() OVER (PARTITION BY doc_id
          ORDER BY score DESC, term) AS rk
        FROM s) z
      WHERE rk <= 3
      ORDER BY doc_id, rk""",
    "q96_quality_gate" -> """
      WITH s AS (
        SELECT * FROM (
          SELECT doc_id, lang, n_chars,
            CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
              / len(string_split(text, ' ')) AS score
          FROM documents)
        WHERE score IS NOT NULL),
      m AS (
        SELECT lang, score AS cutoff FROM (
          SELECT lang, score,
            row_number() OVER (PARTITION BY lang
              ORDER BY score, doc_id) AS rn,
            count(1) OVER (PARTITION BY lang) AS n
          FROM s) t
        WHERE rn = (n + 1) // 2)
      SELECT s.lang, count(1) AS n_kept,
        CAST(sum(s.n_chars) AS BIGINT) AS kept_chars,
        CAST(min(s.doc_id) AS BIGINT) AS first_doc,
        CAST(max(s.doc_id) AS BIGINT) AS last_doc
      FROM s JOIN m USING (lang)
      WHERE s.score >= m.cutoff
      GROUP BY s.lang
      ORDER BY s.lang""",
    "q91_chunk_windows" -> """
      WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks,
          len(string_split(text, ' ')) AS n_toks
        FROM documents),
      c AS (
        SELECT doc_id, toks, n_toks,
          1 + (greatest(n_toks - 64, 0) + 47) // 48 AS n_chunks
        FROM t),
      x AS (
        SELECT doc_id, toks, n_toks,
          unnest(generate_series(0, n_chunks - 1)) AS i
        FROM c)
      SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
        CAST(len(list_slice(toks, i * 48 + 1, least(i * 48 + 64, n_toks)))
          AS BIGINT) AS chunk_toks,
        md5(array_to_string(
          list_slice(toks, i * 48 + 1, least(i * 48 + 64, n_toks)), ' '))
          AS chunk_md5
      FROM x
      ORDER BY doc_id, chunk_idx""",
    "q42_text_stats" -> """
      SELECT lang, source, count(1) AS n_docs,
        CAST(sum(n_chars) AS BIGINT) AS total_chars,
        CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_words,
        CAST(sum(len(regexp_extract_all(text, '[a-z]{1,4}'))) AS BIGINT) AS total_subtoks,
        CAST(sum(len(string_split(text, ' '))) AS DOUBLE) / count(1) AS avg_words,
        CAST(max(n_chars) AS BIGINT) AS max_chars
      FROM documents
      GROUP BY lang, source
      ORDER BY lang, source""",
    "q43_word_count" -> """
      SELECT word, count(1) AS n
      FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
      GROUP BY word
      ORDER BY n DESC, word
      LIMIT 20""",
    "q44_quality_score" -> """
      SELECT doc_id, lang,
        CAST(n_words AS BIGINT) AS n_words,
        CAST(n_chars - (n_words - 1) AS DOUBLE) / n_words AS avg_word_len,
        CAST(n_stop AS DOUBLE) / n_words AS stop_ratio,
        CAST(n_uniq AS DOUBLE) / n_words AS uniq_ratio,
        CAST(n_stop * 100 / n_words + n_uniq * 100 / n_words AS DOUBLE) AS quality
      FROM (
        SELECT doc_id, lang, n_chars,
          len(toks) AS n_words,
          len(list_filter(toks,
            w -> w IN ('the', 'a', 'of', 'and', 'to', 'in'))) AS n_stop,
          len(list_distinct(toks)) AS n_uniq
        FROM (SELECT doc_id, lang, n_chars,
                string_split(text, ' ') AS toks FROM documents) t) u
      ORDER BY doc_id""",
    "q68_pipeline_prep" -> """
      WITH dd AS (
        SELECT lang, source, text FROM (
          SELECT lang, source, text,
            row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
          FROM documents) t
        WHERE rn = 1),
      g AS (
        SELECT lang, source, text,
          len(string_split(text, ' ')) AS n_words,
          len(list_distinct(string_split(text, ' '))) AS n_uniq
        FROM dd)
      SELECT lang, source, count(1) AS n_docs,
        CAST(sum(n_words) AS BIGINT) AS total_words,
        CAST(sum(len(regexp_extract_all(text, '[a-z]{1,4}'))) AS BIGINT)
          AS total_subtoks
      FROM g
      WHERE n_words >= 5 AND CAST(n_uniq AS DOUBLE) / n_words >= 0.6
      GROUP BY lang, source
      ORDER BY lang, source""",
    "q74_bpe_merges" -> """
      SELECT pair, count(1) AS n
      FROM (
        SELECT unnest(list_transform(generate_series(1, len(w) - 1),
          i -> substring(w, i, 2))) AS pair
        FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents) t
        WHERE len(w) >= 2) p
      GROUP BY pair
      ORDER BY n DESC, pair
      LIMIT 30""",
    "q80_repetition_filter" -> """
      WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      s AS (
        SELECT doc_id, len(toks) AS n,
          len(list_distinct(toks)) AS u,
          list_max(list_transform(list_distinct(toks),
            x -> len(list_filter(toks, y -> y = x)))) AS topc,
          CASE WHEN len(toks) >= 2 THEN
            len(list_transform(generate_series(1, len(toks) - 1),
              i -> toks[i] || ' ' || toks[i + 1])) ELSE 1 END AS nb,
          CASE WHEN len(toks) >= 2 THEN
            len(list_distinct(list_transform(generate_series(1, len(toks) - 1),
              i -> toks[i] || ' ' || toks[i + 1]))) ELSE 1 END AS ub
        FROM t)
      SELECT doc_id, CAST(n AS BIGINT) AS n_words,
        CAST(n - u AS DOUBLE) / n AS dup_tok_frac,
        CAST(topc AS DOUBLE) / n AS top_tok_frac,
        CASE WHEN n >= 2 THEN CAST(nb - ub AS DOUBLE) / nb
             ELSE 0.0 END AS dup_bigram_frac,
        (CAST(topc AS DOUBLE) / n > 0.12 OR
         (CASE WHEN n >= 2 THEN CAST(nb - ub AS DOUBLE) / nb
               ELSE 0.0 END) > 0.10) AS repetitive
      FROM s
      ORDER BY doc_id""",
    "q82_pii_redact" -> """
      WITH r AS (
        SELECT doc_id,
          text || ' contact user' || CAST(doc_id AS VARCHAR)
            || '@mail.example call +1-555-'
            || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS raw
        FROM documents),
      red AS (
        SELECT doc_id, raw,
          regexp_replace(
            regexp_replace(raw, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}',
              '<EMAIL>', 'g'),
            '\+1-555-[0-9]{4}', '<PHONE>', 'g') AS red
        FROM r)
      SELECT doc_id,
        CAST(len(regexp_extract_all(raw,
          '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT) AS n_emails,
        CAST(len(regexp_extract_all(raw, '\+1-555-[0-9]{4}')) AS BIGINT)
          AS n_phones,
        CAST(len(raw) AS BIGINT) AS chars_raw,
        CAST(len(red) AS BIGINT) AS chars_red,
        md5(red) AS digest
      FROM red
      ORDER BY doc_id""",
    "q85_substring_dup" -> """
      WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      g AS (
        SELECT doc_id,
          unnest(list_transform(generate_series(1, len(toks) - 7),
            i -> array_to_string(toks[i:i+7], ' '))) AS gram
        FROM t WHERE len(toks) >= 8)
      SELECT gram, count(DISTINCT doc_id) AS df, count(1) AS occurrences
      FROM g
      GROUP BY gram
      HAVING count(DISTINCT doc_id) >= 2
      ORDER BY df DESC, occurrences DESC, gram
      LIMIT 20""",
    // Parallel unnest of the passage list and generate_series zips them,
    // giving (passage, pos) pairs; list slicing clamps at the tail the
    // same way Spark's slice() does, so segmentation agrees exactly.
    "q148_passage_dedup" -> """
      WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      segs AS (
        SELECT doc_id, s AS pos,
          array_to_string(w[s*8+1 : s*8+8], ' ') AS passage
        FROM t, LATERAL (SELECT unnest(generate_series(0,
          CAST(ceil(len(w) / 8.0) AS INT) - 1))) u(s)),
      hot AS (
        SELECT passage FROM segs GROUP BY passage HAVING count(1) >= 2),
      kept AS (
        SELECT * FROM segs
        WHERE passage NOT IN (SELECT passage FROM hot)),
      agg AS (
        SELECT doc_id, string_agg(passage, ' ' ORDER BY pos) AS clean_text,
          count(1) AS n_kept
        FROM kept GROUP BY doc_id),
      tot AS (
        SELECT doc_id, CAST(ceil(len(w) / 8.0) AS BIGINT) AS n_passages
        FROM t)
      SELECT tot.doc_id AS doc_id, coalesce(clean_text, '') AS clean_text,
        coalesce(n_kept, 0) AS n_kept,
        n_passages - coalesce(n_kept, 0) AS n_dropped
      FROM tot LEFT JOIN agg ON tot.doc_id = agg.doc_id
      ORDER BY doc_id""",
  )
}
