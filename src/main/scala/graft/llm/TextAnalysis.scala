package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Text-analysis operators for large-scale training-data pipelines.
  *
  * All operators are pure Catalyst column expressions (no UDFs): language
  * ID, quality scoring, token counting, and document fingerprinting run
  * inside whole-stage codegen directly over the parquet scan, so a 100 TB
  * corpus pass is one embarrassingly-parallel projection — no shuffle at
  * all until an aggregation is requested.
  *
  * Every function here is deliberately expressible in portable SQL so the
  * DuckDB oracle can check it exactly (see SparkEntry.oracleSql).
  */
object TextAnalysis {

  /** Canonical normalization shared by dedup + fingerprinting:
    * lowercase, collapse whitespace runs, trim. The collapse is a native
    * byte-level expression with identical semantics to
    * `regexp_replace(c, "\\s+", " ")` but without the regex engine in the
    * corpus-wide hot path. */
  def normText(c: Column): Column =
    lower(trim(graft.functions.CollapseWsF.collapseWs(c)))

  /** Stable 128-bit document fingerprint over normalized text. */
  def fingerprint(c: Column): Column = md5(normText(c))

  /** Whitespace tokens (split on single space — matches the corpus format). */
  def wsTokens(c: Column): Column = split(c, " ")

  /** Whitespace token count. */
  def tokenCountWs(c: Column): Column = size(wsTokens(c))

  /** BPE-ish subword token estimate: runs of letters/digits count one per
    * ≤4 chars (a common ~4-chars-per-token heuristic), other glyphs one
    * each. One native code-point scan; semantics identical to counting
    * `[a-z]{1,4}|[A-Z]{1,4}|[0-9]{1,3}|[^A-Za-z0-9\s]` matches (pinned by
    * a property test and the DuckDB oracle). */
  def tokenCountBpe(c: Column): Column =
    graft.functions.BpeF.bpeTokenCount(c)

  /** Small language marker sets (n-gram/stopword heuristic). Order of the
    * argmax tie-break is fixed: en > es > de > fr > und. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a"),
    "es" -> Seq("el", "la", "de", "y", "que"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
  )

  private def markerHits(c: Column, markers: Seq[String]): Column =
    graft.functions.CountInSetF.countInSet(wsTokens(lower(c)), markers)

  /** Heuristic language ID: the language with the most marker-token hits;
    * `und` when no marker appears. */
  def langId(c: Column): Column = {
    val scores = langMarkers.map { case (lang, ms) => lang -> markerHits(c, ms) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und")) { case ((lang, s), els) =>
      when(s === best && s > 0, lit(lang)).otherwise(els)
    }
  }

  /** English stopword ratio — a standard quality-filter signal. */
  val stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "this", "that",
  )

  def stopwordRatio(c: Column): Column = {
    val toks = wsTokens(lower(c))
    (markerCount(toks) / greatest(size(toks), lit(1))).cast(DoubleType)
  }

  private def markerCount(toks: Column): Column =
    graft.functions.CountInSetF.countInSet(toks, stopwords)

  /** Composite quality score in [0,1]: length saturation + stopword signal
    * + alpha ratio. Deterministic; rounded by callers for oracle parity. */
  def qualityScore(text: Column, nChars: Column): Column = {
    val lenScore = least(nChars.cast(DoubleType) / 1000.0, lit(1.0))
    val stopScore = least(stopwordRatio(text) * 4.0, lit(1.0))
    val alphaRatio = length(regexp_replace(text, "[^a-z ]", "")).cast(DoubleType) /
      greatest(length(text), lit(1)).cast(DoubleType)
    lenScore * 0.4 + stopScore * 0.3 + alphaRatio * 0.3
  }

  /** Per-document DEFLATE compression ratio `(id, deflate_ratio)` — the
    * Gopher/MassiveText-family quality signal [[qualityScore]] doesn't
    * see: templated/self-repeating text compresses far below prose (low
    * ratio), high-entropy garbage above it, so curation keeps a band.
    * One row-local native pass ([[graft.functions.DeflateRatio]] —
    * zlib level 6), no shuffle; rounded to 6 for determinism. Not
    * SQL-replayable (no zlib in the oracle engine) — correctness rides
    * a planted ordering contract plus spec-pinned exact values. */
  def compressionStats(df: org.apache.spark.sql.DataFrame, idCol: String,
                       textCol: String): org.apache.spark.sql.DataFrame =
    df.select(col(idCol).as("id"),
      graft.functions.DeflateF.deflateRatio(col(textCol)).as("deflate_ratio"))

  /** Split documents into fixed-size TOKEN chunks — the context-window
    * transform every pre-training pipeline runs before packing. One row
    * per (doc, chunk): `(idCol, chunk_ix, chunk)` where chunk `i` is
    * whitespace tokens `[i·n, (i+1)·n)` re-joined. Pure native column
    * work (`sequence` → `transform`/`slice` → `posexplode`): the split,
    * slicing, and re-join all happen inside one codegen'd projection
    * with NO shuffle — at 100 TB this is a map-only pass whose output
    * partitioning follows the scan. Overlap (a common training trick)
    * via `overlap` > 0: consecutive chunks share that many tokens
    * (stride = n - overlap). Empty documents yield one empty chunk
    * (chunk_ix 0) rather than disappearing — corpus accounting stays
    * row-complete. */
  def chunkTokens(df: org.apache.spark.sql.DataFrame, idCol: String,
                  textCol: String, n: Int, overlap: Int = 0)
      : org.apache.spark.sql.DataFrame = {
    require(n > 0, "chunkTokens: n must be positive")
    require(overlap >= 0 && overlap < n,
      s"chunkTokens: overlap must be in [0, n), got $overlap")
    val stride = n - overlap
    val toks = wsTokens(col(textCol))
    // number of chunks: 1 + ceil(max(len - n, 0) / stride); integer form
    val nChunks = lit(1) + floor(
      (greatest(size(toks) - n, lit(0)) + stride - 1) / lit(stride)).cast("int")
    df.select(col(idCol),
        posexplode(org.apache.spark.sql.functions.transform(
          sequence(lit(0), nChunks - 1),
          i => array_join(slice(toks, i * stride + 1, lit(n)), " "))))
      .withColumnRenamed("pos", "chunk_ix")
      .withColumnRenamed("col", "chunk")
  }

  /** Word n-grams over whitespace tokens: element `i` is tokens
    * `[i, i+n)` space-joined. Documents shorter than `n` tokens yield an
    * EMPTY array (no padded partial grams — both dedup and
    * decontamination semantics want only full windows). Pure column work
    * (`sequence` → `transform`/`slice`), one codegen'd projection. */
  def wordNgrams(c: Column, n: Int): Column = {
    require(n > 0, "wordNgrams: n must be positive")
    val toks = wsTokens(c)
    when(size(toks) >= n,
      org.apache.spark.sql.functions.transform(
        sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + 1, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  /** Benchmark-contamination hits: for every corpus document sharing at
    * least one word `n`-gram (over [[normText]]) with the benchmark set,
    * the count of DISTINCT shared n-grams — the standard eval-set
    * decontamination signal (GPT-3-style n-gram overlap).
    *
    * Scale shape: the benchmark side is an eval set — SMALL by
    * definition — so its distinct n-grams are broadcast. The corpus-side
    * n-gram explode is a map-local flatMap feeding that broadcast hash
    * join directly: nothing shuffles except the (rare) matching rows on
    * their way into the per-document count. A 100 TB corpus pass is one
    * scan-explode-probe projection.
    *
    * Grams travel as xxhash64 values via the native
    * [[graft.functions.ShingleHash]] (one codegen'd pass, already
    * DISTINCT per document — so the post-join agg is a plain count, no
    * count-distinct expand), not as strings: the broadcast table and the
    * join keys are longs. Same negligible-collision argument as the
    * Jaccard shingle join (p ≈ d²/2⁶⁵). */
  def contaminationHits(corpus: org.apache.spark.sql.DataFrame, idCol: String,
                        textCol: String,
                        benchmark: org.apache.spark.sql.DataFrame,
                        benchTextCol: String, n: Int = 8)
      : org.apache.spark.sql.DataFrame = {
    def grams(c: Column): Column =
      graft.functions.ShingleF.shingleHashes(wsTokens(normText(c)), n)
    val benchGrams = benchmark
      .select(explode(grams(col(benchTextCol))).as("gram"))
      .distinct()
    corpus
      .select(col(idCol), explode(grams(col(textCol))).as("gram"))
      .join(broadcast(benchGrams), "gram")
      .groupBy(idCol)
      .agg(count(col("gram")).as("hits"))
  }

  /** [[contaminationHits]] with a BLOOM prefilter for benchmark sets too
    * large to broadcast as a hash table: bench grams aggregate into a
    * serialized bloom filter (numBits/8 bytes — ~1 MB per million grams
    * at 8 bits/item, vs tens of MB for the broadcast join's hash
    * relation), the corpus-side gram stream probes it MAP-SIDE inside
    * the scan projection, and only the surviving candidates (true hits
    * plus the ~2% false positives) reach the exact verify join. Answers
    * are IDENTICAL to [[contaminationHits]] — the verify join removes
    * every false positive; the bloom only shrinks what shuffles.
    *
    * Scale shape at 100 TB: the dominant cost of the exact variant is
    * hashing every corpus gram against a broadcast relation sized by the
    * bench set; here the per-gram probe is a codegen'd bit test against
    * a filter that stays cache-resident, and the verify join input drops
    * from |corpus grams| to |candidates| — contamination is rare by
    * construction, so the join (and its shuffle, when bench outgrows
    * broadcast range) is orders of magnitude smaller. `numBits` is
    * bench-sized, corpus-independent. */
  def contaminationHitsBloom(corpus: org.apache.spark.sql.DataFrame,
                             idCol: String, textCol: String,
                             benchmark: org.apache.spark.sql.DataFrame,
                             benchTextCol: String, n: Int = 8,
                             estBenchGrams: Long = 1L << 20,
                             bitsPerItem: Int = 8)
      : org.apache.spark.sql.DataFrame = {
    require(bitsPerItem >= 2, s"bitsPerItem must be >= 2, got $bitsPerItem")
    def grams(c: Column): Column =
      graft.functions.ShingleF.shingleHashes(wsTokens(normText(c)), n)
    val benchGrams = benchmark
      .select(explode(grams(col(benchTextCol))).as("gram"))
      .distinct()
    // one small aggregation job over the bench side builds the filter;
    // the bytes travel as a BROADCAST, not a plan literal — at real bench
    // sizes (10^8 grams -> ~100 MB filter) a literal would ride inside
    // every serialized task plan, a broadcast ships once per executor
    val bloomBytes = benchGrams
      .agg(graft.functions.BloomFns.bloomAgg(col("gram"),
        estBenchGrams, estBenchGrams * bitsPerItem).as("bf"))
      .head().getAs[Array[Byte]](0)
    val bloomBcast = graft.functions.BloomFns.broadcastBloom(
      corpus.sparkSession, bloomBytes)
    corpus
      .select(col(idCol), explode(grams(col(textCol))).as("gram"))
      .filter(graft.functions.BloomFns.bloomMightContain(bloomBcast,
        col("gram")))
      // exact verify: false positives die here; deliberately NOT forced
      // to broadcast — when the bench set is broadcast-sized Catalyst
      // broadcasts it anyway, and when it isn't (the bloom variant's
      // reason to exist) the shuffle carries only candidates
      .join(benchGrams, "gram")
      .groupBy(idCol)
      .agg(count(col("gram")).as("hits"))
  }

  /** Remove benchmark-contaminated documents: corpus rows sharing NO word
    * `n`-gram with the benchmark set. One anti-join against the (small)
    * contaminated-id set on top of [[contaminationHits]]. */
  def decontaminate(corpus: org.apache.spark.sql.DataFrame, idCol: String,
                    textCol: String,
                    benchmark: org.apache.spark.sql.DataFrame,
                    benchTextCol: String, n: Int = 8)
      : org.apache.spark.sql.DataFrame =
    corpus.join(
      contaminationHits(corpus, idCol, textCol, benchmark, benchTextCol, n)
        .select(col(idCol)),
      Seq(idCol), "left_anti")

  /** [[decontaminate]] through the bloom-prefiltered hit pass — same
    * answers, bench-scalable. */
  def decontaminateBloom(corpus: org.apache.spark.sql.DataFrame,
                         idCol: String, textCol: String,
                         benchmark: org.apache.spark.sql.DataFrame,
                         benchTextCol: String, n: Int = 8,
                         estBenchGrams: Long = 1L << 20,
                         bitsPerItem: Int = 8)
      : org.apache.spark.sql.DataFrame =
    corpus.join(
      contaminationHitsBloom(corpus, idCol, textCol, benchmark,
        benchTextCol, n, estBenchGrams, bitsPerItem)
        .select(col(idCol)),
      Seq(idCol), "left_anti")

  /** SURGICAL decontamination: instead of dropping a contaminated
    * document ([[decontaminate]]), delete just the tokens covered by any
    * `n`-gram shared with the benchmark set and keep the rest — the span
    * treatment for docs that merely QUOTE an eval item (a leaked answer
    * inside an otherwise-good document). Every input row survives;
    * output (id, clean_text, n_kept), like [[removeDupSpans]] with the
    * benchmark as the dup set.
    *
    * Matching is on LOWERCASED whitespace tokens — per-token
    * normalization, not [[normText]], because span positions must map
    * back to the RAW token array for reconstruction (whitespace
    * collapsing would shift them). Scale shape: the bench gram-hash set
    * broadcasts (eval sets are small), the corpus side is one row-local
    * hash pass + a map-side broadcast join for start positions + the
    * same higher-order coverage rebuild as [[removeDupSpans]]; one left
    * join on the id, nothing quadratic, all integer/string — the DuckDB
    * oracle re-derives spans from gram strings. */
  def scrubContamSpans(corpus: org.apache.spark.sql.DataFrame, idCol: String,
                       textCol: String,
                       benchmark: org.apache.spark.sql.DataFrame,
                       benchTextCol: String, n: Int = 8)
      : org.apache.spark.sql.DataFrame = {
    require(n >= 1, s"scrubContamSpans: n must be >= 1, got $n")
    def lowToks(c: Column): Column =
      org.apache.spark.sql.functions.transform(wsTokens(c), t => lower(t))
    val benchGrams = benchmark
      .select(explode(graft.functions.ShingleF.shingleHashes(
        lowToks(col(benchTextCol)), n)).as("h"))
      .distinct()
    val base = corpus.select(col(idCol), wsTokens(col(textCol)).as("toks"),
      graft.functions.ShingleF.shingleHashesAll(lowToks(col(textCol)), n)
        .as("hs"))
    val wc = base.select(col(idCol), posexplode(col("hs")).as(Seq("pos", "h")))
    val starts = wc.join(broadcast(benchGrams), "h")
      .groupBy(col(idCol)).agg(collect_list(col("pos")).as("starts"))
    // native O(tokens + starts) coverage sweep (graft.functions
    // .CoverageKeep) — a higher-order exists() here rescans the start
    // list per token, quadratic on a fully-quoted document
    val kept = graft.functions.CoverageF.coverageKeep(
      col("toks"), col("starts"), n)
    base.join(starts, Seq(idCol), "left")
      .select(col(idCol),
        // coalesce matches the oracle's NULL-text rendering ('' text)
        coalesce(when(col("starts").isNull, array_join(col("toks"), " "))
          .otherwise(array_join(kept, " ")), lit("")).as("clean_text"),
        when(col("starts").isNull, size(col("toks")))
          .otherwise(size(kept)).cast("long").as("n_kept"))
  }

  /** Duplicate-token fraction (a Gopher-style repetition signal):
    * `1 - distinct_tokens / tokens`, 0 for empty text. Row-local. */
  def dupTokenFrac(c: Column): Column = {
    val toks = wsTokens(c)
    lit(1.0) - size(array_distinct(toks)).cast(DoubleType) /
      greatest(size(toks), lit(1)).cast(DoubleType)
  }

  /** Share of the most frequent word bigram among all bigrams (the
    * Gopher `top-2-gram` repetition signal); 0 when the document has no
    * bigram. Row-local O(distinct·total) over one document's bigrams —
    * bounded by document length, stays inside the same codegen'd
    * projection as every other signal here. */
  def topBigramShare(c: Column): Column = {
    val grams = wordNgrams(c, 2)
    when(size(grams) === 0, lit(0.0)).otherwise(
      array_max(org.apache.spark.sql.functions.transform(
        array_distinct(grams),
        g => size(org.apache.spark.sql.functions.filter(grams, x => x === g))))
        .cast(DoubleType) / size(grams).cast(DoubleType))
  }

  /** The PII patterns [[scrubPii]] redacts, in application order, with
    * their placeholders. Deliberately restricted to syntax shared by
    * Java's regex and RE2 (no lookaround, no backrefs) so the DuckDB
    * oracle runs the IDENTICAL patterns: emails first (their local parts
    * contain digit runs the later patterns would chew), then IPv4, then
    * the two phone shapes (NANP-dashed and a bare international digit
    * run — long enough that years/quantities never match). */
  val piiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b" -> "<IP>",
    "\\b[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}\\b" -> "<PHONE>",
    "\\+[0-9]{9,15}\\b" -> "<PHONE>")

  /** Redact common PII shapes (emails, IPv4 addresses, phone numbers)
    * with typed placeholders — the standard pre-training hygiene pass.
    * Chained native `regexp_replace` columns: codegen'd, zero shuffle,
    * one projection over the corpus scan like every operator here. */
  def scrubPii(c: Column): Column =
    piiPatterns.foldLeft(c) { case (acc, (pat, repl)) =>
      regexp_replace(acc, pat, repl)
    }

  /** CCNet-style unigram language-model scoring: train an add-one-
    * smoothed unigram LM on the corpus itself and score every document by
    * its per-token cross-entropy `-Σ tf(w)·ln p(w) / Σ tf(w)` where
    * `p(w) = (c(w)+1)/(N+V)`. Documents full of rare/garbled tokens score
    * high; formulaic boilerplate scores low — both tails are the usual
    * filter targets.
    *
    * Scale shape: tokens pre-aggregate to per-document term frequencies
    * BEFORE any shuffle (the `(id, w)` groupBy does map-side combine), so
    * stopword skew shuffles one row per (doc, word), not one per token.
    * The vocab table and its one-row (N, V) total stay a plan-internal
    * aggregate — no driver collect — and the tf⋈vocab join is a plain
    * shuffle join on the word (the only unavoidable wide exchange; AQE
    * handles residual skew). Output: (id, xent) — one row per document
    * with at least one token. */
  def lmUnigramScore(df: org.apache.spark.sql.DataFrame, idCol: String,
                     textCol: String): org.apache.spark.sql.DataFrame = {
    // NOTE on shape (round-21 measurement): materializing the vocab
    // model table once (localCheckpoint) was tried and REVERTED — the
    // checkpoint boundary plans its subtree eagerly, opts it out of AQE,
    // and serializes the plan's branches, costing more wall than the
    // duplicated corpus explode it saved. The branches below recompute
    // tf/vocab lineage per consumer by design; they overlap across
    // idle cores.
    val tf = df
      .select(col(idCol), explode(wsTokens(col(textCol))).as("w"))
      .groupBy(col(idCol), col("w")).agg(count(lit(1)).as("tf"))
    val vocab = tf.groupBy(col("w")).agg(sum(col("tf")).as("c"))
    val tot = vocab.agg(sum(col("c")).as("n"), count(lit(1)).as("v"))
    tf.join(vocab, "w")
      .crossJoin(broadcast(tot))
      .groupBy(col(idCol))
      .agg(round(-sum(col("tf") *
          log((col("c") + 1.0) / (col("n") + col("v")))) /
        sum(col("tf")), 6).as("xent"))
  }

  /** Interpolated BIGRAM cross-entropy — the next step up from
    * [[lmUnigramScore]] on the CCNet-style quality ladder: per-token
    * probability `λ·P_bi(w|prev) + (1-λ)·P_uni(w)` over the bigram
    * positions (i ≥ 2), with `P_bi = c(prev,w)/c(prev)` (MLE, zeros
    * covered by the unigram interpolation) and the same add-one unigram
    * `P_uni = (c+1)/(N+V)` as the unigram scorer. `c(prev)` is the
    * corpus UNIGRAM count of the context token — the standard
    * approximation (prefix counts differ from unigram counts only at
    * document-final tokens), applied identically in the DuckDB oracle so
    * both engines evaluate one formula. Docs with fewer than two tokens
    * have no bigram positions and emit no row.
    *
    * Scale shape: bigram tf pre-aggregates map-side per (doc, prev, w);
    * the corpus bigram table derives FROM that same aggregate (one
    * corpus scan, like tfidf's df-from-tf); two joins against the
    * unigram vocab (term-keyed exchanges) and one broadcast totals join.
    * No collect, no window, no driver state — the LM "model" stays
    * distributed. */
  def lmBigramScore(df: org.apache.spark.sql.DataFrame, idCol: String,
                    textCol: String,
                    lambda: Double = 0.7): org.apache.spark.sql.DataFrame = {
    require(lambda > 0 && lambda < 1,
      s"lmBigramScore: lambda must be in (0,1), got $lambda")
    val toks = wsTokens(col(textCol))
    // guard BEFORE sequence(): Spark's sequence(0, -1) descends, so a
    // single-token doc would index element 0 instead of yielding nothing
    // adjacent pairs via two slices + arrays_zip — all codegen'd array
    // copies; the transform(sequence(...)) form this replaces is a
    // higher-order function, which Spark evaluates interpreted
    // (CodegenFallback) with a boxed lambda call per token
    val bi = df.filter(size(toks) >= 2)
      .select(col(idCol), explode(arrays_zip(
        slice(toks, lit(1), size(toks) - 1).as("p"),
        slice(toks, lit(2), size(toks) - 1).as("w"))).as("bg"))
      .select(col(idCol), col("bg.p").as("p"), col("bg.w").as("w"))
    import org.apache.spark.sql.expressions.Window
    val tf2 = bi.groupBy(col(idCol), col("p"), col("w"))
      .agg(count(lit(1)).as("tf2"))
      // c(p,w) as a window over the SAME (p,w)-keyed table instead of a
      // second corpus aggregation joined back: one exchange, no rescan,
      // identical integer sums (guide §2.4). The window partitions by a
      // high-cardinality bigram key — fully parallel at any scale.
      .withColumn("cb",
        sum(col("tf2")).over(Window.partitionBy(col("p"), col("w"))))
    // the unigram table recomputes per consumer (cp, cw, totals) by
    // design — a localCheckpoint here was tried and reverted (see
    // lmUnigramScore); the branches overlap across idle cores
    val uni = df.select(explode(toks).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("c"))
    val tot = uni.agg(sum(col("c")).as("n"), count(lit(1)).as("v"))
    tf2
      .join(uni.select(col("t").as("p"), col("c").as("cp")), Seq("p"))
      .join(uni.select(col("t").as("w"), col("c").as("cw")), Seq("w"))
      .crossJoin(broadcast(tot))
      .groupBy(col(idCol))
      .agg(round(-sum(col("tf2") *
          log(lit(lambda) * col("cb") / col("cp") +
            lit(1.0 - lambda) * (col("cw") + 1.0) / (col("n") + col("v")))) /
        sum(col("tf2")), 6).as("xent2"))
  }

  /** Unicode-SCRIPT composition of a document's letters — the signal
    * behind script-based corpus filtering (keep Latin, route Han to the
    * zh pipeline, drop mixed-script spam): per-script letter shares over
    * the total letter count. Row-local regexp counts (codegen'd, one
    * scan); rounded 6 for oracle parity. Docs with no letters report
    * zero shares. The script classes render as `\p{IsX}` in Java and
    * `\p{X}` in RE2 — same character sets for these five majors. */
  def scriptShares(df: org.apache.spark.sql.DataFrame, idCol: String,
                   textCol: String): org.apache.spark.sql.DataFrame = {
    val c = col(textCol)
    val nLetters = regexp_count(c, lit("\\p{L}"))
    def share(cls: String): Column =
      round(regexp_count(c, lit(s"[\\p{Is$cls}]")).cast(DoubleType) /
        greatest(nLetters, lit(1)).cast(DoubleType), 6)
    df.select(col(idCol).as("id"), nLetters.cast("long").as("n_letters"),
      share("Latin").as("latin_share"),
      share("Cyrillic").as("cyrillic_share"),
      share("Han").as("han_share"),
      share("Arabic").as("arabic_share"),
      share("Greek").as("greek_share"))
  }

  /** HTML → text extraction (the first step of every web-corpus
    * pipeline): strip `<script>`/`<style>` elements WITH their content
    * (markup text is not content), drop comments, replace every
    * remaining tag with a space, decode the entity set every generator
    * emits (`&amp;` LAST, so double-encoded entities resolve one level,
    * the standard rule), collapse whitespace. Pure regexp_replace /
    * replace chain — row-local, codegen'd, no parser state; a scan-time
    * projection at any corpus size. Case is preserved (normalization is
    * a separate, later stage). */
  def extractHtmlText(c: Column): Column = {
    import org.apache.spark.sql.functions.{replace => strReplace}
    val noScript = regexp_replace(c, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]*>", " ")
    val decoded = strReplace(
      strReplace(
        strReplace(
          strReplace(
            strReplace(
              strReplace(noTags, lit("&nbsp;"), lit(" ")),
              lit("&lt;"), lit("<")),
            lit("&gt;"), lit(">")),
          lit("&quot;"), lit("\"")),
        lit("&#39;"), lit("'")),
      lit("&amp;"), lit("&"))
    trim(graft.functions.CollapseWsF.collapseWs(decoded))
  }

  /** BLOCK-aware HTML extraction: like [[extractHtmlText]] but
    * block-closing tags (`</p> </div> </li> </h1..6> </tr> </article>
    * </section> </aside> </ul> </ol> </table> </blockquote>` and `<br>`)
    * become NEWLINES, so the document's paragraph structure survives —
    * the rendering [[dedupLines]] needs to scrub per-block boilerplate
    * (nav text, subscribe prompts) that whole-document extraction would
    * fuse into one line. Inline tags become spaces; horizontal
    * whitespace collapses per line; blank lines drop. Pure
    * regexp_replace chain — row-local, codegen'd. */
  def extractHtmlBlocks(c: Column): Column = {
    import org.apache.spark.sql.functions.{replace => strReplace}
    val noScript = regexp_replace(c, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val blocks = regexp_replace(noComment,
      "(?i)</(p|div|li|h[1-6]|tr|article|section|aside|ul|ol|table|blockquote)>|<br\\s*/?>",
      "\n")
    val noTags = regexp_replace(blocks, "<[^>]*>", " ")
    val decoded = strReplace(
      strReplace(
        strReplace(
          strReplace(
            strReplace(
              strReplace(noTags, lit("&nbsp;"), lit(" ")),
              lit("&lt;"), lit("<")),
            lit("&gt;"), lit(">")),
          lit("&quot;"), lit("\"")),
        lit("&#39;"), lit("'")),
      lit("&amp;"), lit("&"))
    // collapse horizontal whitespace per line, strip line-edge spaces,
    // fold blank lines, trim the document edges — all regex, no HOFs
    val hCollapsed = regexp_replace(decoded, "[ \\t\\x0B\\f\\r]+", " ")
    val edge = regexp_replace(hCollapsed, " ?\\n ?", "\n")
    val folded = regexp_replace(edge, "\\n+", "\n")
    trim(folded, " \n")
  }

  /** Corpus-wide LINE-level exact dedup — the C4 move: a line whose
    * normalized form occurs anywhere else in the corpus survives only at
    * its FIRST occurrence (min (doc, line index) — deterministic, unlike
    * C4's random keep), every other copy is dropped and each document is
    * re-assembled from its surviving lines in order. Catches the
    * boilerplate (nav bars, cookie banners, footers) that document-level
    * dedup can never see. Whitespace-only lines are exempt (they carry
    * layout, not content, and would all collapse to one).
    *
    * Returns `(id, n_lines, n_kept, clean_text)`.
    *
    * Scale shape: one explode, ONE line-keyed aggregation (keyed on the
    * md5 of the normalized line — fixed-width shuffle keys, the
    * window_dupes posture; DuckDB's oracle keeps the raw strings), one
    * join back, one per-doc reassembly aggregation ordered by
    * `sort_array` (no window). Line text crosses the wire exactly twice
    * — the theoretical minimum for a reassembling dedup. */
  def dedupLines(df: org.apache.spark.sql.DataFrame, idCol: String,
                 textCol: String,
                 sep: String = "\n"): org.apache.spark.sql.DataFrame = {
    require(sep.nonEmpty, "dedupLines: separator must be non-empty")
    val lines = df.select(col(idCol).as("id"),
      posexplode(split(col(textCol),
        java.util.regex.Pattern.quote(sep))).as(Seq("idx", "line")))
    val withFp = lines.withColumn("__fp",
      when(normText(col("line")) === "", lit(null))
        .otherwise(md5(normText(col("line")))))
    val firstOcc = withFp.filter(col("__fp").isNotNull)
      .groupBy(col("__fp"))
      .agg(min(struct(col("id"), col("idx"))).as("__keep"))
    withFp.join(firstOcc, Seq("__fp"), "left")
      .withColumn("__kept", col("__fp").isNull ||
        (col("__keep.id") === col("id") && col("__keep.idx") === col("idx")))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_lines"),
        sum(col("__kept").cast("long")).as("n_kept"),
        array_join(org.apache.spark.sql.functions.transform(
          sort_array(collect_list(when(col("__kept"),
            struct(col("idx"), col("line"))))),
          s => s.getField("line")), sep).as("clean_text"))
  }

  /** Interpolated Kneser-Ney bigram cross-entropy — the smoothing the
    * CCNet/KenLM quality ladder actually ships (Kneser & Ney ICASSP'95;
    * Chen & Goodman '98 eq. 4.26, bigram order): per bigram position
    * `P_KN(w|p) = max(c(p,w) - D, 0)/c(p) + D·N1+(p,·)/c(p) · P_cont(w)`
    * with the CONTINUATION unigram `P_cont(w) = N1+(·,w)/N1+(·,·)` —
    * the count of distinct contexts w follows, not its raw frequency,
    * which is what separates KN from the naive interpolation of
    * [[lmBigramScore]] (a word frequent only inside one collocation
    * stops soaking up unigram mass). `c(p)` is the corpus unigram count
    * of the context, the same documented approximation as
    * [[lmBigramScore]], applied identically in the oracle. Docs with
    * fewer than two tokens emit no row.
    *
    * Scale shape: identical to [[lmBigramScore]] — the two extra
    * statistics (N1+(p,·), N1+(·,w)) derive FROM the bigram-type table
    * with one groupBy each and ride the SAME p-/w-keyed exchanges the
    * cp/continuation joins already make; N1+(·,·) is a one-row
    * broadcast. No collect, no window, the model stays distributed. */
  def lmKneserNeyScore(df: org.apache.spark.sql.DataFrame, idCol: String,
                       textCol: String,
                       discount: Double = 0.75): org.apache.spark.sql.DataFrame = {
    require(discount > 0 && discount < 1,
      s"lmKneserNeyScore: discount must be in (0,1), got $discount")
    val toks = wsTokens(col(textCol))
    val bi = df.filter(size(toks) >= 2)
      .select(col(idCol), explode(arrays_zip(
        slice(toks, lit(1), size(toks) - 1).as("p"),
        slice(toks, lit(2), size(toks) - 1).as("w"))).as("bg"))
      .select(col(idCol), col("bg.p").as("p"), col("bg.w").as("w"))
    val tf2 = bi.groupBy(col(idCol), col("p"), col("w"))
      .agg(count(lit(1)).as("tf2"))
    // Every bigram statistic derives from tf2's OWN exchange chain as a
    // window instead of a re-aggregated table joined back (round 22;
    // guide §2.4 — operations keyed the same way share one exchange).
    // The former shape built cb/n1p/n1w/nbt as four groupBys OFF the cb
    // subtree and joined them back: AQE declines to reuse those stages,
    // so the corpus bigram explode re-executed once per statistic (~6
    // corpus scans, 5 joins). Here: `cb` is a sum over tf2's (p,w)
    // window; `one` marks exactly one row per (p,w) TYPE (row_number
    // ties broken by id — any single marker row gives the same sum), so
    // type counts are marker sums over the p-keyed window (n1p) and the
    // w-keyed table below (n1w). One corpus bigram pass, one linear
    // pipeline, no checkpoint boundary (the round-21 revert shape is
    // not involved). All counts stay exact integers cast to double at
    // the same points, and the probability expression is untouched —
    // scores are bit-identical.
    import org.apache.spark.sql.expressions.Window
    val wpw = Window.partitionBy(col("p"), col("w"))
    val wp = Window.partitionBy(col("p"))
    val scored = tf2
      .withColumn("cb", sum(col("tf2")).over(wpw))
      .withColumn("one",
        when(row_number().over(wpw.orderBy(col(idCol))) === 1, lit(1L))
          .otherwise(lit(0L)))
      .withColumn("n1p", sum(col("one")).over(wp).cast("double"))
    // distinct contexts per word + the global type total: one
    // vocabulary-sized table off ONE more bigram pass; nbt rides it as
    // a constant-key window sum (the Dsir.fit idiom — non-foldable key,
    // driver-scale input by design), so the total needs no extra pass
    // and no crossJoin of a scalar aggregate
    val n1wNbt = bi.groupBy(col("w")).agg(count_distinct(col("p")).as("n1c"))
      .select(col("w"), col("n1c").cast("double").as("n1w"),
        sum(col("n1c")).over(Window.partitionBy(pmod(col("n1c"), lit(1))))
          .cast("double").as("nbt"))
    val uni = df.select(explode(toks).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("c"))
    val d = discount
    scored
      .join(uni.select(col("t").as("p"), col("c").as("cp")), Seq("p"))
      .join(n1wNbt, Seq("w"))
      .groupBy(col(idCol))
      .agg(round(-sum(col("tf2") * log(
          greatest(col("cb") - lit(d), lit(0.0)) / col("cp") +
            lit(d) * col("n1p") / col("cp") * (col("n1w") / col("nbt")))) /
        sum(col("tf2")), 6).as("xent_kn"))
  }

  /** TRIGRAM interpolated Kneser–Ney cross-entropy (Chen & Goodman
    * 1998, the recursion KenLM/CCNet ship at order 5 — order 3 here
    * exercises the full backoff chain): per-doc
    * `xent_kn3 = -Σ tf₃·ln P(w|u,v) / Σ tf₃` over trigram positions
    * with
    *
    *   P(w|u,v) = max(c(uvw)−D,0)/c(uv)
    *              + D·N1+(uv·)/c(uv) · P₂(w|v)
    *   P₂(w|v)  = max(N1+(·vw)−D,0)/N1+(·v·)
    *              + D·N1+(v·)/N1+(·v·) · P_cont(w)
    *   P_cont(w) = N1+(·w)/N_bt
    *
    * — the middle order runs on CONTINUATION (type) counts, not token
    * counts: a word frequent only inside one collocation stops soaking
    * probability mass at every backoff level, not just the last.
    *
    * Every statistic is one aggregation off the trigram-type or
    * bigram-type table (each built from ONE corpus explode); totals
    * broadcast; no collect — the LM stays distributed at any corpus
    * size, the [[lmKneserNeyScore]] shape one order deeper. Docs with
    * fewer than 3 tokens emit no row. Scoring the training corpus means
    * every trigram has support — no zero-probability edge. Rounded 6;
    * the oracle renders the SAME formula literal-for-literal. */
  def lmKneserNey3Score(df: org.apache.spark.sql.DataFrame, idCol: String,
                        textCol: String,
                        discount: Double = 0.75): org.apache.spark.sql.DataFrame = {
    require(discount > 0 && discount < 1,
      s"lmKneserNey3Score: discount must be in (0,1), got $discount")
    val toks = wsTokens(col(textCol))
    val tri = df.filter(size(toks) >= 3)
      .select(col(idCol), explode(arrays_zip(
        slice(toks, lit(1), size(toks) - 2).as("u"),
        slice(toks, lit(2), size(toks) - 2).as("v"),
        slice(toks, lit(3), size(toks) - 2).as("w"))).as("tg"))
      .select(col(idCol), col("tg.u").as("u"), col("tg.v").as("v"),
        col("tg.w").as("w"))
    val tf3 = tri.groupBy(col(idCol), col("u"), col("v"), col("w"))
      .agg(count(lit(1)).as("tf3"))
    // NOTE (round-21): lazily checkpointing c3/cb (each feeds four
    // consumers) was tried and REVERTED — the checkpoint boundary
    // plans its subtree eagerly, opts it out of AQE, and serializes
    // the branches. Round 22 removes the multi-consumption itself
    // instead (guide §2.4, the lmBigramScore/lmKneserNeyScore window
    // posture): every TRIGRAM statistic now derives from tf3's own
    // exchange chain — `c3` as a (u,v,w)-window sum, the type counts
    // as sums of a one-row-per-type marker over the (v,w)/(v)/(u,v)
    // windows — so the trigram explode and its aggregations execute
    // exactly ONCE in one linear pipeline (formerly: the c3 subtree
    // re-executed for each of its four consumers — 66 Exchanges / ~10
    // corpus passes in the executed plan, the board's worst shape).
    // No checkpoint boundary, no broadcast branches. Counts stay exact
    // integers cast to double at the same points; the probability
    // expression is untouched — scores are bit-identical.
    import org.apache.spark.sql.expressions.Window
    val wuvw = Window.partitionBy(col("u"), col("v"), col("w"))
    val trig = tf3
      .withColumn("c3", sum(col("tf3")).over(wuvw))
      .withColumn("one",
        when(row_number().over(wuvw.orderBy(col(idCol))) === 1, lit(1L))
          .otherwise(lit(0L)))
      .withColumn("nmid_vw", sum(col("one"))
        .over(Window.partitionBy(col("v"), col("w"))).cast("double"))
      .withColumn("nmid_v", sum(col("one"))
        .over(Window.partitionBy(col("v"))).cast("double"))
      // last window keyed (u,v): the cuv join below requires exactly
      // that partitioning, so it adds no exchange on the big side
      .withColumn("n1p_uv", sum(col("one"))
        .over(Window.partitionBy(col("u"), col("v"))).cast("double"))
    val bi = df.filter(size(toks) >= 2)
      .select(explode(arrays_zip(
        slice(toks, lit(1), size(toks) - 1).as("p"),
        slice(toks, lit(2), size(toks) - 1).as("q"))).as("bg"))
      .select(col("bg.p").as("p"), col("bg.q").as("q"))
    // BIGRAM statistics are not derivable from the trigram rows (a
    // document's final bigram heads no trigram), so the bigram explode
    // feeds three one-aggregation tables — count, distinct-continuation,
    // distinct-context — each a single map+aggregate corpus pass (the
    // former shape aggregated all of them off one cb table whose
    // subtree re-executed per consumer, plus a fourth pass for the
    // scalar total; nbt now rides the vocabulary-sized n1w table as a
    // constant-key window sum, the Dsir.fit idiom)
    val cuv = bi.groupBy(col("p"), col("q")).agg(count(lit(1)).as("cuv"))
      .select(col("p").as("u"), col("q").as("v"), col("cuv"))
    val n1After = bi.groupBy(col("p"))
      .agg(count_distinct(col("q")).cast("double").as("n1after"))
      .select(col("p").as("v"), col("n1after"))
    val n1wNbt = bi.groupBy(col("q")).agg(count_distinct(col("p")).as("n1c"))
      .select(col("q").as("w"), col("n1c").cast("double").as("n1w"),
        sum(col("n1c")).over(Window.partitionBy(pmod(col("n1c"), lit(1))))
          .cast("double").as("nbt"))
    val d = discount
    val prob =
      greatest(col("c3") - lit(d), lit(0.0)) / col("cuv") +
        lit(d) * col("n1p_uv") / col("cuv") * (
          greatest(col("nmid_vw") - lit(d), lit(0.0)) / col("nmid_v") +
            lit(d) * col("n1after") / col("nmid_v") * (col("n1w") / col("nbt")))
    trig
      .join(cuv, Seq("u", "v"))
      .join(n1After, Seq("v"))
      .join(n1wNbt, Seq("w"))
      .groupBy(col(idCol))
      .agg(round(-sum(col("tf3") * log(prob)) / sum(col("tf3")), 6)
        .as("xent_kn3"))
  }

  /** Feature-hashing text embedding (the "hashing trick"): each document
    * becomes an L2-normalized `dim`-dimensional count vector of its
    * token hash buckets — a model-free representation that drops
    * text-only corpora straight into the existing vector machinery
    * (cosine pairs, semantic dedup, the ANN index lifecycle). Collisions
    * are the known trade (two tokens sharing a bucket add), standard for
    * the technique (Weinberger et al., ICML'09).
    *
    * ENGINE-EXACT by construction: the bucket is the md5-prefix hash
    * [[graft.llm.Sampling.hashBucketStr]] renders identically in DuckDB,
    * counts are integers, and the only float op is the final normalize
    * (sqrt of an integer sum of squares), rounded to 6. Shape: one
    * token explode → map-side-combined (id, bucket) count → one per-doc
    * reassembly aggregation; the dense fill is a row-local `transform`
    * over a `map_from_entries` lookup — no per-dimension joins, no
    * UDFs. Docs with no tokens produce no row (no signal, like
    * [[graft.llm.Dedup.shingleDf]]). Returns (id, vec array<double>). */
  def hashEmbed(df: org.apache.spark.sql.DataFrame, idCol: String,
                textCol: String, dim: Int = 64,
                seed: Long = 7L): org.apache.spark.sql.DataFrame = {
    require(dim > 0, s"hashEmbed: dim must be positive, got $dim")
    val bucket = pmod(
      conv(substring(md5(concat(col("__tok"), lit("|" + seed))), 1, 15), 16, 10)
        .cast("long"), lit(dim.toLong))
    df.select(col(idCol), explode(wsTokens(normText(col(textCol)))).as("__tok"))
      .select(col(idCol), bucket.as("__b"))
      .groupBy(idCol, "__b").agg(count(lit(1)).as("__c"))
      .groupBy(idCol)
      .agg(map_from_entries(collect_list(struct(col("__b"), col("__c")))).as("__m"),
        sum(col("__c") * col("__c")).as("__ss"))
      .select(col(idCol),
        org.apache.spark.sql.functions.transform(
          sequence(lit(0L), lit(dim - 1L)),
          d => round(coalesce(element_at(col("__m"), d), lit(0L))
            .cast("double") / sqrt(col("__ss").cast("double")), 6)).as("vec"))
  }

  /** Collocations: the top-K adjacent word pairs by pointwise mutual
    * information — the corpus-analysis lens for multiword terms ("new
    * york", "machine learning") that unigram statistics miss.
    * `PMI(a,b) = ln(P(a,b) / (P(a)·P(b)))` with `P(a,b) = n_pair/N_bi`
    * over bigram events and `P(a) = c_a/N_uni` over unigram events —
    * the standard estimator; `minCount` drops the unstable low-support
    * tail PMI notoriously inflates.
    *
    * Scale shape: bigram counts pre-aggregate map-side off the same
    * one-pass token explode the LM family uses; the two unigram joins
    * exchange on the token; the scalar totals broadcast; and the top-K
    * plans as TakeOrderedAndProject (per-partition bounded heap, K-row
    * driver merge — never a global sort). Ordering on the ROUNDED pmi
    * then (p, w) makes the boundary of the top-K set engine-exact. */
  def collocations(df: org.apache.spark.sql.DataFrame, textCol: String,
                   minCount: Int = 5, topK: Int = 100): org.apache.spark.sql.DataFrame = {
    require(minCount >= 1, s"collocations: minCount must be >= 1, got $minCount")
    require(topK > 0, s"collocations: topK must be positive, got $topK")
    val toks = wsTokens(normText(col(textCol)))
    val uni = df.select(explode(toks).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    // codegen'd slices + arrays_zip, not a CodegenFallback transform —
    // see the same swap in lmBigramScore
    val biAll = df.filter(size(toks) >= 2)
      .select(explode(arrays_zip(
        slice(toks, lit(1), size(toks) - 1).as("p"),
        slice(toks, lit(2), size(toks) - 1).as("w"))).as("bg"))
      .select(col("bg.p").as("p"), col("bg.w").as("w"))
      .groupBy("p", "w").agg(count(lit(1)).as("n_pair"))
    // totals over the UNFILTERED universes (minCount prunes candidates,
    // not the probability space)
    val tot = uni.agg(sum(col("c")).as("nu"))
      .crossJoin(biAll.agg(sum(col("n_pair")).as("nb")))
    biAll.filter(col("n_pair") >= minCount)
      .join(uni.select(col("w").as("p"), col("c").as("cp")), Seq("p"))
      .join(uni.select(col("w"), col("c").as("cw")), Seq("w"))
      .crossJoin(broadcast(tot))
      .withColumn("pmi", round(log(
        col("n_pair").cast("double") * col("nu") * col("nu") /
          (col("nb").cast("double") * col("cp") * col("cw"))), 6))
      .select("p", "w", "n_pair", "pmi")
      .orderBy(col("pmi").desc, col("p"), col("w"))
      .limit(topK)
  }

  /** Corpus vocabulary: the `topV` most frequent whitespace tokens over
    * [[normText]], with counts and a deterministic dense rank (count
    * desc, token asc — ties never reorder between runs or engines).
    *
    * Scale shape: explode → map-side-combined count per token → global
    * top-V via `orderBy(…).limit(V)`, which Spark executes as
    * TakeOrderedAndProject — a per-partition bounded heap plus one
    * V-row driver merge, NOT a global sort. The rank window then runs
    * over V rows only (V is vocab-sized: thousands), so its single
    * partition is bounded by the limit, never by the corpus. */
  def vocabulary(df: org.apache.spark.sql.DataFrame, textCol: String,
                 topV: Int = 1000): org.apache.spark.sql.DataFrame = {
    require(topV > 0, s"vocabulary: topV must be positive, got $topV")
    val counts = df
      .select(explode(wsTokens(normText(col(textCol)))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w").asc)
      .limit(topV)
    // the rank runs over the already-limit(topV)-bounded frame; the
    // non-foldable constant key (the shardAssign idiom) documents the
    // by-construction single partition instead of warning about it
    counts.withColumn("rnk",
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy(pmod(col("cnt"), lit(1)))
        .orderBy(col("cnt").desc, col("w").asc)).cast("long"))
  }

  /** Tokenize to vocabulary ids — the step that turns a cleaned corpus
    * into model input: each normalized whitespace token maps to its
    * [[vocabulary]] rank (1-based; OOV → 0), order preserved. Returns
    * `(id, n_tok, ids_str)` with the id sequence rendered as a
    * comma-joined string (arrays don't survive the driver's compare —
    * and a training writer would keep the array column anyway; this is
    * the audit-friendly rendering).
    *
    * Scale shape: posexplode (map-local), one BROADCAST join against the
    * vocab (top-V is dim-sized by construction), then one groupBy(id)
    * reassembly whose ordering is `sort_array(struct(pos, tid))` —
    * engine-exact, no window. The vocab frame is whatever `(w, rnk)`
    * mapping the caller trains — [[vocabulary]] output works verbatim,
    * and a frozen production vocab table works the same way. */
  def tokenizeIds(df: org.apache.spark.sql.DataFrame, idCol: String,
                  textCol: String,
                  vocab: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val toks = df.select(col(idCol),
      posexplode(wsTokens(normText(col(textCol)))).as(Seq("pos", "w")))
    toks.join(broadcast(vocab.select(col("w"), col("rnk"))), Seq("w"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tok"),
        array_join(org.apache.spark.sql.functions.transform(
          sort_array(collect_list(struct(col("pos"),
            coalesce(col("rnk"), lit(0L)).as("tid")))),
          s => s.getField("tid")), ",").as("ids_str"))
  }

  /** Per-document top-`k` TF-IDF terms — the classic keyword-extraction /
    * domain-signature op: `score = tf · (ln((N+1)/(df+1)) + 1)` (smooth
    * idf, sklearn's formula), deterministic tie-break (score desc, term
    * asc). Output: (id, term, tf, score, rnk), ≤ k rows per doc.
    *
    * Scale shape: ONE corpus scan — tokens pre-aggregate to (id, term,
    * tf) map-side, and the document frequency is a COUNT WINDOW over
    * tf's term exchange (the same exchange a tf⋈df join would need, but
    * with no second scan, no second aggregation, and no join); N is a
    * one-row aggregate crossJoin-broadcast (a single-row
    * BroadcastNestedLoopJoin — the standard scalar-join shape, not a
    * real cartesian). The per-doc top-k rank window shuffles on the id;
    * three key-parallel exchanges total, each bounded by (doc, term)
    * cardinality, never by raw tokens. */
  def tfidfTopTerms(df: org.apache.spark.sql.DataFrame, idCol: String,
                    textCol: String, k: Int = 5)
      : org.apache.spark.sql.DataFrame = {
    require(k > 0, s"tfidfTopTerms: k must be positive, got $k")
    val tf = df
      .select(col(idCol), explode(wsTokens(normText(col(textCol)))).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val n = df.agg(count(lit(1)).as("n"))
    val scored = tf
      .withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("term"))))
      .crossJoin(broadcast(n))
      .withColumn("score", round(col("tf") *
        (log((col("n") + 1.0) / (col("df") + 1.0)) + 1.0), 6))
    scored.withColumn("rnk",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col(idCol))
          .orderBy(col("score").desc, col("term").asc)).cast("long"))
      .filter(col("rnk") <= k)
      .select(col(idCol), col("term"), col("tf"), col("score"), col("rnk"))
  }

  /** Repeated-window (substring-level) duplication signal, after Lee et
    * al., "Deduplicating Training Data Makes Language Models Better": a
    * `w`-token sliding window occurring more than once ANYWHERE in the
    * corpus marks every occurrence as duplicated text. Per document with
    * at least one window: total windows, duplicated windows, and the
    * duplicated fraction — the input to substring-level filtering or
    * span removal.
    *
    * Scale shape: windows hash natively row-side
    * ([[graft.functions.ShingleF.shingleHashesAll]] — position-ordered
    * xxhash64 multiset, one codegen'd pass, no window strings built),
    * pre-aggregate to (id, hash, count) with map-side combine, and only
    * hashes repeated globally survive the `tot > 1` filter before the
    * join back — repeated windows are the rare case, so the second join
    * input is small. Equality classes (not hash VALUES) determine the
    * counts, which is what lets the DuckDB oracle check this operator
    * with plain window strings while Spark joins on 64-bit hashes. */
  /** Duplicated-SPAN REMOVAL (the ExactSubstr treatment of Lee et al.):
    * delete from every document the tokens covered by any `w`-token
    * window that occurs more than once in the corpus, keeping the rest
    * in order. [[windowDupStats]] measures the signal; this operator
    * applies it. Output: (id, clean_text, n_kept) — every input row
    * survives (a fully-duplicated doc comes back empty with n_kept 0).
    *
    * Scale shape: same as the stats pass — row-local native window
    * hashes, map-side-combined (id, hash, pos-list) explode, global
    * `tot > 1` filter so only REPEATED windows (rare) flow into the
    * start-position join — plus one row-local rebuild: a higher-order
    * `filter` over the token array testing coverage against the doc's
    * (small) dup-start list. Nothing quadratic; the corpus text moves
    * through exactly one shuffle-free projection plus one left join on
    * the id. All integer/string arithmetic — engine-exact, so the
    * DuckDB oracle re-derives the same spans from window STRINGS (hash
    * equality classes ≡ string equality classes, the windowDupStats
    * argument). */
  def removeDupSpans(df: org.apache.spark.sql.DataFrame, idCol: String,
                     textCol: String, w: Int = 16)
      : org.apache.spark.sql.DataFrame = {
    require(w >= 1, s"removeDupSpans: window must be >= 1, got $w")
    val base = df.select(col(idCol), wsTokens(col(textCol)).as("toks"),
      graft.functions.ShingleF.shingleHashesAll(wsTokens(col(textCol)), w)
        .as("hs"))
    // (id, pos, h) for every window occurrence; pos is the 0-based start
    val wc = base.select(col(idCol), posexplode(col("hs")).as(Seq("pos", "h")))
    val dup = wc.groupBy(col("h")).agg(count(lit(1)).as("tot"))
      .filter(col("tot") > 1).select(col("h"))
    val starts = wc.join(dup, "h")
      .groupBy(col(idCol)).agg(collect_list(col("pos")).as("starts"))
    // native O(tokens + starts) coverage sweep — see scrubContamSpans
    val kept = graft.functions.CoverageF.coverageKeep(
      col("toks"), col("starts"), w)
    base.join(starts, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(when(col("starts").isNull, array_join(col("toks"), " "))
          .otherwise(array_join(kept, " ")), lit("")).as("clean_text"),
        when(col("starts").isNull, size(col("toks")))
          .otherwise(size(kept)).cast("long").as("n_kept"))
  }

  def windowDupStats(df: org.apache.spark.sql.DataFrame, idCol: String,
                     textCol: String, w: Int = 16)
      : org.apache.spark.sql.DataFrame = {
    require(w >= 1, s"windowDupStats: window must be >= 1, got $w")
    val base = df.select(col(idCol),
        graft.functions.ShingleF.shingleHashesAll(wsTokens(col(textCol)), w)
          .as("hs"))
      .filter(size(col("hs")) > 0)
    val wc = base.select(col(idCol), explode(col("hs")).as("h"))
      .groupBy(col(idCol), col("h")).agg(count(lit(1)).as("cnt"))
    val dup = wc.groupBy(col("h")).agg(sum(col("cnt")).as("tot"))
      .filter(col("tot") > 1).select(col("h"))
    val nDup = wc.join(dup, "h")
      .groupBy(col(idCol)).agg(sum(col("cnt")).as("n_dup"))
    base.select(col(idCol), size(col("hs")).cast("long").as("n_win"))
      .join(nDup, Seq(idCol), "left")
      .na.fill(0L, Seq("n_dup"))
      .select(col(idCol), col("n_win"), col("n_dup"),
        round(col("n_dup").cast(DoubleType) / col("n_win"), 6).as("dup_frac"))
  }
}
