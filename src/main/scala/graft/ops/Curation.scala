package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables.t
import graft.index.Embedder

/** Corpus-curation operators a training-data pipeline runs after
  * dedup/quality scoring (extension per SURVEY.md §2 G — the reference
  * stops at indexing; curation is what the indexed corpus is FOR):
  *
  *  - deterministic train/valid/test splits keyed on a content-stable
  *    hash, so growing the corpus never moves an existing document
  *    between splits (the leakage property random splits lack), and
  *  - per-domain caps (keep the k best-quality documents per source)
  *    to stop a single crawl domain from dominating the mixture.
  *
  * Scale: the split is a pure narrow map (a hash and two comparisons
  * per row — no shuffle, no state); the cap is the standard
  * top-k-per-group window, one shuffle keyed on the domain.
  */
object Curation {

  /** Deterministic global training-order shuffle — the pass that runs
    * before sequence packing so a model never sees a crawl's documents
    * in source order. Seeded content-stable hash (no `rand()`: the
    * permutation is reproducible run-over-run and changes wholesale
    * with the seed), bucketed into `nShards` shards with a per-shard
    * position — the layout a packed-dataset writer consumes directly.
    *
    * Scale: the key is a narrow map; positions are per-SHARD windows
    * (parallel, bounded state), never one global row_number that would
    * drag the corpus to a single partition. Writers then
    * `partitionBy(shard)` and read shards in (shard, pos) order. */
  def shuffleShards(
      docs: DataFrame, nShards: Int = 16, seed: String = "s1"): DataFrame = {
    val skey = graft.index.Embedder.stringHash64(
      concat_ws(":", lit(seed), col("doc_id")))
    docs.select(col("doc_id"), skey.as("skey"))
      .withColumn("shard", (col("skey") % nShards).cast("long"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard"))
          .orderBy(col("skey"), col("doc_id"))).cast("long"))
  }

  /** Split assignment from the 60-bit md5 id hash, mod 100:
    * <90 train, <95 valid, else test. */
  def withSplit(docs: DataFrame): DataFrame = {
    val b = pmod(Embedder.stringHash64(col("doc_id").cast("string")), lit(100L))
    docs.withColumn("split",
      when(b < 90, "train").when(b < 95, "valid").otherwise("test"))
  }

  /** Keep the `k` best-quality documents per source domain
    * (quality-desc, doc_id-asc tiebreak on the rounded score so the
    * cut is reproducible across engines). Ranking is the bounded-heap
    * topk_hits aggregate, not a per-source window: the window would
    * shuffle AND sort every document's row per source before cutting
    * to k, while the heap pre-reduces each map task to k (quality,
    * doc_id) pairs — the per-source shuffle payload is O(k·sources),
    * independent of corpus size. */
  def domainCap(docs: DataFrame, k: Int): DataFrame = {
    // Null-quality documents (token-free text: the guarded formula
    // yields NULL) are excluded BEFORE ranking, mirrored by
    // `quality IS NOT NULL` in the oracle: the bounded-heap aggregate
    // skips null scores by construction, and an unscorable doc has no
    // defensible rank in a quality cap — explicit beats a silent
    // engine/oracle divergence when a domain has < k scorable docs.
    val q = TextAnalysis.qualityScore(docs).select(col("doc_id"), col("quality"))
    docs.select(col("doc_id"), col("source")).join(q, Seq("doc_id"))
      .where(col("quality").isNotNull)
      .groupBy(col("source"))
      .agg(graft.vector.Kernels.topKHits(col("quality"), col("doc_id"), k).as("hits"))
      .select(col("source"), posexplode(col("hits")))
      .select(col("source"), col("col.vec_id").as("doc_id"),
        col("col.score").as("quality"), (col("pos") + 1).cast("long").as("rnk"))
  }

  /** Token-budget sequence packing, contiguous-fill: within each shard
    * (language here), documents are laid end-to-end in id order and a
    * document's bin is the budget-block its START token falls in —
    * the deterministic streaming-friendly packing a pretraining loader
    * uses. Pure integer math (window running sum, integer division):
    * no float ever enters, so the oracle match is exact by
    * construction. The running-sum window is PARTITIONED by the shard
    * key — the global-window single-partition trap does not apply. */
  def packSequences(docs: DataFrame, budget: Long): DataFrame = {
    val tc = docs.select(col("doc_id"), col("lang"),
      size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tok"))
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tc.withColumn("cum", sum(col("n_tok")).over(w))
      .select(col("doc_id"), col("lang"), col("n_tok"),
        floor((col("cum") - col("n_tok")) / lit(budget)).cast("long").as("bin"))
  }

  /** Word n-grams over an already-materialized token-array COLUMN,
    * distinct per doc; empty when the doc is shorter than n tokens.
    * Production decontamination hashes these to 8-byte keys before the
    * join (a poly-hash over the gram), shrinking shuffle width ~6×;
    * strings here keep the semantics exactly checkable.
    *
    * `toks` must be a projected column, NOT an inline
    * `tokens(col("text"))` expression, when the grams feed an explode:
    * ProjectExec eliminates the common `filter(split(text))` subtree
    * across the lambda's n `element_at` references, but GenerateExec
    * does no subexpression elimination — inlined, every gram position
    * re-splits the whole text n times (measured 12s → 0.7s at sf0.1
    * for the boilerplate miner when the array is bound first). */
  def ngramsOfToks(toks: Column, n: Int): Column = {
    val grams = transform(
      sequence(lit(1), size(toks) - (n - 1)),
      i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j)): _*))
    when(size(toks) >= n, array_distinct(grams))
      .otherwise(array().cast("array<string>"))
  }

  /** [[ngramsOfToks]] over the shared tokenizer, for projection
    * contexts (safe there — see the binding note above). */
  def ngrams(text: Column, n: Int): Column =
    ngramsOfToks(TextAnalysis.tokens(text), n)

  /** Train/eval decontamination: count, per train document, the
    * distinct word n-grams it shares with ANY eval document — the
    * standard "n-gram overlap" benchmark-leakage check a pretraining
    * pipeline runs before training (GPT-3 used 13-grams; 8 here fits
    * the short fixture docs). A train doc with n_hits > 0 is
    * contaminated and gets dropped or flagged by the caller.
    *
    * Scale: the eval side is benchmarks — thousands of docs vs
    * billions of train docs — so its distinct gram set is explicitly
    * `broadcast()`; the train side is a narrow explode → broadcast
    * semi-join-with-count → per-doc aggregate. No shuffle touches the
    * eval set and the only train-side shuffle is the final count
    * keyed on doc_id (map-side combinable). */
  def decontaminate(train: DataFrame, evalDocs: DataFrame, n: Int = 8): DataFrame = {
    // token arrays bound in a projection BELOW the explode (the
    // GenerateExec quadratic-re-split trap — see ngramsOfToks)
    val evalGrams = evalDocs
      .select(TextAnalysis.tokens(col("text")).as("_toks"))
      .select(explode(ngramsOfToks(col("_toks"), n)).as("gram")).distinct()
    val hits = train
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("_toks"))
      .select(col("doc_id"), explode(ngramsOfToks(col("_toks"), n)).as("gram"))
      .join(broadcast(evalGrams), Seq("gram"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hits"))
    train.select(col("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("n_hits"), lit(0L)).as("n_hits"))
  }

  /** Deterministic stratified sampling: keep a per-stratum fraction of
    * documents, selected by a content-stable hash bucket (permille)
    * rather than `rand()` — the same doc is kept or dropped on every
    * run and on every re-partitioning, which is what makes a corpus
    * mixture reproducible and incrementally extendable (new docs
    * never flip old decisions — the property `sample()` lacks).
    * Pure narrow map: a hash, a mod, one comparison per row. */
  def stratifiedSample(
      docs: DataFrame,
      permilleByLang: Map[String, Int],
      defaultPermille: Int): DataFrame = {
    val bucket = Embedder.permilleDraw("samp:", col("doc_id"))
    val thr = permilleByLang.foldLeft(lit(defaultPermille).cast("long")) {
      case (acc, (lang, p)) => when(col("lang") === lang, lit(p.toLong)).otherwise(acc)
    }
    docs.filter(bucket < thr).select(col("doc_id"), col("lang"))
  }

  /** C4-style line-level deduplication: split each document into
    * `lineWords`-word lines, drop every line that appeared earlier in
    * the corpus (first occurrence in (doc_id, idx) order wins — C4's
    * "keep one of each three-sentence span"), and rebuild the
    * surviving text. Boilerplate that repeats across documents
    * (headers, footers, navigation) disappears corpus-wide while each
    * copy's first sighting survives.
    *
    * Scale: one explode → groupBy(line hash) min-aggregate (map-side
    * combinable) → join back on the SAME hash key (exchange reused, no
    * second shuffle of the corpus) → per-doc rebuild. The
    * first-occurrence key packs (doc_id, idx) into one BIGINT
    * (doc_id·2^20 + idx, exact under 2^53) so the min and the equality
    * test are integer ops in both engines. */
  def lineDedup(docs: DataFrame, lineWords: Int = 8): DataFrame = {
    val base = docs
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("_toks"))
      .filter(size(col("_toks")) > 0)
    val lines = base.select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0), ((size(col("_toks")) - 1) / lineWords).cast("int")),
          i => array_join(slice(col("_toks"), i * lineWords + 1, lit(lineWords)), " "))))
      .select(col("doc_id"), col("pos").cast("long").as("idx"), col("col").as("line"))
      // line IDENTITY takes the 60-bit md5-prefix id, NOT the ~2^20
      // poly hash (feature-bucket width): at corpus line counts a
      // poly-hash collision is guaranteed and would silently delete a
      // genuinely distinct line (CLAUDE.md identity-vs-bucket rule)
      .withColumn("h", Embedder.stringHash64(col("line")))
      // the packed key is exact only while idx < 2^20 (~8.4M tokens at
      // lineWords=8): a longer document would silently collide into the
      // next doc_id's key range and corrupt first-occurrence selection,
      // so overflow fails LOUDLY instead (ADVICE r4)
      .withColumn("k", col("doc_id") * lit(1048576L) +
        when(col("idx") < lit(1048576L), col("idx"))
          .otherwise(raise_error(concat(
            lit("lineDedup: document "), col("doc_id"),
            lit(" has >= 2^20 lines - packed (doc_id,idx) key would collide")))))
    val first = lines.groupBy(col("h")).agg(min(col("k")).as("first_k"))
    lines.join(first, Seq("h"))
      .withColumn("kept", col("k") === col("first_k"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(when(col("kept"),
              struct(col("idx"), col("line"))))),
            x => x.getField("line")),
          " ").as("new_text"))
  }

  /** RAG-style overlapping chunking + per-chunk embedding: windows of
    * `size` words every `stride` words (stride < size ⇒ overlap, so
    * retrieval never loses a sentence straddling a boundary), each
    * chunk embedded like a document — the "documents → retrievable
    * points" prep a RAG pipeline runs before bulk indexing, and the
    * text analog of the reference's PDF→page fan-out (one PDF → many
    * indexed page points, `with_colpali_v1.3/...py:143-163`).
    * Pure narrow map: tokenize once, window via slice, embed per
    * chunk — no shuffle, scales as a scan. */
  def chunkEmbed(docs: DataFrame, size: Int, stride: Int): DataFrame =
    chunkVectors(docs, size, stride)
      .select(col("doc_id"), col("chunk_id"), col("n_words"),
        element_at(col("cv"), 1).as("e0"),
        round(graft.vector.Kernels.l2norm(col("cv")), 6).as("nrm"))

  /** Chunk rows with their full embedding vectors — the index-ready
    * shape ([[chunkEmbed]] projects the same rows down to audit
    * scalars). */
  def chunkVectors(docs: DataFrame, size: Int, stride: Int): DataFrame = {
    require(stride > 0 && stride <= size, "need 0 < stride <= size")
    val base = docs
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("_toks"))
      .filter(org.apache.spark.sql.functions.size(col("_toks")) > 0)
    base.select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0),
            ((org.apache.spark.sql.functions.size(col("_toks")) - 1) / stride).cast("int")),
          i => slice(col("_toks"), i * stride + 1, lit(size)))))
      .select(col("doc_id"), col("pos").cast("long").as("chunk_id"),
        org.apache.spark.sql.functions.size(col("col")).cast("long").as("n_words"),
        Embedder.embedRaw(transform(col("col"),
          tk => Embedder.tokenHash(tk))).as("cv"))
  }

  /** The composed RAG retrieval path, end-to-end under one oracle:
    * documents → overlapping chunks → per-chunk embeddings → cosine
    * against an embedded text query → each document ranked by its BEST
    * chunk → top-k documents. This is what "index the corpus, retrieve
    * for the LLM" actually runs: chunk-level recall with doc-level
    * results. Narrow chunk fan-out (no shuffle), broadcast query, one
    * map-side-combinable max per doc, TakeOrderedAndProject cut. */
  def ragSearch(docs: DataFrame, queryText: String, size: Int, stride: Int, k: Int): DataFrame = {
    val spark = docs.sparkSession
    val q = spark.range(1)
      .select(Embedder.embedRaw(Embedder.tokenHashes(lit(queryText))).as("qv"))
    chunkVectors(docs, size, stride)
      .crossJoin(broadcast(q))
      .select(col("doc_id"), col("chunk_id"),
        round(graft.vector.Kernels.cosine(col("cv"), col("qv")), 6).as("score"))
      .groupBy(col("doc_id"))
      .agg(max(struct(col("score"), (-col("chunk_id")).as("nc"))).as("best"),
        count(lit(1)).as("n_chunks"))
      .select(col("doc_id"), col("best.score").as("score"),
        (-col("best.nc")).cast("long").as("best_chunk"), col("n_chunks"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Mixture rebalancing weights: per-source sampling weight that
    * turns the corpus's actual language shares into a uniform target
    * mixture — weight(lang) = target_share / actual_share. The
    * per-example multiplier a data-mixing stage feeds into its
    * sampler. One map-side-combinable aggregation + a broadcast
    * one-row total; integer counts, one rounded division. */
  def mixtureWeights(docs: DataFrame): DataFrame = {
    val byLang = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
    val tot = byLang.agg(sum(col("n_docs")).as("total"),
      count(lit(1)).as("n_langs"))
    byLang.crossJoin(broadcast(tot))
      .select(col("lang"), col("n_docs"),
        round(col("n_docs").cast("double") / col("total").cast("double"), 6)
          .as("share"),
        round((col("total").cast("double") / col("n_langs").cast("double")) /
          col("n_docs").cast("double"), 6).as("weight"))
  }

  /** Temperature-scaled (α-)sampling mixture — the multilingual-LM
    * standard (Conneau et al. XLM-R, α = 0.3; Raffel et al. T5 use
    * the same form over corpora): sampling weight q_l ∝ p_l^α with
    * p_l the language's corpus share. α < 1 flattens the mixture —
    * low-resource languages are oversampled (boost = q/p > 1), head
    * languages damped — without the hard uniform target of
    * [[mixtureWeights]].
    *
    * Determinism: p is an exact integral division; p^α rounds at 6dp
    * BEFORE the normalizer sum, and that sum folds in lang order (the
    * BM25 pin) — `pow` is the only libm call and its ulp noise dies in
    * the rounding. One tiny aggregate; nothing corpus-sized moves. */
  def temperatureMixture(docs: DataFrame, alpha: Double): DataFrame = {
    val byLang = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
    val tot = byLang.agg(sum(col("n_docs")).as("total"))
    val pa = byLang.crossJoin(broadcast(tot))
      .select(col("lang"), col("n_docs"),
        (col("n_docs").cast("double") / col("total").cast("double")).as("p"))
      .withColumn("pa", round(pow(col("p"), lit(alpha)), 6))
    val z = pa
      .agg(sort_array(collect_list(struct(col("lang"), col("pa")))).as("l"))
      .select(aggregate(col("l"), lit(0.0), (a, x) => a + x.getField("pa"))
        .as("z"))
    pa.crossJoin(broadcast(z))
      .select(col("lang"), col("n_docs"),
        round(col("p"), 6).as("share"),
        round(col("pa") / col("z"), 6).as("weight"),
        round(col("pa") / col("z") / col("p"), 6).as("boost"))
  }

  /** Intra-document paragraph dedup — the Gopher/RefinedWeb cleaning
    * step that strips text REPEATED WITHIN one document (templated
    * headers, copy-paste runs) while [[lineDedup]] handles cross-doc
    * repetition. "Paragraphs" here are fixed `chunkWords`-word windows
    * (the fixture corpus has no newlines); the first occurrence of
    * each chunk survives in original order. Emits the census a
    * cleaning report needs (chunks before/after) plus an md5 signature
    * and length of the cleaned text.
    *
    * Scale: a PURE NARROW MAP — chunking is arithmetic on the token
    * array and `array_distinct` is one hash-set pass per document
    * (first-occurrence order preserved), so no shuffle, no state, and
    * per-doc cost is linear in document length. */
  def intraDocDedup(docs: DataFrame, chunkWords: Int): DataFrame = {
    // tokenize once per row: a multi-use non-cheap alias keeps its own
    // projection under CollapseProject, so the w+2 references below
    // read the bound array instead of re-running the split chain
    val toks = col("_toks")
    val w = chunkWords
    val n = size(toks)
    // Non-overlapping `w`-word chunks, closure-free (the original
    // per-chunk `slice(toks, i*w+1, w)` captured toks inside the
    // lambda — the quadratic re-evaluation class HofGuardSpec sweeps
    // for): join w shifted slices into EVERY w-wide window (each
    // lambda sees only its own variables), keep every w-th window
    // (the index-filter lambda closes over the literal w alone), and
    // append the partial tail chunk, which is plain argument-level
    // slice/join arithmetic evaluated once per row.
    val width = greatest(n - (w - 1), lit(0))
    val windows = (1 until w).foldLeft(slice(toks, lit(1), width))((acc, j) =>
      zip_with(acc, slice(toks, lit(1 + j), width),
        (a, x) => concat(a, lit(" "), x)))
    val fulls = filter(windows, (x, i) => pmod(i, lit(w)) === 0)
    val nTail = n % w
    val tail = array_join(slice(toks, n - nTail + 1, nTail), " ")
    // NULL text must mean zero chunks (the pre-r9 when(size>0) arm's
    // behavior): n is NULL for NULL text, so `n === 0` alone would
    // fall through to the concat branch and emit NULL stats
    val chunks = when(n.isNull || n === 0, array().cast("array<string>"))
      .when(nTail === 0, fulls)
      .otherwise(concat(fulls, array(tail)))
    docs.withColumn("_toks", TextAnalysis.tokens(col("text")))
      .select(col("doc_id"), chunks.as("chunks"))
      .select(col("doc_id"),
        size(col("chunks")).cast("long").as("n_chunks"),
        array_distinct(col("chunks")).as("kept"))
      .select(col("doc_id"), col("n_chunks"),
        size(col("kept")).cast("long").as("n_kept"),
        array_join(col("kept"), " ").as("clean"))
      .select(col("doc_id"), col("n_chunks"), col("n_kept"),
        length(col("clean")).cast("long").as("clean_chars"),
        md5(col("clean").cast("binary")).as("clean_sig"))
  }

  /** C4-style banned-term document filter (Raffel et al. 2020 §2.2
    * drop any page containing a "List of Dirty, Naughty…" term): the
    * audit row every curation report wants — per document, how many
    * token hits against the single-word blocklist, how many
    * occurrences of the banned PHRASE (consecutive-token match, not
    * substring: "batch batch" must not fire inside an unrelated longer
    * word), and the resulting blocked verdict.
    *
    * Scale: a PURE NARROW MAP. The blocklist is a codegen'd literal
    * array (term lists are O(100s)–O(1000s) — C4's is ~400 entries),
    * so membership is per-token hash-set work with no shuffle and no
    * broadcast round-trip; the phrase scan is O(len·|phrase|) token
    * comparisons per document. Lists too big to inline go through
    * [[blocklistJoin]] instead. */
  def blocklistAudit(
      docs: DataFrame, terms: Seq[String], phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one word")
    // tokenize once per row (multi-use alias, see intraDocDedup)
    val toks = col("_toks")
    val l = phrase.length
    val termHits =
      size(filter(toks, t => array_contains(typedLit(terms), t))).cast("long")
    // Consecutive-token phrase match as a closure-free shifted-slice
    // zip_with chain: position i matches iff toks[i+j] == phrase(j) for
    // every j. The original per-position `slice(toks, i, l)` captured
    // toks inside the lambda — re-running the tokenize chain per
    // position once an optimizer rule inlines it (the quadratic class
    // HofGuardSpec sweeps for). Every lambda below closes over nothing
    // but its own variables and literals.
    val width = greatest(size(toks) - (l - 1), lit(0))
    val eq0 = transform(slice(toks, lit(1), width), x => x === lit(phrase.head))
    val posMatches = (1 until l).foldLeft(eq0)((acc, j) =>
      zip_with(acc, slice(toks, lit(1 + j), width),
        (a, x) => a && (x === lit(phrase(j)))))
    val phraseHits = when(size(toks) >= l,
      size(filter(posMatches, b => b)).cast("long"))
      .otherwise(0L)
    docs.withColumn("_toks", TextAnalysis.tokens(col("text")))
      .select(col("doc_id"), termHits.as("term_hits"),
        phraseHits.as("phrase_hits"))
      .withColumn("blocked",
        (col("term_hits") > 0 || col("phrase_hits") > 0).cast("int").cast("long"))
  }

  /** DuckDB twin of [[blocklistAudit]]. */
  private def duckBlocklistAudit(
      terms: Seq[String], phrase: Seq[String]): String = {
    val termList = terms.map(t => s"'$t'").mkString("[", ", ", "]")
    val phraseList = phrase.map(t => s"'$t'").mkString("[", ", ", "]")
    val l = phrase.length
    s"""WITH tk AS (SELECT doc_id, ${TextAnalysis.duckToksPublic("text")} AS toks
       |  FROM documents)
       |SELECT doc_id,
       |  len(list_filter(toks, t -> list_contains($termList, t)))::BIGINT AS term_hits,
       |  (CASE WHEN len(toks) >= $l THEN
       |     len(list_filter(range(1, len(toks) - $l + 2),
       |       i -> toks[i:i+${l - 1}] = $phraseList))
       |   ELSE 0 END)::BIGINT AS phrase_hits,
       |  (CASE WHEN len(list_filter(toks, t -> list_contains($termList, t))) > 0
       |     OR (CASE WHEN len(toks) >= $l THEN
       |       len(list_filter(range(1, len(toks) - $l + 2),
       |         i -> toks[i:i+${l - 1}] = $phraseList)) ELSE 0 END) > 0
       |   THEN 1 ELSE 0 END)::BIGINT AS blocked
       |FROM tk ORDER BY doc_id""".stripMargin
  }

  /** Blocklist matching for lists too large to inline as a literal
    * (URL blocklists run to millions of entries — RefinedWeb §3.1
    * filters against a 4.6M-domain list): tokens explode against a
    * broadcast term TABLE, hits re-aggregate per document. Only
    * blocked documents come back — at scale the audit of clean
    * documents is the corpus itself.
    *
    * Scale: the term table broadcasts (hash-set probe per token, no
    * corpus shuffle for the join); the only exchange is the
    * map-side-combinable per-doc count, whose payload is one row per
    * (doc, hit) — proportional to the hits, not the corpus. Beyond
    * broadcast size (~GBs), the same shape degrades gracefully to a
    * shuffled hash join on the token key. */
  def blocklistJoin(docs: DataFrame, terms: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .join(broadcast(terms), col("tok") === col("term"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("term_hits"))

  /** Demo blocklist over the fixture vocabulary: two banned words and
    * one banned bigram (planted nowhere — they are natural corpus
    * tokens, so hits are organic). */
  private[graft] val BadTerms = Seq("slow", "dup")
  private[graft] val BadPhrase = Seq("batch", "batch")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_blocklist" -> ((s, dir) =>
      blocklistAudit(t(s, dir, "documents"), BadTerms, BadPhrase)
        .orderBy(col("doc_id"))),
    "x_blocklist_join" -> ((s, dir) => {
      import s.implicits._
      blocklistJoin(t(s, dir, "documents"), BadTerms.toDF("term"))
        .orderBy(col("doc_id"))
    }),
    "x_rag_search" -> ((s, dir) =>
      ragSearch(t(s, dir, "documents"), "hash join merge",
        size = 32, stride = 24, k = 5)),
    "x_chunk_embed" -> ((s, dir) =>
      Ckpt.ordered(chunkEmbed(t(s, dir, "documents"), size = 32, stride = 24),
        col("doc_id"), col("chunk_id"))),
    "x_line_dedup" -> ((s, dir) =>
      lineDedup(t(s, dir, "documents"), 8).orderBy(col("doc_id"))),
    "x_mixture_weights" -> ((s, dir) =>
      mixtureWeights(t(s, dir, "documents")).orderBy(col("lang"))),
    "x_mixture_temp" -> ((s, dir) =>
      temperatureMixture(t(s, dir, "documents"), alpha = 0.3)
        .orderBy(col("lang"))),
    // The word-salad fixture rarely repeats an 8-word chunk inside one
    // doc, so the query plants a duplicate in BOTH engines: every 10th
    // doc gets its own first 8 words PREPENDED — chunk 0 and chunk 1
    // of the planted doc are then verbatim equal regardless of the
    // doc's length, and the dedup must strip exactly one of them.
    "x_intradoc_dedup" -> ((s, dir) => {
      val toks = TextAnalysis.tokens(col("text"))
      val planted = t(s, dir, "documents").withColumn("text",
        when(col("doc_id") % 10 === 0,
          concat(array_join(slice(toks, 1, 8), " "), lit(" "), col("text")))
          .otherwise(col("text")))
      Ckpt.ordered(intraDocDedup(planted, 8), col("doc_id"))
    }),
    "x_split_train_test" -> ((s, dir) =>
      withSplit(t(s, dir, "documents"))
        .groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
        .orderBy(col("split"), col("lang"))),
    "x_corpus_shuffle" -> ((s, dir) =>
      shuffleShards(t(s, dir, "documents"))
        .orderBy(col("shard"), col("pos"))),
    "x_domain_cap" -> ((s, dir) =>
      domainCap(t(s, dir, "documents"), 3)
        .orderBy(col("source"), col("rnk"))),
    "x_pack_sequences" -> ((s, dir) =>
      packSequences(t(s, dir, "documents"), budget = 200L)
        .orderBy(col("lang"), col("doc_id"))),
    // The fixture corpus has almost no natural 8-gram overlap, so the
    // query plants a deterministic leak in BOTH engines: an 8-token
    // marker appended to every eval doc (id%50=0) and to every train
    // doc with id%17=0 — those train docs must come back contaminated,
    // alongside any natural overlap.
    "x_decontaminate" -> ((s, dir) => {
      val leaked = t(s, dir, "documents").withColumn("text",
        when(col("doc_id") % 50 === 0 || col("doc_id") % 17 === 0,
          concat(col("text"), lit(LeakMarker))).otherwise(col("text")))
      decontaminate(
        leaked.filter(col("doc_id") % 50 =!= 0),
        leaked.filter(col("doc_id") % 50 === 0))
        .orderBy(col("doc_id"))
    }),
    // 60% of English, 25% of everything else — a down-weighting
    // mixture decision, reproducibly keyed on doc identity.
    "x_stratified_sample" -> ((s, dir) =>
      stratifiedSample(t(s, dir, "documents"), Map("en" -> 600), 250)
        .orderBy(col("doc_id"))),

    // The composed curation pipeline — what the operators exist FOR:
    // near-dup pairs → connected components → min-id keeper (originals
    // beat their planted perturbed copies) → quality cut (≥0.7 drops
    // the bottom ~12% of the fixture) → content-stable split. Every
    // stage is an operator verified on its own above; this query
    // verifies their COMPOSITION end to end against one oracle.
    "x_corpus_pipeline" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val corpus = Dedup.corpusWithDups(docs)
      val cc = Dedup.clusters(
        Dedup.minhashPairs(corpus).select(col("id_a"), col("id_b")))
      val nonKeepers = cc.filter(col("id") =!= col("cluster_id"))
        .select(col("id").as("doc_id"))
      val survivors = docs.join(nonKeepers, Seq("doc_id"), "left_anti")
      val kept = TextAnalysis.qualityScore(survivors)
        .filter(col("quality") >= 0.7)
        .select(col("doc_id"), col("quality"))
      Ckpt.ordered(
        withSplit(survivors.select(col("doc_id"), col("lang")))
          .join(kept, Seq("doc_id"))
          .select(col("doc_id"), col("lang"), col("quality"), col("split")),
        col("doc_id"))
    })
  )

  private val LeakMarker =
    " leak0 leak1 leak2 leak3 leak4 leak5 leak6 leak7"

  /** DuckDB twin of [[ngrams]] — tokens come from the shared
    * [[TextAnalysis.duckToksPublic]] formula so decontamination can
    * never tokenize differently from the rest of the engine. */
  def duckNgrams(textExpr: String, n: Int): String = {
    val toks = TextAnalysis.duckToksPublic(textExpr)
    val gram = (0 until n).map {
      case 0 => s"$toks[i]"
      case j => s"$toks[i+$j]"
    }.mkString(" || ' ' || ")
    s"CASE WHEN len($toks) >= $n THEN " +
      s"list_distinct(list_transform(range(1, len($toks) - ${n - 2}), i -> $gram)) " +
      s"ELSE [] END"
  }

  def oracles: Map[String, String] = Map(
    "x_blocklist" -> duckBlocklistAudit(BadTerms, BadPhrase),
    "x_blocklist_join" -> {
      val toks = TextAnalysis.duckToksPublic("text")
      val termList = BadTerms.map(t => s"'$t'").mkString("[", ", ", "]")
      s"""SELECT doc_id, count(*)::BIGINT AS term_hits
         |FROM (SELECT doc_id, unnest($toks) AS tok FROM documents)
         |WHERE list_contains($termList, tok)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },
    "x_rag_search" -> {
      val toks = TextAnalysis.duckToksPublic("text")
      val chunkHashes = s"list_transform(u.ct, tok -> ${Embedder.duckStringHash("tok")})"
      val qEmbed = Embedder.duckEmbedRaw(Embedder.duckTokenHashes("'hash join merge'"))
      s"""WITH b AS (SELECT doc_id, $toks AS toks FROM documents WHERE len($toks) > 0),
         |c AS (SELECT doc_id, list_transform(range(0, ((len(toks)-1)//24)+1),
         |    i -> struct_pack(cid := i, ct := toks[(i*24+1):(i*24+32)])) AS cl FROM b),
         |x AS (SELECT doc_id, unnest(cl) AS u FROM c),
         |h AS (SELECT doc_id, u.cid::BIGINT AS chunk_id,
         |    ${Embedder.duckEmbedRaw(chunkHashes)} AS cv FROM x),
         |q AS (SELECT $qEmbed AS qv),
         |sc AS (SELECT doc_id, chunk_id,
         |    ROUND(CASE WHEN list_sum(list_transform(cv::DOUBLE[], x -> x*x)) = 0 THEN NULL
         |      ELSE list_cosine_similarity(cv::DOUBLE[], (SELECT qv FROM q)::DOUBLE[]) END, 6) AS score
         |  FROM h),
         |g AS (SELECT doc_id,
         |    max(struct_pack(score := score, nc := -chunk_id)) AS best,
         |    count(*) AS n_chunks
         |  FROM sc GROUP BY doc_id)
         |SELECT doc_id, best.score AS score, (-best.nc)::BIGINT AS best_chunk, n_chunks
         |FROM g ORDER BY score DESC, doc_id ASC LIMIT 5""".stripMargin
    },

    "x_chunk_embed" -> {
      val toks = TextAnalysis.duckToksPublic("text")
      val chunkHashes = s"list_transform(u.ct, tok -> ${Embedder.duckStringHash("tok")})"
      s"""WITH b AS (SELECT doc_id, $toks AS toks FROM documents WHERE len($toks) > 0),
         |c AS (SELECT doc_id, list_transform(range(0, ((len(toks)-1)//24)+1),
         |    i -> struct_pack(cid := i, ct := toks[(i*24+1):(i*24+32)])) AS cl FROM b),
         |x AS (SELECT doc_id, unnest(cl) AS u FROM c),
         |h AS (SELECT doc_id, u.cid::BIGINT AS chunk_id, len(u.ct)::BIGINT AS n_words,
         |    ${Embedder.duckEmbedRaw(chunkHashes)} AS cv FROM x)
         |SELECT doc_id, chunk_id, n_words, cv[1] AS e0,
         |  ROUND(sqrt(list_reduce(list_transform(cv, x -> x*x), (a,b) -> a+b)), 6) AS nrm
         |FROM h ORDER BY doc_id, chunk_id""".stripMargin
    },

    "x_line_dedup" -> {
      val toks = TextAnalysis.duckToksPublic("text")
      s"""WITH b AS (SELECT doc_id, $toks AS toks FROM documents WHERE len($toks) > 0),
         |c AS (SELECT doc_id, list_transform(range(0, ((len(toks)-1)//8)+1),
         |    i -> struct_pack(idx := i, line := array_to_string(toks[(i*8+1):(i*8+8)], ' '))) AS cl
         |  FROM b),
         |x AS (SELECT doc_id, unnest(cl) AS u FROM c),
         |l AS (SELECT doc_id, u.idx::BIGINT AS idx, u.line AS line,
         |    ${Embedder.duckStringHash64("u.line")} AS h,
         |    doc_id * 1048576 + u.idx AS k FROM x),
         |f AS (SELECT h, min(k) AS first_k FROM l GROUP BY h),
         |g AS (SELECT l.doc_id, l.idx, l.line, l.k = f.first_k AS kept
         |  FROM l JOIN f USING (h))
         |SELECT doc_id, count(*) AS n_lines,
         |  sum(CASE WHEN kept THEN 1 ELSE 0 END)::BIGINT AS n_kept,
         |  coalesce(array_to_string(list(line ORDER BY idx) FILTER (WHERE kept), ' '), '') AS new_text
         |FROM g GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },

    "x_mixture_weights" ->
      """WITH b AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
        |t AS (SELECT sum(n_docs)::BIGINT AS total, count(*)::BIGINT AS n_langs FROM b)
        |SELECT lang, n_docs, ROUND(n_docs::DOUBLE / total::DOUBLE, 6) AS share,
        |  ROUND((total::DOUBLE / n_langs::DOUBLE) / n_docs::DOUBLE, 6) AS weight
        |FROM b, t ORDER BY lang""".stripMargin,

    "x_mixture_temp" ->
      """WITH b AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
        |t AS (SELECT sum(n_docs)::BIGINT AS total FROM b),
        |pa AS (SELECT lang, n_docs, n_docs::DOUBLE / total::DOUBLE AS p,
        |    ROUND(pow(n_docs::DOUBLE / total::DOUBLE, 0.3), 6) AS pa FROM b, t),
        |z AS (SELECT list_reduce(list_prepend(0.0, list(pa ORDER BY lang)),
        |    (a, b) -> a + b) AS z FROM pa)
        |SELECT lang, n_docs, ROUND(p, 6) AS share,
        |  ROUND(pa / z, 6) AS weight, ROUND(pa / z / p, 6) AS boost
        |FROM pa, z ORDER BY lang""".stripMargin,

    "x_intradoc_dedup" -> {
      val toks = TextAnalysis.duckToksPublic("text")
      s"""WITH base AS (SELECT doc_id, text, $toks AS tk0 FROM documents),
         |planted AS (SELECT doc_id, CASE WHEN doc_id % 10 = 0
         |    THEN array_to_string(tk0[1:8], ' ') || ' ' || text
         |    ELSE text END AS text FROM base),
         |tk AS (SELECT doc_id, $toks AS toks FROM planted),
         |ch AS (SELECT doc_id, list_transform(
         |    range(0, cast(ceil(len(toks) / 8.0) AS INT)),
         |    i -> array_to_string(toks[i*8+1 : i*8+8], ' ')) AS chunks FROM tk),
         |ex AS (SELECT doc_id, unnest(chunks) AS chunk,
         |    generate_subscripts(chunks, 1) AS ord FROM ch),
         |firsts AS (SELECT doc_id, chunk, min(ord) AS ord
         |  FROM ex GROUP BY doc_id, chunk),
         |agg AS (SELECT doc_id, count(*) AS n_kept,
         |    array_to_string(list(chunk ORDER BY ord), ' ') AS clean
         |  FROM firsts GROUP BY doc_id)
         |SELECT c.doc_id, len(c.chunks)::BIGINT AS n_chunks,
         |  COALESCE(a.n_kept, 0)::BIGINT AS n_kept,
         |  length(COALESCE(a.clean, ''))::BIGINT AS clean_chars,
         |  md5(COALESCE(a.clean, '')) AS clean_sig
         |FROM ch c LEFT JOIN agg a USING (doc_id) ORDER BY doc_id""".stripMargin
    },

    "x_split_train_test" ->
      s"""WITH s AS (SELECT lang, n_chars,
         |    ${Embedder.duckStringHash64("doc_id::VARCHAR")} % 100 AS b FROM documents)
         |SELECT CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'valid' ELSE 'test' END AS split,
         |  lang, count(*) AS n_docs, sum(n_chars)::BIGINT AS total_chars
         |FROM s GROUP BY 1, 2 ORDER BY split, lang""".stripMargin,

    "x_corpus_shuffle" ->
      s"""WITH k AS (SELECT doc_id,
         |    ${Embedder.duckStringHash64("'s1:' || doc_id::VARCHAR")} AS skey
         |  FROM documents)
         |SELECT doc_id, skey, (skey % 16)::BIGINT AS shard,
         |  row_number() OVER (PARTITION BY skey % 16 ORDER BY skey, doc_id)::BIGINT AS pos
         |FROM k ORDER BY shard, pos""".stripMargin,

    "x_pack_sequences" ->
      s"""WITH tc AS (SELECT doc_id, lang,
         |    len(${TextAnalysis.duckToksPublic("text")})::BIGINT AS n_tok FROM documents),
         |c AS (SELECT *, sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
         |    ROWS UNBOUNDED PRECEDING)::BIGINT AS cum FROM tc)
         |SELECT doc_id, lang, n_tok, ((cum - n_tok) // 200)::BIGINT AS bin
         |FROM c ORDER BY lang, doc_id""".stripMargin,

    "x_domain_cap" ->
      s"""WITH ${TextAnalysis.duckQualityCtes},
         |r AS (SELECT d.source, d.doc_id, q.quality,
         |    row_number() OVER (PARTITION BY d.source ORDER BY q.quality DESC, d.doc_id ASC) AS rnk
         |  FROM documents d JOIN q USING (doc_id) WHERE q.quality IS NOT NULL)
         |SELECT source, doc_id, quality, rnk FROM r WHERE rnk <= 3
         |ORDER BY source, rnk""".stripMargin,

    "x_decontaminate" ->
      s"""WITH leaked AS (SELECT doc_id,
         |    CASE WHEN doc_id % 50 = 0 OR doc_id % 17 = 0
         |      THEN text || '$LeakMarker' ELSE text END AS text
         |  FROM documents),
         |g AS (SELECT doc_id, unnest(${duckNgrams("text", 8)}) AS gram FROM leaked),
         |ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0),
         |hits AS (SELECT g.doc_id, count(*)::BIGINT AS n_hits
         |  FROM g JOIN ev USING (gram) WHERE g.doc_id % 50 <> 0 GROUP BY g.doc_id)
         |SELECT d.doc_id, COALESCE(h.n_hits, 0)::BIGINT AS n_hits
         |FROM leaked d LEFT JOIN hits h USING (doc_id)
         |WHERE d.doc_id % 50 <> 0
         |ORDER BY doc_id""".stripMargin,

    "x_stratified_sample" ->
      s"""SELECT doc_id, lang FROM (
         |  SELECT doc_id, lang,
         |    ${Embedder.duckPermilleDraw("samp:", "doc_id")} AS b
         |  FROM documents) z
         |WHERE b < CASE WHEN lang = 'en' THEN 600 ELSE 250 END
         |ORDER BY doc_id""".stripMargin,

    "x_corpus_pipeline" ->
      s"""WITH RECURSIVE
         |pr AS (SELECT id_a, id_b FROM (${Dedup.duckMinhashPairs()}) mp),
         |adj AS (SELECT id_a AS a, id_b AS b FROM pr UNION ALL SELECT id_b, id_a FROM pr),
         |nodes AS (SELECT DISTINCT a AS id FROM adj),
         |lp(id, lab) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT adj.b, lp.lab FROM lp JOIN adj ON adj.a = lp.id WHERE lp.lab < adj.b),
         |cc AS (SELECT id, min(lab) AS cluster_id FROM lp GROUP BY id),
         |nonkeep AS (SELECT id FROM cc WHERE id <> cluster_id),
         |surv AS (SELECT d.* FROM documents d
         |  WHERE d.doc_id NOT IN (SELECT id FROM nonkeep)),
         |${TextAnalysis.duckQualityCtesFor("surv")},
         |sp AS (SELECT doc_id, lang,
         |    ${Embedder.duckStringHash64("doc_id::VARCHAR")} % 100 AS b2
         |  FROM surv)
         |SELECT q.doc_id, sp.lang, q.quality,
         |  CASE WHEN b2 < 90 THEN 'train' WHEN b2 < 95 THEN 'valid' ELSE 'test' END AS split
         |FROM q JOIN sp USING (doc_id)
         |WHERE q.quality >= 0.7
         |ORDER BY doc_id""".stripMargin
  )
}
