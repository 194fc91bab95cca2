package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t
import graft.index.Embedder
import graft.vector.Kernels

/** Deduplication operators for large-scale training-data pipelines
  * (driver north star; sanctioned extension per SURVEY.md §2 G):
  * exact, MinHash+LSH, SimHash, n-gram Jaccard, and embedding-cosine
  * near-dup.
  *
  * Scale design: nothing here is all-pairs. Every near-dup variant
  * generates candidates through a bucketing key (LSH band, SimHash
  * chunk, embedding sign-sketch) and only verifies within buckets —
  * the standard shuffle-on-bucket plan that holds at 10^9 docs, where
  * a crossJoin would not. Exact dedup is a single hash aggregation
  * with map-side partial aggregation.
  *
  * The sf0.001/sf0.01 fixtures have no duplicate texts, so the
  * near-dup queries union in deterministic perturbed copies of every
  * 25th document (id + 1'000'000, three appended tokens) — both
  * engines build the same corpus, and the queries return non-trivial
  * matches at every scale factor.
  */
object Dedup {

  private val DupOffset = 1000000L

  /** Corpus with synthetic near-duplicates for the near-dup queries.
    * Repartitioned on doc_id: the fixture is one unsplittable parquet
    * file, and shingling/fingerprinting are compute-bound — spreading
    * rows before the heavy map stage is the right plan whenever
    * compute-per-byte is high (same reasoning holds on a cluster). */
  def corpusWithDups(docs: DataFrame): DataFrame = {
    val dups = docs.filter(col("doc_id") % 25 === 0)
      .select((col("doc_id") + DupOffset).as("doc_id"),
        concat(col("text"), lit(" zz yy xx")).as("text"))
    // NOTE r18: an explicit-width Spread.byKey here was measured and
    // REVERTED — it parallelizes the shingle passes but taxes every
    // cheap consumer (x_dedup_exact +60%: one md5 groupBy does not
    // earn an extra exchange); the interleaved A/B read the family
    // net-negative at fixture scale. The implicit form stays; the
    // shingle-heavy operators own their own spread decisions.
    docs.select(col("doc_id"), col("text")).unionByName(dups)
      .repartition(col("doc_id"))
  }

  val duckCorpusWithDups: String =
    "SELECT doc_id, text FROM documents UNION ALL " +
      "SELECT doc_id + 1000000 AS doc_id, text || ' zz yy xx' AS text " +
      "FROM documents WHERE doc_id % 25 = 0"

  // -- exact -------------------------------------------------------

  /** Exact dedup: hash-group on content, keep the smallest id
    * (deterministic keeper), count members. Map-side combine makes
    * this one shuffle of (hash, partial-count) pairs. */
  def exact(corpus: DataFrame): DataFrame =
    corpus
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("n_copies"))

  // -- shingles / MinHash ------------------------------------------

  /** Word 3-gram shingle set (distinct). Guards the <3-token case by
    * falling back to the whole text as one shingle. */
  def shingles(text: Column): Column = {
    val toks = filter(split(text, " "), x => length(x) > 0)
    // closure-free 3-gram build (shifted-slice zip_with — the
    // element_at(toks, i) capture re-ran the tokenize per position in
    // interpreted HOF eval; this is the parity twin of the native
    // ShingleHashesSorted, but the repo rule holds everywhere)
    def sliceN(from: Int) = slice(toks, lit(from), greatest(size(toks) - 2, lit(0)))
    val grams = zip_with(
      zip_with(sliceN(1), sliceN(2), (x, y) => concat(x, lit(" "), y)),
      sliceN(3), (x, y) => concat(x, lit(" "), y))
    array_distinct(when(size(toks) >= 3, grams).otherwise(array(text)))
  }

  def duckShingles(textExpr: String): String = {
    val toks = s"list_filter(string_split($textExpr, ' '), x -> len(x) > 0)"
    s"list_distinct(CASE WHEN len($toks) >= 3 THEN " +
      s"list_transform(range(1, len($toks) - 1), i -> " +
      s"$toks[i] || ' ' || $toks[i+1] || ' ' || $toks[i+2]) " +
      s"ELSE [$textExpr] END)"
  }

  /** MinHash signature (k hashes) over shingle poly-hashes:
    * sig_i = min_h ((2i+3)*h + 7i+1) mod P. Native; HOF twin kept for
    * cross-checks. */
  def minhashSig(shingleHashes: Column, k: Int): Column =
    Kernels.ofExpr(
      graft.vector.MinhashSignature(Kernels.exprOf(shingleHashes), k, Embedder.Prime))

  /** HOF twin of [[minhashSig]]. */
  def minhashSigHof(shingleHashes: Column, k: Int): Column =
    transform(sequence(lit(0L), lit(k.toLong - 1)),
      i => array_min(transform(shingleHashes,
        h => (h * (i * 2 + 3) + i * 7 + 1) % lit(Embedder.Prime))))

  def duckMinhashSig(hashesExpr: String, k: Int): String =
    s"list_transform(range(0, $k), i -> list_min(list_transform($hashesExpr, " +
      s"h -> (h * (i * 2 + 3) + i * 7 + 1) % 1000003)))"

  /** MinHash+LSH near-dup pairs: shingle → minhash(k=8) → bands of 2 →
    * explode band keys → self-join on (band, value) bucket → verify
    * exact Jaccard ≥ threshold. The only wide ops are the bucket
    * groupless join (shuffle on band key) and the final distinct. */
  /** Shared shingle-hash projection: sorted distinct long hashes (the
    * sort is once per doc, so pair verification is an allocation-free
    * merge — JaccardSorted). Native one-pass expression; HOF twin
    * in [[shingleHashesHof]]. */
  def shingleHashes(text: Column): Column =
    Kernels.ofExpr(graft.vector.ShingleHashesSorted(
      Kernels.exprOf(text), 3, 31L, Embedder.Prime))

  /** HOF twin of [[shingleHashes]]. */
  def shingleHashesHof(text: Column): Column =
    array_sort(array_distinct(
      transform(shingles(text), s => Embedder.tokenHash(s))))

  private def withShingleHashes(corpus: DataFrame): DataFrame =
    corpus.withColumn("hs", shingleHashes(col("text")))

  private def jaccard(a: Column, b: Column): Column =
    Kernels.ofExpr(graft.vector.JaccardSorted(Kernels.exprOf(a), Kernels.exprOf(b)))

  /** Solve (bands b, rows r) for an `nHashes`-wide MinHash signature
    * targeting Jaccard `threshold` t: over divisor pairs b·r = n, pick
    * the pair whose implied S-curve threshold (1/b)^(1/r) — the
    * similarity at which the collision probability 1−(1−s^r)^b crosses
    * steeply — sits closest to t. The standard LSH tuning rule
    * (Leskovec/Rajaraman/Ullman, MMDS §3.4): more rows per band →
    * fewer false positives (bucket joins shrink), more bands → fewer
    * false negatives. At 100 TB the bucket-join volume is the cost
    * model, so pick the threshold honestly rather than over-banding.
    * The fixture queries pin (k=8, bands of 2) for oracle stability;
    * production callers size via this solver. */
  def lshParams(nHashes: Int, threshold: Double): (Int, Int) = {
    require(nHashes > 0, "nHashes must be positive")
    require(threshold > 0 && threshold < 1, "threshold must be in (0,1)")
    (1 to nHashes).filter(nHashes % _ == 0)
      .map(b => (b, nHashes / b))
      .minBy { case (b, r) =>
        math.abs(math.pow(1.0 / b, 1.0 / r) - threshold)
      }
  }

  /** Bucket-collision probability of a (b, r) banding at similarity
    * `s`: 1 − (1 − s^r)^b — the S-curve [[lshParams]] tunes. */
  def lshCollisionProb(b: Int, r: Int, s: Double): Double =
    1.0 - math.pow(1.0 - math.pow(s, r), b)

  /** Shared signature→bands derivation: (bands(id, band, bval),
    * hs(id, hs)) for one corpus — the ONE banding definition
    * [[minhashPairs]] and [[dedupAgainstHistory]] both build on
    * (callers pick their own shuffle). */
  private def sigBands(
      corpus: DataFrame, k: Int,
      idName: String, hsName: String,
      materialize: Boolean = false): (DataFrame, DataFrame) = {
    val withSig = sigFrame(corpus, k, materialize)
    val hsTable = withSig.select(col("doc_id").as(idName), col("hs").as(hsName))
    val bands = withSig.select(
      col("doc_id").as(idName),
      posexplode(transform(sequence(lit(0), lit(k / 2 - 1)),
        j => concat_ws(":",
          element_at(col("sig"), j * 2 + 1),
          element_at(col("sig"), j * 2 + 2)))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bval")
    (bands, hsTable)
  }

  /** The one (doc_id, hs, sig) projection behind [[sigBands]] — the
    * corpus pass that shingle-hashes and signs every document.
    * `materialize = true` checkpoints it (through the [[Ckpt]]
    * durable switch): the pair operators consume this frame THREE
    * times (the band explode plus one shingle-array fetch per join
    * side), and without materialization each consumer re-runs the
    * full scan + ShingleHashesSorted + MinhashSignature pass — AQE
    * reuses exchanges, but there is no exchange below this narrow map
    * to reuse (measured r18: the shingle pass ran 3x per pair query).
    * Text and every other corpus column are projected OUT before the
    * checkpoint so only the hash material is materialized.
    * The streaming/incremental paths keep `materialize = false`:
    * their per-batch fresh side is consumed inside one
    * foreachBatch-scoped plan and a checkpoint per micro-batch would
    * pin block-manager state batch over batch. */
  private[graft] def sigFrame(
      corpus: DataFrame, k: Int, materialize: Boolean = false): DataFrame = {
    val raw = withShingleHashes(corpus)
      .withColumn("sig", minhashSig(col("hs"), k))
      .select(col("doc_id"), col("hs"), col("sig"))
    if (materialize && Sizing.approxRows(corpus) >= Sizing.MaterializeRowsMin)
      Ckpt(raw)
    else raw
  }

  /** Fixture-pinned MinHash pairing (k=8, bands of 2, ~1e6 hash
    * space). CORPUS-SCALE CALLERS USE [[minhashPairsAuto]]: the r13
    * 4th-decade sweep (5.2M docs) measured this banding at exponent
    * 1.63 (114 s) because its chance-candidate mass grows ∝ J² per
    * pair (r=2) and the ~1e6 feature-hash space saturates (53M
    * distinct candidate pairs, each dragging two shingle arrays
    * through the verify joins). The suite keeps this form pinned for
    * oracle stability — its DuckDB twin shares the hash space. */
  def minhashPairs(
      corpus: DataFrame, k: Int = 8, jaccardMin: Double = 0.5,
      maxBucket: Int = 1000): DataFrame = {
    val (rawBands, hsTable) =
      sigBands(corpus, k, "doc_id", "hs", materialize = true)
    // shuffle on the bucket key: computes signatures once; both join
    // sides reuse the exchange
    val sized = rawBands.repartition(col("band"), col("bval"))
    // hot-bucket cap, the LSH self-join's skew bound: a band value
    // shared by B docs yields B²/2 candidate pairs — one viral
    // boilerplate cluster at corpus scale is a quadratic blowup inside
    // a single bucket. Buckets past `maxBucket` are dropped (the same
    // documented coverage bound as substringPairs; members that large
    // are near-certain exact-dup clusters, which exact dedup already
    // settles). Implementation: a count window riding the bucket
    // partitioning — one in-partition sort by the bucket key, no new
    // exchange, and no adversarial failure mode. The alternative
    // (aggregate the hot list, broadcast anti-join) measured equal at
    // sf0.1 (0.74s vs 0.84s min-of-3, within box noise) but its
    // broadcast grows with the NUMBER of hot buckets — the exact
    // adversarial input the cap exists for — while the window's cost
    // is flat whatever the data does.
    val bands = sized
      .withColumn("_bn", count(lit(1)).over(
        Window.partitionBy(col("band"), col("bval"))))
      .filter(col("_bn") <= maxBucket)
      .drop("_bn")
    // candidate ids (duplicated across colliding bands — NOT distinct
    // here: deduping first would shuffle every raw candidate pair,
    // which dwarfs re-running the allocation-free Jaccard on the ≤4
    // band duplicates), scored via small broadcast lookups of the
    // per-doc shingle sets, deduped only after the threshold filter
    // has cut the set to actual near-dups
    val cands = bands.select(col("band"), col("bval"), col("doc_id").as("id_a"))
      .join(bands.select(col("band"), col("bval"), col("doc_id").as("id_b")),
        Seq("band", "bval"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
    // plain equi-joins back to the per-doc shingle sets: AQE broadcasts
    // them when genuinely small, and at corpus scale (where the full
    // shingle table can never be broadcast) these stay shuffle joins
    cands
      .join(hsTable.select(col("doc_id").as("id_a"), col("hs").as("hs_a")), Seq("id_a"))
      .join(hsTable.select(col("doc_id").as("id_b"), col("hs").as("hs_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(jaccard(col("hs_a"), col("hs_b")), 6).as("jaccard"))
      .filter(col("jaccard") >= jaccardMin)
      .distinct()
  }

  /** Identity-grade (60-bit md5-prefix) shingle hashes, sorted
    * distinct — the wide twin of [[shingleHashes]] for corpus-scale
    * near-dup work. The ~1e6 poly space is a FEATURE-BUCKET width
    * (fine for the oracle-pinned fixtures); as a shingle IDENTITY it
    * saturates around 1M distinct shingles — the r13 4th-decade sweep
    * measured every one of the 1000003 values occupied at 5.2M docs
    * (max df 200322), which destroys df-based pruning and inflates
    * minhash chance collisions. 60 bits keep collisions ~n²/2⁶⁰ ≈ 0
    * at any realistic corpus (the CLAUDE.md identity-vs-bucket rule,
    * applied to shingles). */
  def shingleHashes64(text: Column): Column =
    array_sort(array_distinct(
      transform(shingles(text), s => Embedder.stringHash64(s))))

  /** Recall-honest MinHash banding for [[minhashPairsAuto]]: pick the
    * DEEPEST rows-per-band r (in 2..8) whose band count for
    * `1 − (1 − t^r)^bands ≥ targetRecall` stays ≤ 64, then that band
    * count. Deeper bands cut chance candidates ∝ J^r per pair — the
    * r=2 of the pinned query passes J² mass (a J=0.25 pair collides
    * with p≈0.06 per band), which the r13 sweep measured as 53M junk
    * candidates at 5.2M docs; r=4 drops the same pair to p≈0.004.
    * At t=0.5 this yields (47 bands × 4 rows, k=188); at t=0.9,
    * (6 × 8, k=48). Returns (bands, rowsPerBand). */
  def minhashAutoParams(
      jaccardMin: Double, targetRecall: Double = 0.95): (Int, Int) = {
    require(jaccardMin > 0 && jaccardMin < 1 &&
      targetRecall > 0 && targetRecall < 1,
      s"minhashAutoParams needs 0 < jaccardMin < 1, 0 < targetRecall < 1; " +
        s"got jaccardMin=$jaccardMin targetRecall=$targetRecall")
    def bandsFor(r: Int): Int = {
      val q = math.pow(jaccardMin, r)
      math.max(1, math.ceil(math.log(1 - targetRecall) / math.log(1 - q)).toInt)
    }
    (2 to 8).filter(r => bandsFor(r) <= 64).lastOption match {
      case Some(r) => (bandsFor(r), r)
      case None =>
        // infeasible floor (jaccardMin below ~0.18 at recall 0.95): no
        // r reaches the target within 64 bands. The r13 advisor caught
        // the old fallback returning bandsFor(2) UNCAPPED — e.g.
        // jaccardMin=0.1 gave 299 bands / k=598, exactly the signature
        // blow-up this solver exists to prevent. Cap at the same 64
        // bands the search used and say loudly what recall that buys
        // (the lshAutoParams ceiling-binds pattern).
        val b = math.min(64, bandsFor(2))
        val achieved = 1 - math.pow(1 - jaccardMin * jaccardMin, b)
        System.err.println(
          f"[graft] minhashAutoParams: jaccardMin=$jaccardMin%.3f is " +
            f"below the feasible floor for targetRecall=$targetRecall%.3f " +
            f"within the 64-band cap — capped at ($b%d bands, r=2), " +
            f"nominal recall at the threshold $achieved%.3f")
        (b, 2)
    }
  }

  /** Corpus-scale MinHash near-dup pairing — the scale twin of
    * [[minhashPairs]] (the same relationship [[simhashPairs64]] has to
    * the 32-bit oracle form): identity-grade 60-bit shingle hashes
    * ([[shingleHashes64]]), recall-honest deep banding
    * ([[minhashAutoParams]]), the hot-bucket cap engaged, and the
    * candidate pair set DISTINCT'd before the shingle-array fetch
    * (deep bands duplicate a true pair up to `bands` times; the
    * pinned query's ≤4 duplicates argument does not hold at 47 bands).
    * Output semantics: pairs with exact string-set Jaccard ≥
    * `jaccardMin` among band-collided candidates, at ≥ `targetRecall`
    * nominal recall at the threshold — the Jaccard here is
    * collision-free (wide hashes), i.e. the TRUE shingle-set Jaccard
    * rather than the ~1e6-bucketed approximation the pinned oracle
    * form computes.
    *
    * Per-permutation minhash values are `(h XOR seed_i) mod (2³¹−1)`
    * — overflow-free under ANSI (h < 2⁶⁰, no multiply), distributed
    * by the md5 base hash; the per-band chance collision is then
    * (m/2³¹)^r ≈ 0, so chance candidates vanish and candidate volume
    * is carried by genuinely-similar pairs (∝ Σ bands·J^r). */
  /** Seed base shared by the native wide signature and its HOF twin. */
  private val MhSeedBase = 0x9E3779B97F4A7C15L
  private val MhPrime31 = 2147483647L

  /** Wide-hash minhash signature: sig_i = min_h ((h XOR seed_i) mod
    * (2³¹−1)). Native one-pass expression; HOF twin below for parity
    * cross-checks (the twin is 8× slower interpreted — measured 6.0 s
    * vs 0.7 s at sf0.1 — and exists as documentation + audit, not the
    * hot path). */
  def minhashSigXor(shingleHashes: Column, k: Int): Column =
    Kernels.ofExpr(graft.vector.MinhashSigXor(
      Kernels.exprOf(shingleHashes), k, MhPrime31, MhSeedBase))

  /** HOF twin of [[minhashSigXor]] — same seeds, same arithmetic. */
  def minhashSigXorHof(shingleHashes: Column, k: Int): Column = {
    val seeds = {
      var x = MhSeedBase
      Array.fill(k) {
        x ^= x << 13; x ^= x >>> 7; x ^= x << 17
        x & ((1L << 60) - 1)
      }
    }
    array((0 until k).map(i => array_min(transform(shingleHashes,
      h => pmod(h.bitwiseXOR(lit(seeds(i))), lit(MhPrime31))))): _*)
  }

  def minhashPairsAuto(
      corpus: DataFrame, jaccardMin: Double = 0.5,
      targetRecall: Double = 0.95, maxBucket: Int = 1000): DataFrame = {
    val (b, r) = minhashAutoParams(jaccardMin, targetRecall)
    val k = b * r
    // materialized past the size gate (Ckpt durable switch) for the
    // same reason as minhashPairs' sigFrame: three consumers (band
    // explode + one shingle-array fetch per verify side) otherwise
    // each re-run the full scan + 60-bit shingle + xor-sig pass — at
    // corpus scale the most expensive narrow stage this operator has
    val shRaw = corpus.withColumn("hs", shingleHashes64(col("text")))
      .withColumn("sig", minhashSigXor(col("hs"), k))
      .select(col("doc_id"), col("hs"), col("sig"))
    val sh =
      if (Sizing.approxRows(corpus) >= Sizing.MaterializeRowsMin) Ckpt(shRaw)
      else shRaw
    val bvals = array((0 until b).map(g => concat_ws(":",
      (0 until r).map(j =>
        element_at(col("sig"), g * r + j + 1).cast("string")): _*)): _*)
    val rawBands = sh.select(col("doc_id"), posexplode(bvals))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bval")
      .repartition(col("band"), col("bval"))
    val bands = rawBands
      .withColumn("_bn", count(lit(1)).over(
        Window.partitionBy(col("band"), col("bval"))))
      .filter(col("_bn") <= maxBucket)
      .drop("_bn")
    val cands = bands.select(col("band"), col("bval"), col("doc_id").as("id_a"))
      .join(bands.select(col("band"), col("bval"), col("doc_id").as("id_b")),
        Seq("band", "bval"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    val hsTable = sh.select(col("doc_id"), col("hs"))
    cands
      .join(hsTable.select(col("doc_id").as("id_a"), col("hs").as("hs_a")), Seq("id_a"))
      .join(hsTable.select(col("doc_id").as("id_b"), col("hs").as("hs_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(jaccard(col("hs_a"), col("hs_b")), 6).as("jaccard"))
      .filter(col("jaccard") >= jaccardMin)
  }

  /** DuckDB twins of [[sigBands]] — one definition feeding both the
    * self-dedup and against-history oracles. */
  private def duckSigsCte(src: String, k: Int): String =
    s"""SELECT doc_id, hs, ${duckMinhashSig("hs", k)} AS sig FROM (
       |  SELECT doc_id, list_distinct(list_transform(sh, s -> ${Embedder.duckStringHash("s")})) AS hs FROM (
       |    SELECT doc_id, ${duckShingles("text")} AS sh FROM $src) z
       |  ) y""".stripMargin

  private def duckBandsCte(sigs: String, k: Int): String =
    s"""SELECT doc_id, hs, j AS band,
       |    sig[j*2+1]::VARCHAR || ':' || sig[j*2+2]::VARCHAR AS bval
       |  FROM $sigs, (SELECT unnest(range(0, ${k / 2})) AS j) js""".stripMargin

  /** The WITH-body CTE chain ending in `kept(id_a, id_b, jaccard)` —
    * the verified near-dup pair set; shared by the minhash oracle and
    * every oracle that consumes the pair GRAPH (x_dedup_pagerank). */
  def duckMinhashPairsCtes(
      k: Int = 8, jaccardMin: Double = 0.5, maxBucket: Int = 1000): String =
    s"""corpus AS ($duckCorpusWithDups),
       |sigs AS (${duckSigsCte("corpus", k)}),
       |bands0 AS (${duckBandsCte("sigs", k)}),
       |bands AS (SELECT * FROM (SELECT *, count(*) OVER (PARTITION BY band, bval) AS bn
       |    FROM bands0) z WHERE bn <= $maxBucket),
       |pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       |    ROUND(len(list_intersect(a.hs, b.hs))::DOUBLE / len(list_distinct(a.hs || b.hs))::DOUBLE, 6) AS jaccard
       |  FROM bands a JOIN bands b ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id),
       |kept AS (SELECT id_a, id_b, jaccard FROM pairs WHERE jaccard >= $jaccardMin)""".stripMargin

  def duckMinhashPairs(
      k: Int = 8, jaccardMin: Double = 0.5, maxBucket: Int = 1000): String =
    s"""WITH ${duckMinhashPairsCtes(k, jaccardMin, maxBucket)}
       |SELECT id_a, id_b, jaccard FROM kept
       |ORDER BY id_a, id_b""".stripMargin

  /** MinHash accuracy audit: on every verified near-dup pair, the
    * SIGNATURE-based Jaccard estimate (fraction of agreeing minhash
    * components — the only similarity a signature store can compute
    * without the shingle sets) beside the exact Jaccard, plus the
    * absolute error. The measured-accuracy companion to
    * x_ann_recall/x_dedup_lsh_recall: it answers "how many hashes do
    * I need before the estimate is decision-grade", which sizes the
    * signature store at 100 TB (k components × 8 bytes per doc IS the
    * dedup index). Estimates are exact multiples of 1/k, so the 6dp
    * round is drift-free. */
  def minhashEstimate(corpus: DataFrame, k: Int = 8): DataFrame = {
    val pairs = minhashPairs(corpus, k).select(col("id_a"), col("id_b"), col("jaccard"))
    val sigs = withShingleHashes(corpus)
      .select(col("doc_id"), minhashSig(col("hs"), k).as("sig"))
    val agree = size(filter(zip_with(col("sa"), col("sb"),
      (x, y) => x === y), b => b))
    pairs
      .join(sigs.select(col("doc_id").as("id_a"), col("sig").as("sa")), Seq("id_a"))
      .join(sigs.select(col("doc_id").as("id_b"), col("sig").as("sb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), col("jaccard"),
        round(agree.cast("double") / k, 6).as("est"))
      .withColumn("err", round(abs(col("est") - col("jaccard")), 6))
  }

  /** DuckDB twin of [[minhashEstimate]]. */
  def duckMinhashEstimate(k: Int = 8): String =
    s"""WITH ${duckMinhashPairsCtes(k)},
       |sg AS (SELECT doc_id, sig FROM sigs)
       |SELECT id_a, id_b, jaccard,
       |  ROUND(len(list_filter(range(1, $k + 1), i -> a.sig[i] = b.sig[i]))::DOUBLE / $k, 6) AS est,
       |  ROUND(abs(ROUND(len(list_filter(range(1, $k + 1), i -> a.sig[i] = b.sig[i]))::DOUBLE / $k, 6) - jaccard), 6) AS err
       |FROM kept JOIN sg a ON a.doc_id = kept.id_a
       |JOIN sg b ON b.doc_id = kept.id_b
       |ORDER BY id_a, id_b""".stripMargin

  /** Incremental dedup: flag NEW documents that near-duplicate the
    * EXISTING corpus — the nightly-crawl-vs-history gate, distinct
    * from self-dedup (new×new pairs are a separate pass; history×
    * history was settled when history was ingested). At scale the
    * history side's (band, bval) table is a persisted index built
    * once and reused per batch — each run shuffles only the new
    * batch's bands into it; candidate verification is the same
    * allocation-free sorted-set Jaccard as [[minhashPairs]], verified
    * before the distinct so only real matches pay the dedup shuffle. */
  def dedupAgainstHistory(
      history: DataFrame,
      fresh: DataFrame,
      k: Int = 8,
      jaccardMin: Double = 0.5): DataFrame = {
    val (hb, hhs) = sigBands(history, k, "hist_id", "hs_h")
    val (fb, fhs) = sigBands(fresh, k, "new_id", "hs_f")
    verifyBandMatches(fb, fhs, hb, hhs, jaccardMin)
  }

  /** [[dedupAgainstHistory]] against a PERSISTED band/shingle index —
    * the at-scale form its scaladoc promises: the history side is the
    * (hist_id, band, bval) + (hist_id, hs_h) tables appended to as
    * batches commit, so each run pays O(new batch), never a
    * re-shingling of the whole history. The streaming near-dup gate
    * ([[graft.streaming.Streams.streamingNearDupGate]]) maintains that
    * index batch-over-batch. */
  def dedupAgainstBandIndex(
      histBands: DataFrame,
      histHs: DataFrame,
      fresh: DataFrame,
      k: Int = 8,
      jaccardMin: Double = 0.5): DataFrame = {
    val (fb, fhs) = sigBands(fresh, k, "new_id", "hs_f")
    verifyBandMatches(fb, fhs, histBands, histHs, jaccardMin)
  }

  /** Fresh-side bands for maintaining a persisted history index. */
  private[graft] def freshBands(fresh: DataFrame, k: Int = 8): (DataFrame, DataFrame) =
    sigBands(fresh, k, "hist_id", "hs_h")

  // -- Bloom-prefiltered exact incremental dedup ---------------------

  /** Tag each fresh row with a broadcast-Bloom verdict over the
    * HISTORY's content hashes: `maybe = false` proves the hash is not
    * in history (Bloom filters have no false negatives), `maybe =
    * true` means "cannot rule out" and must be confirmed by the join.
    * The sketch is built with Spark's `DataFrameStatFunctions
    * .bloomFilter` (one distributed aggregation over history, a
    * driver-merged fixed-size bit array) and broadcast; the probe runs
    * in `mapPartitions` because a sketch lookup is genuinely opaque to
    * Catalyst — this is the sanctioned per-partition-imperative
    * escape, not a per-row UDF in a hot expression. */
  private[graft] def bloomTagged(
      history: DataFrame,
      fresh: DataFrame,
      expectedItems: Long,
      fpp: Double): DataFrame = {
    val spark = fresh.sparkSession
    import spark.implicits._
    val bloom = history.select(md5(col("text")).as("h"))
      .stat.bloomFilter("h", expectedItems, fpp)
    val bc = spark.sparkContext.broadcast(bloom)
    fresh.select(col("doc_id").as("new_id"), md5(col("text")).as("h"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val b = bc.value
        it.map { case (id, h) => (id, h, b.mightContainString(h)) }
      }
      .toDF("new_id", "h", "maybe")
  }

  /** Exact (content-hash) incremental dedup with a broadcast Bloom
    * pre-filter — the at-scale gate in FRONT of the history join.
    *
    * The plain formulation shuffles every new row into an equi-join
    * against the history's hash table; at 100 TB/day of mostly-novel
    * crawl the join is the whole cost even though almost nothing
    * matches. A Bloom filter over the history hashes (a few hundred
    * MB for billions of keys at 1% fpp — broadcastable) answers
    * "definitely new" for the typical >90% of rows with ZERO shuffle;
    * only the rows the sketch cannot rule out pay the confirming
    * join, where false positives are weeded. The output is therefore
    * EXACTLY the plain join's output — the sketch is a cost lever,
    * never a semantics change — which is what the oracle and the
    * OpsSpec equivalence case pin.
    *
    * Returns (new_id, dup_of): dup_of = the smallest matching history
    * id, null for genuinely new documents. */
  def dedupIncrementalBloom(
      history: DataFrame,
      fresh: DataFrame,
      expectedItems: Long = 1000000L,
      fpp: Double = 0.01): DataFrame = {
    val tagged = bloomTagged(history, fresh, expectedItems, fpp)
    val hHash = history.select(col("doc_id").as("hist_id"), md5(col("text")).as("h"))
    val confirmed = tagged.filter(col("maybe"))
      .join(hHash, Seq("h"), "left")
      .groupBy(col("new_id")).agg(min(col("hist_id")).as("dup_of"))
    val definiteNew = tagged.filter(!col("maybe"))
      .select(col("new_id"), lit(null).cast("long").as("dup_of"))
    confirmed.unionByName(definiteNew)
  }

  /** DuckDB oracle for the STREAMING near-dup gate
    * (`graft.streaming.Streams.streamingNearDupGate`): identical
    * banding over the 3-batch corpus, with batch provenance recovered
    * from the id (planted ids ≥ 1000000 are batch 2, otherwise
    * doc_id % 2) and a doc flagging against STRICTLY earlier batches
    * only — the first-seen-wins arrival semantics the stream enforces
    * by construction. Lives here because it shares the private
    * sig/band CTE builders with the batch dedup oracles. */
  private[graft] def duckStreamingGate(
      k: Int = 8, jaccardMin: Double = 0.5): String = {
    def batch(id: String) = s"(CASE WHEN $id >= 1000000 THEN 2 ELSE $id % 2 END)"
    s"""WITH corpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000 AS doc_id, text || ' zz yy xx' AS text
       |  FROM documents WHERE doc_id % 25 = 0),
       |sigs AS (${duckSigsCte("corpus", k)}),
       |bands AS (${duckBandsCte("sigs", k)})
       |SELECT DISTINCT f.doc_id AS new_id, h.doc_id AS hist_id,
       |  ROUND(len(list_intersect(f.hs, h.hs))::DOUBLE /
       |    len(list_distinct(f.hs || h.hs))::DOUBLE, 6) AS jaccard
       |FROM bands f JOIN bands h ON f.band = h.band AND f.bval = h.bval
       |  AND ${batch("h.doc_id")} < ${batch("f.doc_id")}
       |WHERE ROUND(len(list_intersect(f.hs, h.hs))::DOUBLE /
       |    len(list_distinct(f.hs || h.hs))::DOUBLE, 6) >= $jaccardMin
       |ORDER BY new_id, hist_id""".stripMargin
  }

  private def verifyBandMatches(
      fb: DataFrame, fhs: DataFrame,
      hb: DataFrame, hhs: DataFrame,
      jaccardMin: Double): DataFrame =
    fb.join(hb, Seq("band", "bval"))
      .select(col("new_id"), col("hist_id"))
      .join(fhs, Seq("new_id"))
      .join(hhs, Seq("hist_id"))
      .select(col("new_id"), col("hist_id"),
        round(jaccard(col("hs_f"), col("hs_h")), 6).as("jaccard"))
      .filter(col("jaccard") >= jaccardMin)
      .distinct()

  // -- SimHash -----------------------------------------------------

  /** 32-bit SimHash from token poly-hashes: bit j of the fingerprint
    * is the sign of Σ_tokens (2*bit_j(h32(tok)) - 1), where h32 is the
    * char-fold mod 2^31-1. */
  def simhash(text: Column): Column =
    Kernels.ofExpr(graft.vector.SimhashBits(
      graft.vector.PolyTokenHashes(Kernels.exprOf(text), 131L, 2147483647L)))

  /** HOF twin of [[simhash]] (single pass over tokens: per-bit ±1
    * counters, then assemble the fingerprint). */
  def simhashHof(text: Column): Column = {
    val P31 = 2147483647L
    val toks = filter(split(text, " "), x => length(x) > 0)
    val hs = transform(toks,
      tok => aggregate(split(tok, ""), lit(0L),
        (a, c) => (a * 131 + ascii(c)) % lit(P31)))
    val bitCounts = aggregate(
      hs,
      array_repeat(lit(0L), 32),
      (acc, h) => zip_with(acc, sequence(lit(0L), lit(31L)),
        (c, j) => c + (floor(h.cast("double") / pow(lit(2.0), j.cast("double"))).cast("long") % 2L) * 2L - 1L))
    aggregate(
      zip_with(bitCounts, sequence(lit(0L), lit(31L)),
        (c, j) => when(c > 0, floor(pow(lit(2.0), j.cast("double"))).cast("long")).otherwise(lit(0L))),
      lit(0L),
      (a, b) => a + b)
  }

  def duckSimhash(textExpr: String): String = {
    val hs = s"list_transform(list_filter(string_split($textExpr, ' '), x -> len(x) > 0), " +
      "tok -> list_reduce(list_transform(string_split(tok, ''), c -> ascii(c)::BIGINT), " +
      "(a, c) -> (a * 131 + c) % 2147483647))"
    s"list_reduce(list_transform(range(0, 32), j -> CASE WHEN " +
      s"list_sum(list_transform($hs, h -> (floor(h / 2.0 ** j)::BIGINT % 2) * 2 - 1)) > 0 " +
      s"THEN (2.0 ** j)::BIGINT ELSE 0 END), (a, b) -> a + b)"
  }

  /** SimHash near-dup pairs — the public name DELEGATES to the 64-bit
    * implementation ([[simhashPairs64]], measured exponent 0.44): the
    * operator a user reaches for by name must be the one that survives
    * a corpus, not the 32-bit variant whose random-collision rate
    * (~1.3e-6/pair) makes its OUTPUT quadratic at scale. The 32-bit
    * form survives as [[simhashPairs32Oracle]] for the frozen suite
    * query only (r12 verdict, What's wrong #3). */
  def simhashPairs(corpus: DataFrame, maxHamming: Int = 3): DataFrame =
    simhashPairs64(corpus, maxHamming)

  /** LEGACY 32-bit SimHash pairs, oracle-pinned: kept solely because
    * the frozen suite query `x_dedup_simhash` hashes against the
    * 32-bit DuckDB oracle ([[duckSimhashPairs]]) and the suite does
    * not change (r11 verdict). Not a corpus-scale operator — 4×8-bit
    * chunks give 1024 buckets total (every bucket hot by construction;
    * measured exponent 1.38) and the 32-bit fingerprint's collision
    * rate produces quadratic junk output at corpus row counts. New
    * callers use [[simhashPairs]], which is the 64-bit plan with
    * 4×16-bit chunks — same shape, 64× the bucket space, ~zero false
    * pairs. */
  def simhashPairs32Oracle(corpus: DataFrame, maxHamming: Int = 3): DataFrame = {
    val fp = corpus.withColumn("fp", simhash(col("text")))
    val chunks = fp.select(col("doc_id"), col("fp"),
      posexplode(transform(sequence(lit(0L), lit(3L)),
        j => floor(col("fp").cast("double") / pow(lit(256.0), j.cast("double"))).cast("long") % 256L)))
      .withColumnRenamed("pos", "ci").withColumnRenamed("col", "cv")
      // shuffle on the bucket key: computes each fingerprint once and
      // shares one exchange between both sides of the self-join
      .repartition(col("ci"), col("cv"))
    val a = chunks.select(col("ci"), col("cv"), col("doc_id").as("id_a"), col("fp").as("fp_a"))
    val b = chunks.select(col("ci"), col("cv"), col("doc_id").as("id_b"), col("fp").as("fp_b"))
    a.join(b, Seq("ci", "cv"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** 64-bit SimHash — the documented scale twin of [[simhash]],
    * realized after the r12 scale curves measured the 32-bit variant
    * at exponent 1.38 (154 s at the 100× corpus). Two failure modes,
    * both width-inherent: 4×8-bit chunks give 1024 buckets total, so
    * bucket population (and with it the candidate join) grows
    * quadratically; and the OUTPUT itself goes quadratic — random
    * 32-bit fingerprints land within hamming ≤ 3 with probability
    * ≈ 5489/2³² ≈ 1.3e−6, which at 500k docs is ~10⁵ false pairs
    * (Manku et al., WWW'07 use 64-bit fingerprints for exactly this
    * reason; at 64 bits the same probability is ~2e−15 — zero false
    * pairs at any realistic corpus). Built from two independent
    * 31-bit poly-hash Simhash halves (mults 131/137) — bits 31 and 63
    * are structurally zero, leaving 62 informative bits; no new
    * expression, both halves reuse the audited native. */
  def simhash64(text: Column): Column = {
    val P31 = 2147483647L
    def half(mult: Long): Column = Kernels.ofExpr(graft.vector.SimhashBits(
      graft.vector.PolyTokenHashes(Kernels.exprOf(text), mult, P31)))
    half(131L).bitwiseOR(shiftleft(half(137L), 32))
  }

  /** [[simhashPairs]] on the 64-bit fingerprint — pigeonhole-complete
    * for hamming ≤ 3 with Manku et al.'s multi-table blocking
    * (WWW'07 §3): the fingerprint splits into SIX blocks
    * (4×11 + 2×10 bits) and candidates key on every C(6,3) = 20
    * combination of THREE blocks packed into one long. A pair within
    * hamming ≤ 3 has its differing bits in at most 3 blocks, so at
    * least 3 blocks match — some 3-combo key collides. The suite keeps
    * the 32-bit query pinned for oracle stability; this is the variant
    * a corpus-scale deployment runs.
    *
    * Why combos and not the r12 4×16-bit chunks: a chunk key's bucket
    * space is FIXED (2^15–2^16 values), so bucket population grows
    * ∝ n and the candidate self-join ∝ n² — measured at the r13
    * 4th-decade corpus (5.2M docs): Σ population² went 1.7e9 → 1.4e11
    * (82× for 10× docs; 163 s wall). A 3-block combo key spans ~2^31
    * values, so chance collisions are ~n²/2^32 per table — at 5.2M
    * docs that is ~6k rows per table, and candidate volume is the 20n
    * posting rows plus near-dup matches: linear. Verification
    * (hamming over the full fingerprint) and therefore OUTPUT are
    * identical to the chunk plan — only candidate generation changed.
    *
    * Threshold semantics, measured honestly: with UNWEIGHTED ±1 token
    * votes, near-dup hamming scales with fingerprint width (the r12
    * fixture's 3-token-edit dups sit at hamming 0–8 on 32 bits but
    * 1–14 on 64), so hamming ≤ 3 at 64 bits is a STRICTER near-dup
    * test — verbatim and near-verbatim copies, fewer tiny-edit
    * catches on SHORT docs (long docs concentrate margins; Manku et
    * al.'s production variant adds tf-idf feature weighting for the
    * same reason). That strictness is what corpus-scale dedup wants
    * from simhash — tiny-edit recall on short text is the MinHash
    * family's job ([[minhashPairs]], already linear). */
  def simhashPairs64(corpus: DataFrame, maxHamming: Int = 3): DataFrame = {
    // 6 blocks tolerate ≤ 3 differing bits (pigeonhole over 3-combos);
    // a larger budget would need more blocks per key — refuse loudly
    // rather than silently losing pairs
    require(maxHamming <= 3,
      s"simhashPairs64's 6-block/3-combo blocking is pigeonhole-complete " +
        s"only for hamming <= 3; got maxHamming=$maxHamming")
    val fp = corpus.withColumn("fp", simhash64(col("text")))
    val blocks = Seq((0, 11), (11, 11), (22, 11), (33, 11), (44, 10), (54, 10))
    def blk(m: Int): Column =
      shiftright(col("fp"), blocks(m)._1).bitwiseAND(lit((1L << blocks(m)._2) - 1))
    val combos = (0 until 6).combinations(3).toSeq // 20, deterministic order
    val keys = array(combos.zipWithIndex.map { case (c, idx) =>
      ((lit(idx.toLong) * lit(2048L) + blk(c(0))) * lit(2048L) + blk(c(1))) *
        lit(2048L) + blk(c(2))
    }: _*)
    val tables = fp.select(col("doc_id"), col("fp"), explode(keys).as("k"))
      .repartition(col("k"))
    val a = tables.select(col("k"), col("doc_id").as("id_a"), col("fp").as("fp_a"))
    val b = tables.select(col("k"), col("doc_id").as("id_b"), col("fp").as("fp_b"))
    a.join(b, Seq("k"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  def duckSimhashPairs(maxHamming: Int = 3): String =
    s"""WITH corpus AS ($duckCorpusWithDups),
       |fps AS (SELECT doc_id, ${duckSimhash("text")} AS fp FROM corpus),
       |chunks AS (SELECT doc_id, fp, j AS ci, floor(fp / 256.0 ** j)::BIGINT % 256 AS cv
       |  FROM fps, (SELECT unnest(range(0, 4)) AS j) js),
       |pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       |    bit_count(xor(a.fp, b.fp))::INT AS hamming
       |  FROM chunks a JOIN chunks b ON a.ci = b.ci AND a.cv = b.cv AND a.doc_id < b.doc_id)
       |SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= $maxHamming
       |ORDER BY id_a, id_b""".stripMargin

  // -- n-gram Jaccard (blocked) ------------------------------------

  /** Blocked n-gram Jaccard: candidate pairs share a length-band block
    * AND (since r12) at least one of the probe doc's rarest shingles,
    * verified with exact 3-gram Jaccard.
    *
    * The r12 scale curves measured the block-only join at exponent
    * 2.04 (588 s at the 100× corpus): block population grows linearly
    * with the corpus, so all-pairs-within-block is quadratic — and the
    * join dragged both full shingle ARRAYS through the shuffle for
    * every in-block pair it would immediately reject. The added
    * prefix filter is LOSSLESS (same pigeonhole as
    * [[containmentPairs]]): J(A,B) ≥ t ⟹ |A∩B| ≥ t·|A∪B| ≥ t·|A|, so
    * B misses at most ⌊(1−t)·|A|⌋+1 of A's shingles (+1 for the 6dp
    * rounding slack of the ≥-t filter, a further +1 for the float
    * floor) — any ⌊(1−t)·|A|⌋+3 probe shingles of A must hit B.
    * Candidates join on (blk, h), so the block semantics are exactly
    * the oracle's; unrelated same-length docs (the quadratic mass)
    * almost never share a rare shingle and drop before any array
    * moves. Output pairs identical — the oracle is untouched.
    *
    * `wideHashes` (corpus-scale callers set true; default false keeps
    * the oracle-pinned hash space): the r13 4th-decade sweep measured
    * the ~1e6 shingle space SATURATED at 5.2M docs — all 1000003
    * values occupied, max df 200322 — so "rarest" shingles stop being
    * rare (df floors in the tens), the prefix filter loses its
    * selectivity, and the candidate shuffle exhausted 70 GB of scratch
    * disk. [[shingleHashes64]] keeps dfs honest at any corpus size;
    * the verified Jaccard is then the collision-free string-set value
    * (the semantics a corpus deployment wants) rather than the
    * bucketed approximation the pinned oracle computes. */
  def ngramJaccardPairs(
      corpus: DataFrame, jaccardMin: Double = 0.5,
      wideHashes: Boolean = false): DataFrame = {
    val hashed =
      if (wideHashes) corpus.withColumn("hs", shingleHashes64(col("text")))
      else withShingleHashes(corpus)
    // checkpointed past the size gate (Ckpt durable switch): the
    // shingle projection is consumed three times — the posting explode
    // and one array fetch per verify-join side — and each consumer
    // otherwise re-runs the full scan + shingle-hash pass (no exchange
    // below it for AQE to reuse); text is projected out so only
    // (doc_id, blk, hs) materializes. Below the gate the single-QE
    // form wins (fixture A/B r18) and the plan matches the pre-r18 one.
    val shRaw = hashed
      .withColumn("blk", (length(col("text")) / 16).cast("long"))
      .select(col("doc_id"), col("blk"), col("hs"))
    val sh =
      if (Sizing.approxRows(corpus) >= Sizing.MaterializeRowsMin) Ckpt(shRaw)
      else shRaw
    val posts = sh.select(col("doc_id"), col("blk"), explode(col("hs")).as("h"))
      .repartition(col("h"))
    val dfs = posts.groupBy(col("h")).agg(count(lit(1)).as("df"))
    val probeSets = posts.join(dfs, Seq("h"))
      .groupBy(col("doc_id"), col("blk"))
      .agg(sort_array(collect_list(struct(col("df"), col("h")))).as("sh"))
    val plen = least(size(col("sh")),
      (floor(lit(1.0 - jaccardMin) * size(col("sh"))) + lit(3L)).cast("int"))
    val probe = probeSets.select(col("doc_id").as("id_p"), col("blk"),
      explode(transform(slice(col("sh"), lit(1), plen),
        s => s.getField("h"))).as("h"))
    // either orientation's probe hitting suffices; canonicalize to
    // id_a < id_b before the dedup so a pair found both ways is one row
    val cands = probe
      .join(posts.select(col("blk"), col("h"), col("doc_id").as("id_f")),
        Seq("blk", "h"))
      .filter(col("id_p") =!= col("id_f"))
      .select(least(col("id_p"), col("id_f")).as("id_a"),
        greatest(col("id_p"), col("id_f")).as("id_b"))
      .distinct()
    cands
      .join(sh.select(col("doc_id").as("id_a"), col("hs").as("hs_a")), Seq("id_a"))
      .join(sh.select(col("doc_id").as("id_b"), col("hs").as("hs_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(jaccard(col("hs_a"), col("hs_b")), 6).as("jaccard"))
      .filter(col("jaccard") >= jaccardMin)
  }

  def duckNgramJaccardPairs(jaccardMin: Double = 0.5): String =
    s"""WITH corpus AS ($duckCorpusWithDups),
       |sh AS (SELECT doc_id, list_distinct(list_transform(${duckShingles("text")}, s -> ${Embedder.duckStringHash("s")})) AS hs,
       |    len(text) // 16 AS blk FROM corpus),
       |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |    ROUND(len(list_intersect(a.hs, b.hs))::DOUBLE / len(list_distinct(a.hs || b.hs))::DOUBLE, 6) AS jaccard
       |  FROM sh a JOIN sh b ON a.blk = b.blk AND a.doc_id < b.doc_id)
       |SELECT id_a, id_b, jaccard FROM pairs WHERE jaccard >= $jaccardMin
       |ORDER BY id_a, id_b""".stripMargin

  // -- containment near-dup (Broder) --------------------------------

  /** Asymmetric containment near-dup: C(A→B) = |S(A)∩S(B)| / |S(A)|
    * over shingle sets — the measure that finds EXCERPTS living inside
    * longer documents (quotes, chunked copies, syndicated leads),
    * which symmetric Jaccard structurally misses: a 40% excerpt has
    * J ≈ 0.4, below every Jaccard threshold, but C = 1.0.
    *
    * Plan: PREFIX-FILTERED inverted postings (the PPJoin/All-Pairs
    * candidate rule, Xiao et al. WWW'08 / Bayardo et al. WWW'07,
    * adapted to asymmetric containment). Shingles with more than
    * `maxDf` postings drop from BOTH sides first — boilerplate, not
    * containment evidence — and the containment denominator is the
    * CAPPED shingle count, keeping the measure consistent with its
    * own universe. Then, instead of self-joining the FULL capped
    * postings (whose output is Σ_h df², and the df distribution
    * SHIFTS UP with corpus size — measured super-linear at exponent
    * 1.42 on the r12 scale curves: 840M joined rows at 100× vs 35M at
    * 10×), each doc probes with only its `⌊(1−t)·|A|⌋+3` RAREST
    * shingles (global (df, h) order): if C(A→B) ≥ t then B misses at
    * most ⌊(1−t)·|A|⌋+1 of A's shingles (the +1 absorbs the 6dp
    * rounding slack of the ≥-t filter, the further +1 the floating
    * floor's ulp hazard), so any that-many-plus-one probe shingles
    * must hit B — a LOSSLESS candidate pruning, and rarest-first makes
    * it maximally selective (a df=1 probe shingle is in no other doc
    * and generates zero candidates, which is exactly the verdict "no
    * B can contain A at this threshold" for docs of mostly-unique
    * content). Survivors verify exactly against the two docs' capped
    * shingle ARRAYS (`array_intersect` — per-candidate work, no
    * re-join of the posting table). Candidate volume is Σ over probe
    * postings of df(h) with df capped and probes ~(1−t) of each doc —
    * linear in the corpus at fixed t (re-measured exponent ≤ ~1 on
    * the same curve after this change).
    *
    * Document frequency stays a sort-free hash AGGREGATE on the one
    * explicit h-shuffle of the posting table (ReuseExchange dedupes
    * the subtree across the df aggregate, the cap join, and the
    * candidate probe — the r9 window formulation sorted the posting
    * table once per side, plan-asserted gone). */
  def containmentPairs(
      corpus: DataFrame,
      containMin: Double = 0.9,
      maxDf: Long = 64L): DataFrame = {
    val posts = withShingleHashes(corpus)
      .select(col("doc_id"), explode(col("hs")).as("h"))
      .repartition(col("h"))
    val dfs = posts.groupBy(col("h")).agg(count(lit(1)).as("df"))
    val rare = posts
      .join(dfs.filter(col("df") <= maxDf), Seq("h"))
      .select(col("doc_id"), col("h"), col("df"))
    // per-doc capped shingle set, rarest-first ((df, h) struct sort —
    // deterministic; correctness needs only SOME fixed probe subset).
    // NOT checkpointed, deliberately (r18): the collect_list final does
    // re-run once per consumer (probe + one array fetch per verify-join
    // side), but all three runs share the doc_id exchange through AQE
    // runtime stage reuse AND run concurrently — while a checkpoint
    // here SPLITS the query into two executions, and exchange reuse
    // cannot span them, so the candidate join's `rare` side re-ran the
    // whole scan+shingle+df pipeline a second time (measured: the
    // checkpointed form was ~1s SLOWER at sf0.1 and duplicates the
    // posting pass at any scale).
    val shSets = rare.groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("df"), col("h")))).as("sh"))
    val plen = least(size(col("sh")),
      (floor(lit(1.0 - containMin) * size(col("sh"))) + lit(3L)).cast("int"))
    val probe = shSets.select(col("doc_id").as("id_a"),
      explode(transform(slice(col("sh"), lit(1), plen),
        s => s.getField("h"))).as("h"))
    val cands = probe
      .join(rare.select(col("h"), col("doc_id").as("id_b")), Seq("h"))
      .filter(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    val setsA = shSets.select(col("doc_id").as("id_a"),
      transform(col("sh"), s => s.getField("h")).as("set_a"),
      size(col("sh")).cast("double").as("sz_a"))
    val setsB = shSets.select(col("doc_id").as("id_b"),
      transform(col("sh"), s => s.getField("h")).as("set_b"))
    cands
      .join(setsA, Seq("id_a"))
      .join(setsB, Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(size(array_intersect(col("set_a"), col("set_b"))).cast("double")
          / col("sz_a"), 6).as("containment"))
      .filter(col("containment") >= containMin)
  }

  /** Corpus + planted prefix EXCERPTS (~40% of tokens, min 5) of every
    * 31st doc at id +4000000 — the contained-in-a-longer-doc shape
    * [[containmentPairs]] exists for. */
  def corpusWithExcerpts(docs: DataFrame): DataFrame = {
    // tokenize once per row (multi-use alias survives CollapseProject)
    val toks = col("_toks")
    val n = greatest(lit(5), floor(size(toks) * 2 / 5).cast("int"))
    // spread before the CPU-dense shingle pass downstream (see
    // corpusWithDups / Spread.byKey)
    Spread.byKey(
      docs.select(col("doc_id"), col("text"))
        .unionByName(docs.filter(col("doc_id") % 31 === 0)
          .withColumn("_toks", filter(split(col("text"), " "), x => length(x) > 0))
          .select((col("doc_id") + 4000000L).as("doc_id"),
            concat_ws(" ", slice(toks, lit(1), n)).as("text"))),
      col("doc_id"))
  }

  private[ops] val duckCorpusWithExcerpts: String =
    """SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 4000000 AS doc_id,
      |    array_to_string(tk[1:greatest(5, (len(tk)*2)//5)], ' ') AS text
      |  FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> len(x) > 0) AS tk
      |        FROM documents) z WHERE doc_id % 31 = 0""".stripMargin

  // -- exact-substring dedup (Lee et al. 2022) ----------------------

  /** Token length of the planted shared span and the span itself — a
    * fixed 60-token boilerplate appended to every 97th document, so
    * otherwise-unrelated docs share one long verbatim run (the case
    * exact-substring dedup exists for: license headers, templated
    * footers, quoted passages — docs MinHash won't pair because the
    * rest differs). */
  private val SpanTokens = 60
  val SharedSpan: String =
    (0 until SpanTokens).map(i => "sp" + i).mkString(" ")

  def corpusWithSpan(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      when(col("doc_id") % 97 === 0, concat(col("text"), lit(" " + SharedSpan)))
        .otherwise(col("text")).as("text"))

  private[ops] val duckCorpusWithSpan: String =
    s"SELECT doc_id, CASE WHEN doc_id % 97 = 0 THEN text || ' $SharedSpan' " +
      "ELSE text END AS text FROM documents"

  private val WinM = 2147483647L // 2^31-1: window-hash modulus

  /** Exact-substring dedup (Lee et al., "Deduplicating Training Data
    * Makes Language Models Better", ACL 2022): report document pairs
    * sharing at least `minShared` verbatim token windows of length
    * `window` — the dedup family that catches long copied spans inside
    * otherwise-different documents (MinHash pairs whole near-dup docs;
    * line dedup catches exact lines; neither sees a 60-token quote).
    *
    * Lee et al. build a corpus-wide suffix array — inherently
    * sequential. The Spark-native equivalent buckets by rolling window
    * hash: every doc emits the poly hash of each `window`-token
    * sliding window ((h·31+tok) mod 2^31−1 over [[Embedder]] token
    * hashes), pairs form per shared hash bucket, and a pair's
    * `n_shared` counts distinct shared windows (a span of L tokens
    * yields L−window+1 of them). Never all-pairs: candidates ride the
    * whash equi-join, and buckets larger than `maxBucket` docs are
    * dropped before pairing (boilerplate shared by thousands of docs
    * would square into the pair count; such spans are corpus-wide
    * artifacts for line/cluster dedup, not pairwise reporting — the
    * cap is the documented coverage bound). Window hashing is O(n·W)
    * per doc with W constant — linear, not the quadratic re-evaluation
    * the HOF rule bans. */
  /** All length-`window` rolling hashes of a token-hash array — native
    * O(L) expression ([[graft.vector.RollingWindowHashes]]); the HOF
    * twin below is O(L·window) and documents the fold the DuckDB
    * oracle mirrors (parity-pinned in NativeParitySpec). */
  def windowHashes(th: Column, window: Int): Column =
    graft.vector.Kernels.ofExpr(graft.vector.RollingWindowHashes(
      graft.vector.Kernels.exprOf(th), window, WinM))

  /** HOF twin of [[windowHashes]]. */
  private[graft] def windowHashesHof(th: Column, window: Int): Column =
    when(size(th) >= window,
      transform(sequence(lit(0), size(th) - window),
        i => aggregate(slice(th, i + 1, lit(window)), lit(0L),
          (h, t) => (h * 31L + t) % WinM)))
      .otherwise(array().cast("array<bigint>"))

  def substringPairs(
      corpus: DataFrame,
      window: Int = 20,
      minShared: Int = 5,
      maxBucket: Int = 100): DataFrame = {
    val wins = windowHashes(col("_th"), window)
    val dw = corpus
      .withColumn("_th", Embedder.tokenHashes(col("text")))
      .select(col("doc_id"), explode(wins).as("whash"))
      .distinct() // a doc repeating its own span pairs once, not n²
      .repartition(col("whash"))
    val ok = dw.groupBy(col("whash"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2 && col("n") <= maxBucket)
      .select(col("whash"))
    val b = dw.join(ok, Seq("whash"))
    b.select(col("whash"), col("doc_id").as("id_a"))
      .join(b.select(col("whash"), col("doc_id").as("id_b")), Seq("whash"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** DuckDB twin of [[substringPairs]] over [[duckCorpusWithSpan]]. */
  def duckSubstringPairs(
      window: Int = 20,
      minShared: Int = 5,
      maxBucket: Int = 100): String =
    s"""WITH corpus AS ($duckCorpusWithSpan),
       |tok AS (SELECT doc_id, ${Embedder.duckTokenHashes("text")} AS th FROM corpus),
       |wi AS (SELECT doc_id, th,
       |    unnest(range(0, greatest(len(th) - ${window - 1}, 0))) AS i FROM tok),
       |dw AS (SELECT DISTINCT doc_id,
       |    list_reduce(th[i + 1 : i + $window], (h, t) -> (h * 31 + t) % $WinM) AS whash
       |  FROM wi),
       |ok AS (SELECT whash FROM dw GROUP BY whash
       |  HAVING count(*) BETWEEN 2 AND $maxBucket),
       |b AS (SELECT doc_id, whash FROM dw JOIN ok USING (whash)),
       |p AS (SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*)::BIGINT AS n_shared
       |  FROM b x JOIN b y USING (whash) WHERE x.doc_id < y.doc_id
       |  GROUP BY 1, 2)
       |SELECT id_a, id_b, n_shared FROM p WHERE n_shared >= $minShared
       |ORDER BY id_a, id_b""".stripMargin

  // -- embedding cosine near-dup -----------------------------------

  /** Embedding fixture with planted near-duplicates (perturbed copies
    * of every 20th vector, [[DupOffset]] ids) — the ONE definition all
    * embedding-dedup queries share (label-blocked, LSH, semdedup), so
    * the plant can never diverge between them or from
    * [[duckEmbCorpusWithDups]]. `withLabel` keeps the block key for
    * the label-blocked variant. */
  private[graft] def embCorpusWithDups(emb: DataFrame, withLabel: Boolean): DataFrame = {
    val labelCols = if (withLabel) Seq(col("label")) else Nil
    val dups = emb.filter(col("vec_id") % 20 === 0)
      .select(Seq((col("vec_id") + DupOffset).as("vec_id"),
        concat(slice(col("embedding"), 1, 63), array(lit(0.5f))).as("embedding")) ++
        labelCols: _*)
    emb.select(Seq(col("vec_id"), col("embedding")) ++ labelCols: _*)
      .unionByName(dups)
  }

  /** DuckDB twin of [[embCorpusWithDups]]. */
  private[ops] def duckEmbCorpusWithDups(withLabel: Boolean): String = {
    val lbl = if (withLabel) ", label" else ""
    s"""SELECT vec_id, embedding$lbl FROM embeddings
       |  UNION ALL
       |  SELECT vec_id + $DupOffset AS vec_id,
       |    embedding[1:63] || [0.5::FLOAT] AS embedding$lbl
       |  FROM embeddings WHERE vec_id % 20 = 0""".stripMargin
  }

  /** Input-row bound above which [[embeddingPairs]] refuses without
    * `forceExact`: 2^16 vectors is ~30 s of exact all-pairs on 32
    * cores (extrapolated from the measured exp-1.80 curve: 3.9 s at
    * 20k, 245 s at 200k) — generous headroom for a recall-audit
    * sample, three decades short of a corpus. */
  val ExactPairsMaxRows: Long = 1L << 16

  /** Embedding-space near-dup: perturbed copies of every 20th vector
    * (last component replaced) joined back through a label block, kept
    * at cosine ≥ simMin. Label plays the coarse ANN bucket; the scale
    * path swaps in the LSH sign-sketch (Similarity.signBucket).
    *
    * Scale verdict (r12 curves, measured): exponent 1.80 — quadratic
    * BY DESIGN, and inherently so: this is the EXACT all-pairs truth
    * path (the recall denominator of x_dedup_lsh_recall), block
    * population grows linearly under a fixed label alphabet, and
    * exact cosine-threshold pair enumeration in 64-d has no lossless
    * subquadratic algorithm — triangle-inequality/cluster pruning is
    * vacuous on spread high-dimensional data (cluster radii ≈ √2 on
    * near-orthogonal directions swallow any distance bound; the same
    * reason FAISS/ScaNN are approximate). Corpus-scale callers use
    * [[embeddingPairsLshAuto]] (measured exponent 1.07) and keep this
    * as the sampled/audit truth.
    *
    * The routing is ENFORCED, not advisory (the r12 verdict's one
    * remaining scale-killer): above [[ExactPairsMaxRows]] input
    * vectors the call REFUSES loudly (the lineDedup 2^20 pattern —
    * a measured-quadratic path must be impossible to point at a
    * corpus by accident). `forceExact = true` is the deliberate
    * escape hatch for recall audits that really do want the exact
    * denominator at a larger sample; the count it pays is one
    * parquet-footer metadata job on the usual raw-scan input. */
  def embeddingPairs(
      emb: DataFrame, simMin: Double = 0.9,
      forceExact: Boolean = false): DataFrame = {
    if (!forceExact) {
      val n = emb.count()
      require(n <= ExactPairsMaxRows,
        s"embeddingPairs is the EXACT all-pairs audit path (measured " +
          s"growth exponent 1.80 — quadratic): refusing $n input vectors " +
          s"> $ExactPairsMaxRows. Corpus-scale near-dup goes through " +
          "embeddingPairsLshAuto (measured exponent 1.07); a deliberate " +
          "large recall audit passes forceExact = true.")
    }
    val corpus = embCorpusWithDups(emb, withLabel = true)
      // shuffle once on the block key; both join sides reuse the exchange
      .repartition(col("label"))
    val a = corpus.select(col("label"), col("vec_id").as("id_a"), col("embedding").as("v_a"))
    val b = corpus.select(col("label"), col("vec_id").as("id_b"), col("embedding").as("v_b"))
    a.join(b, Seq("label"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(Kernels.cosine(col("v_a"), col("v_b")), 6).as("sim"))
      .filter(col("sim") >= simMin)
  }

  def duckEmbeddingPairs(simMin: Double = 0.9): String =
    s"""WITH corpus AS (${duckEmbCorpusWithDups(withLabel = true)}),
       |pairs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |    ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS sim
       |  FROM corpus a JOIN corpus b ON a.label = b.label AND a.vec_id < b.vec_id)
       |SELECT id_a, id_b, sim FROM pairs WHERE sim >= $simMin
       |ORDER BY id_a, id_b""".stripMargin

  /** Embedding near-dup, banded-LSH-bucketed (the scale path: LSH
    * blocking replaces the label block when no natural block key
    * exists). Banding mirrors [[minhashPairs]]: `bands` independent
    * sign-sketches of `planesPerBand` bits each, candidates = pairs
    * sharing ANY band bucket, then exact-cosine verification. A single
    * wide sketch demonstrably fails here (round-1 recall was 0/10 of
    * the planted cosine≥0.9 pairs at sf0.01; 10×5 banding finds
    * 10/10 by measurement) — the OR over bands is what buys recall
    * without widening any one bucket. */
  def embeddingPairsLsh(
      emb: DataFrame,
      simMin: Double = 0.9,
      bands: Int = 10,
      planesPerBand: Int = 5,
      maxBucket: Long = Long.MaxValue,
      numPartitions: Option[Int] = None): DataFrame =
    embeddingPairsLshRaw(embCorpusWithDups(emb, withLabel = false),
      simMin, bands, planesPerBand, maxBucket, numPartitions)

  /** [[embeddingPairsLsh]] WITHOUT the probe-dup planting — the
    * banding over exactly the corpus the caller passes. The planting
    * wrapper stays the suite/oracle entry point (its DuckDB twin
    * plants identically); a production caller deduping their OWN
    * corpus wants this or [[embeddingPairsLshAutoRaw]], not a
    * fixture plant. */
  def embeddingPairsLshRaw(
      corpus: DataFrame,
      simMin: Double,
      bands: Int,
      planesPerBand: Int,
      maxBucket: Long = Long.MaxValue,
      numPartitions: Option[Int] = None): DataFrame = {
    val vecs = corpus.select(col("vec_id"), col("embedding"))
    // (band, bval, vec_id) — the narrow exploded candidate key; the
    // embedding stays behind in `vecs` so the bucket shuffle moves ids,
    // not 64-float payloads (same shape as minhashPairs).
    // numPartitions sizes the band shuffle and everything downstream of
    // it (candidate distinct, vector-fetch joins ride the same width):
    // at session-default widths (32 locally) a corpus-scale candidate
    // stream concentrates gigabytes per task and the r13 sweep OOM'd
    // the SMJ sorter at 2M vectors — the auto path passes a width
    // proportional to its own band-row volume; None keeps the pinned
    // fixture plan byte-identical.
    def widen(df: DataFrame, cols: Seq[Column]): DataFrame =
      numPartitions.fold(df.repartition(cols: _*))(p => df.repartition(p, cols: _*))
    val rawBands = widen(corpus.select(col("vec_id"),
        posexplode(Similarity.bandedBuckets(col("embedding"), bands, planesPerBand)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bval"),
      Seq(col("band"), col("bval")))
    // optional hot-bucket cap, the minhashPairs maxBucket lever: a
    // bucket of b members contributes b² candidate rows, and a DENSE
    // EMBEDDING CLUSTER (all mutually similar, all sharing buckets in
    // many bands at once) makes that quadratic in the cluster size —
    // the r12 100×-corpus run spilled 76 GB of candidate shuffle and
    // died on it. Dropping oversized buckets bounds per-bucket work at
    // maxBucket²; pairs inside a dense cluster are still found through
    // any of its UNSATURATED bands, and cluster-shaped mass belongs to
    // SemDeDup/clustering, not a pair list (x_semdedup). Default ∞
    // keeps the pinned fixture query's plan byte-identical.
    val bandTable =
      if (maxBucket == Long.MaxValue) rawBands
      else {
        val sizes = rawBands.groupBy(col("band"), col("bval"))
          .agg(count(lit(1)).as("_n"))
        rawBands.join(sizes.filter(col("_n") <= maxBucket), Seq("band", "bval"))
          .select(col("vec_id"), col("band"), col("bval"))
      }
    // candidate ids duplicated across colliding bands — distinct the
    // narrow (id_a, id_b) pairs BEFORE fetching vectors. Measured at
    // sf0.1 the raw candidate stream is 2.6× the distinct set (1.65M
    // vs 637k: clustered embeddings collide in many bands at once), so
    // deduping 16-byte id pairs first saves 2.6× of the expensive part
    // — the two vector-fetch joins and the 64-d cosine.
    val rawCands = bandTable.select(col("band"), col("bval"), col("vec_id").as("id_a"))
      .join(bandTable.select(col("band"), col("bval"), col("vec_id").as("id_b")),
        Seq("band", "bval"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
    // the distinct's aggregation reuses the widened partitioning (the
    // explicit repartition satisfies the aggregate's requirement, so
    // Catalyst elides a second exchange and the dedup runs at the
    // widened task count instead of the session default); without
    // numPartitions no extra node is inserted — the pinned fixture
    // plan stays byte-identical
    val cands = numPartitions
      .fold(rawCands)(p => rawCands.repartition(p, col("id_a"), col("id_b")))
      .distinct()
    cands
      .join(vecs.select(col("vec_id").as("id_a"), col("embedding").as("v_a")), Seq("id_a"))
      .join(vecs.select(col("vec_id").as("id_b"), col("embedding").as("v_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(Kernels.cosine(col("v_a"), col("v_b")), 6).as("sim"))
      .filter(col("sim") >= simMin)
  }

  /** Corpus-size-aware banding for [[embeddingPairsLsh]]: planes per
    * band from the corpus count, bands from the sign-LSH S-curve.
    *
    * The fixture's pinned (bands=10, planes=5) has a 10×32 = 320-value
    * bucket space — population n/2^planes grows linearly with the
    * corpus and the bucket self-join quadratically (measured exponent
    * 1.95 on the r12 curves: 118 s at the 10× corpus). The knob is
    * planes (the [[simhashPairs64]] chunk-width lever): holding bucket
    * population ≈ constant needs planes ≈ log₂(n) − log₂(target), and
    * recall at `simMin` is then restored by bands via the sign-LSH
    * per-band collision probability q = (1 − arccos(s)/π)^planes —
    * bands = ⌈ln(1−recall)/ln(1−q)⌉ (1 − (1−q)^b ≥ recall). Returns
    * (bands, planes) so callers can log the sizing; the one extra
    * count() job is index-build-time cost, not per-query. */
  def lshAutoParams(
      n: Long, simMin: Double,
      targetBucket: Long = 64L, targetRecall: Double = 0.95): (Int, Int) = {
    require(n > 0 && simMin > 0 && simMin < 1 && targetRecall > 0 &&
      targetRecall < 1 && targetBucket > 0,
      s"lshAutoParams needs n > 0, 0 < simMin < 1, 0 < targetRecall < 1, " +
        s"targetBucket > 0; got n=$n simMin=$simMin " +
        s"targetRecall=$targetRecall targetBucket=$targetBucket")
    def bandsNeeded(p: Int): Double = {
      val q = math.pow(1.0 - math.acos(simMin) / math.Pi, p.toDouble)
      math.ceil(math.log(1.0 - targetRecall) / math.log(1.0 - q))
    }
    // planes = log₂(n/targetBucket) keeps bucket population ≈ constant
    // (the lever that bounds the self-join); per-band recall then
    // FALLS as n^(log₂ q) and bands must grow ∝ n^(−log₂ q) to hold
    // the recall contract — the sign-LSH ρ-exponent, not a tunable. The
    // old flat bands ≤ 64 cap silently dropped nominal recall
    // 0.95 → ~0.79 once n ≳ 3.4e7 at simMin 0.9 (the r12 advisor
    // finding); holding planes DOWN instead would push bucket
    // population past the auto path's maxBucket cap and drop recall
    // even harder. So bands floats to what recall requires, under a
    // 512 sanity ceiling (at simMin 0.9 that covers n ≈ 10¹²); if even
    // 512 cannot meet the target the degradation is LOGGED with the
    // achieved number, never silent.
    val planes = math.min(30, math.max(5,
      math.ceil(math.log(n.toDouble / targetBucket) / math.log(2.0)).toInt))
    val needed = bandsNeeded(planes)
    if (needed > 512) {
      val q = math.pow(1.0 - math.acos(simMin) / math.Pi, planes.toDouble)
      val achieved = 1.0 - math.pow(1.0 - q, 512.0)
      System.err.println(
        f"[graft] lshAutoParams: recall $targetRecall at simMin=$simMin " +
          f"needs ${needed}%.0f bands (> the 512 ceiling) at planes=$planes " +
          f"— achieved nominal recall $achieved%.3f; lower the recall " +
          "target or simMin deliberately")
    }
    val bands = math.min(512, math.max(2, needed.toInt))
    (bands, planes)
  }

  /** [[embeddingPairsLsh]] with [[lshAutoParams]] sizing, a measured
    * recall margin, and the hot-bucket cap engaged — the corpus-scale
    * entry point (the pinned-parameter query stays for oracle
    * stability). Candidate volume is bounded by bands · maxBucket · n;
    * bands grows ∝ n^(−log₂ q) as planes deepen (the sign-LSH
    * ρ-exponent, ≈ n^0.22 at simMin 0.9 — see [[lshAutoParams]]), so
    * the total is O(n^{1+ρ}) — mildly super-linear by LSH theory.
    * Measured r13 (x1000doc corpus): completes 2M vectors where the
    * r12 sizing exhausted scratch disk; top-decade exponent ≈ 1.4 =
    * the ρ law plus spill constants. See the parameter notes below
    * for why the nominal S-curve needs `bandsMargin` — the closed
    * form is an IDEAL-PLANE bound, and the r13 recall audit measured
    * the gap. */
  /** The full parameter plan [[embeddingPairsLshAuto]] derives for a
    * corpus of `n` vectors — (bands, planesPerBand, maxBucket,
    * shufflePartitions). Exposed so [[lshRecallAudit]] can run a
    * SAMPLE under the exact banding the full corpus would get (an
    * audit at sample-sized parameters would measure the wrong plan). */
  def lshAutoPlan(
      n: Long, simMin: Double = 0.9,
      targetBucket: Long = 16L,
      targetRecall: Double = 0.95,
      bandsMargin: Double = 2.0,
      capMultiple: Long = 8L): (Int, Int, Long, Int) = {
    // forward targetRecall (the r14 self-review caught the auto path
    // sizing bands for the hardcoded 0.95 while advertising the knob)
    val (bands0, planes) = lshAutoParams(n, simMin, targetBucket, targetRecall)
    val bands = math.min(512, math.max(2,
      math.ceil(bands0 * bandsMargin).toInt))
    val parts = math.min(4096L, math.max(32L, n * bands / 250000L)).toInt
    (bands, planes, targetBucket * capMultiple, parts)
  }

  def embeddingPairsLshAuto(
      emb: DataFrame, simMin: Double = 0.9,
      targetBucket: Long = 16L,
      targetRecall: Double = 0.95,
      bandsMargin: Double = 2.0,
      capMultiple: Long = 8L,
      auditSampleRows: Long = 0L): DataFrame = {
    // targetBucket 16 (was 64 in r12): candidate volume is
    // bands · n · pop/2, LINEAR in the target population while bands
    // only grows ∝ n^ρ as planes deepen — at 2M vectors the 64-row
    // target produced ~1.8B candidate rows (30 bands × pop 64) whose
    // sort-spill exhausted 70 GB of scratch disk (r13 4th-decade
    // sweep); 16 cuts that 4×.
    //
    // bandsMargin and capMultiple exist because the r13 recall AUDIT
    // (exact forceExact truth at 20k vectors, 456 pairs) measured the
    // ideal-plane S-curve badly overstating recall on this corpus —
    // and the audit's truth set is the structural worst case on BOTH
    // axes, worth spelling out because it bounds what any banding can
    // do here:
    //  * every truth pair is a SINGLE-COORDINATE perturbation, and an
    //    axis-concentrated Δ against ±1 Rademacher hyperplanes is the
    //    worst case (every plane sees the full |Δ| where a diffuse Δ
    //    averages out): uncapped recall read 0.70 at the solver's
    //    nominal 0.95, and DOUBLING bands only bought 0.75 — misses
    //    concentrate on the high-split-probability pairs, so the
    //    (1−q)^b independence the closed form assumes does not hold;
    //  * the fixture's vectors live in direction CLUSTERS (8 base
    //    centroids × the ScaleData copy transforms ⇒ thousands of
    //    ~250-member micro-clusters at the 4th decade), so bucket
    //    population is cluster-sized in EVERY band at once and the
    //    cap-vs-recall trade is binary: a cap below the cluster size
    //    deletes same-cluster pairs (recall 0.23 at 8×target, 0.34 at
    //    16× on the 20k audit), while a cap above it pays
    //    cluster-quadratic candidate volume (the 16× default was
    //    re-measured EXHAUSTING 70 GB of scratch at 2M vectors — 8×
    //    is the shipped default because completing with documented
    //    recall beats dying). Pair-level LSH on heavily-clustered
    //    data is the wrong tool — that mass belongs to
    //    [[graft.ops.Similarity.semDedup]] (r14: the k-SCALING
    //    SemDeDup — cluster count ∝ corpus, per-cluster size fixed,
    //    the Abbas et al. regime — measured at-worst-linear to 2M
    //    vectors with boundary recall 0.957 spec-pinned on this very
    //    geometry; the fixture census query keeps k=8 for its oracle
    //    and refuses corpora), and recall-critical audits belong to
    //    the exact path (forceExact sampling). On spread-direction
    //    corpora with diffuse differences — the shape real embedding
    //    near-dups take — the S-curve applies and the margin is
    //    headroom, not a patch.
    // This operator's contract is therefore bounded near-linear work
    // with S-curve recall ON ITS INTENDED GEOMETRY, measured honestly
    // on the adversarial one; it does not promise certainty anywhere —
    // and since r14 the achieved recall is a RUNTIME number, not a
    // footnote: pass auditSampleRows (or call [[lshRecallAudit]]) to
    // measure it on a sample under this corpus's own plan.
    // shuffle width (the plan's 4th element) ∝ the path's own band-row
    // volume (~250k rows per task): at the session default (32
    // locally) a corpus-scale candidate stream concentrates ≥ GB-scale
    // sorts per task — the r13 sweep OOM'd the candidate-join sorter
    // at 2M vectors × 30 bands on exactly that; on a real cluster this
    // is the same decision as sizing spark.sql.shuffle.partitions to
    // the data, made locally by the one operator that knows its fan-out
    val n = emb.count()
    val (bands, planes, maxBucket, parts) =
      lshAutoPlan(n, simMin, targetBucket, targetRecall, bandsMargin, capMultiple)
    // auditSampleRows > 0: measure achieved recall on a sample UNDER
    // THIS PLAN before returning the corpus frame, so clustered-
    // geometry degradation is a logged number at run time, not a
    // scaladoc footnote (r13 verdict #2)
    if (auditSampleRows > 0)
      lshRecallAudit(emb, simMin, auditSampleRows, targetBucket,
        targetRecall, bandsMargin, capMultiple)
    embeddingPairsLsh(emb, simMin, bands, planes,
      maxBucket = maxBucket,
      numPartitions = Some(parts))
  }

  /** [[embeddingPairsLshAuto]] minus the probe planting: auto-sized
    * banding over exactly the corpus passed (see
    * [[embeddingPairsLshRaw]]) — the production entry point for
    * near-dup pairs over a caller's own corpus. The one extra
    * count() is the same index-build-time cost the planting path
    * pays. */
  def embeddingPairsLshAutoRaw(
      corpus: DataFrame, simMin: Double = 0.9,
      targetBucket: Long = 16L,
      targetRecall: Double = 0.95,
      bandsMargin: Double = 2.0,
      capMultiple: Long = 8L): DataFrame = {
    val n = corpus.count()
    val (bands, planes, maxBucket, parts) =
      lshAutoPlan(math.max(1L, n), simMin, targetBucket, targetRecall,
        bandsMargin, capMultiple)
    embeddingPairsLshRaw(corpus, simMin, bands, planes,
      maxBucket = maxBucket, numPartitions = Some(parts))
  }

  /** Sampled recall self-audit for [[embeddingPairsLshAuto]] (r13
    * verdict #2: the measured recall degradation on clustered
    * geometry was documented but not OBSERVABLE — a caller got
    * silently low recall with no runtime signal). Draws a
    * content-stable ~`sampleRows`-vector sample, runs the exact pair
    * path as truth ([[embeddingPairs]] `forceExact` — the sample is
    * bounded by construction) against the banding AT THE FULL
    * CORPUS'S auto parameters ([[lshAutoPlan]] of the corpus n, not
    * the sample n — the sample must see the plan the corpus gets),
    * logs and returns achieved recall at the threshold. NaN when the
    * sample holds no true pair (nothing to measure — widen the
    * sample). Cost: one exact pass over ≤ `sampleRows` vectors
    * (quadratic in the SAMPLE only) + one banding pass over the same
    * sample; both trivially bounded next to the corpus run the number
    * de-risks. */
  def lshRecallAudit(
      emb: DataFrame, simMin: Double = 0.9,
      sampleRows: Long = 5000L,
      targetBucket: Long = 16L,
      targetRecall: Double = 0.95,
      bandsMargin: Double = 2.0,
      capMultiple: Long = 8L): Double = {
    // 16384² ≈ 268M sampled cosines is the honest ceiling for an
    // UNBLOCKED all-pairs truth (the label-blocked embeddingPairs
    // bound does not apply: the audit's truth must not depend on a
    // fixture block key, and must count cross-block pairs too)
    require(sampleRows > 0 && sampleRows <= 16384,
      s"lshRecallAudit sample must be in (0, 16384]: $sampleRows")
    val n = emb.count()
    val p = math.min(1.0, sampleRows.toDouble / math.max(1L, n))
    val sample = emb.select(col("vec_id"), col("embedding"))
      .filter(pmod(Embedder.stringHash64(
          concat_ws(":", col("vec_id").cast("string"), lit("lshaudit"))),
        lit(1000000L)).cast("double") < p * 1000000.0)
      .localCheckpoint(true) // both paths read it; don't re-scan the corpus
    val (bands, planes, maxBucketCorpus, _) =
      lshAutoPlan(n, simMin, targetBucket, targetRecall, bandsMargin, capMultiple)
    // scale the hot-bucket cap by the sample fraction: bucket
    // POPULATION is ∝ corpus size, so running the sample under the
    // corpus's absolute cap would never trip it — the audit would be
    // blind to exactly the cap-deletes-cluster-pairs degradation it
    // exists to expose (clustered geometry, the r13 finding). With
    // cap·p the sample's buckets trip at the same RELATIVE density
    // the corpus's would; an approximation (collision counts are not
    // exactly linear in p), stated rather than hidden.
    val maxBucket = math.max(1L, math.round(maxBucketCorpus * p))
    // UNBLOCKED exact truth over the same planted corpus the banding
    // sees — a deliberate bounded nested-loop join (the one shape the
    // codebase bans elsewhere), behind the sampleRows gate above
    val corpus = embCorpusWithDups(sample, withLabel = false)
    val truth = corpus.select(col("vec_id").as("id_a"), col("embedding").as("v_a"))
      .join(corpus.select(col("vec_id").as("id_b"), col("embedding").as("v_b")),
        col("id_a") < col("id_b"))
      .filter(round(Kernels.cosine(col("v_a"), col("v_b")), 6) >= simMin)
      .select(col("id_a"), col("id_b"))
    val truthN = truth.count()
    if (truthN == 0) {
      System.err.println(
        "[graft] lshRecallAudit: sample holds no true pair at the " +
          s"threshold (n=$n, sampled ~${(p * n).toLong}) — widen " +
          "sampleRows to measure recall")
      Double.NaN
    } else {
      val hits = embeddingPairsLsh(sample, simMin, bands, planes, maxBucket)
        .select(col("id_a"), col("id_b"))
      val recall = hits.intersect(truth).count().toDouble / truthN
      System.err.println(
        f"[graft] lshRecallAudit: achieved recall $recall%.3f at " +
          f"simMin=$simMin%.2f over $truthN true pairs (corpus n=$n, " +
          f"plan bands=$bands planes=$planes maxBucket=$maxBucketCorpus " +
          f"(sample-scaled ${maxBucket}%d); " +
          f"nominal $targetRecall%.2f×$bandsMargin%.1f margin) — " +
          "clustered geometry degrades banding recall; route that " +
          "mass to Similarity.semDedup")
      recall
    }
  }

  def duckEmbeddingPairsLsh(
      simMin: Double = 0.9,
      bands: Int = 10,
      planesPerBand: Int = 5): String =
    s"""WITH corpus AS (
       |  SELECT vec_id, embedding FROM embeddings
       |  UNION ALL
       |  SELECT vec_id + 1000000 AS vec_id, embedding[1:63] || [0.5::FLOAT] AS embedding
       |  FROM embeddings WHERE vec_id % 20 = 0),
       |bkt AS (${Similarity.duckBandedBuckets(bands, planesPerBand)}),
       |cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
       |  FROM bkt a JOIN bkt b ON a.band = b.band AND a.bval = b.bval AND a.vec_id < b.vec_id)
       |SELECT id_a, id_b,
       |  ROUND(list_cosine_similarity(va.embedding::DOUBLE[], vb.embedding::DOUBLE[]), 6) AS sim
       |FROM cand JOIN corpus va ON va.vec_id = id_a JOIN corpus vb ON vb.vec_id = id_b
       |WHERE ROUND(list_cosine_similarity(va.embedding::DOUBLE[], vb.embedding::DOUBLE[]), 6) >= $simMin
       |ORDER BY id_a, id_b""".stripMargin

  // -- clustering (pairs → components → keeper) ---------------------

  /** Connected components over a near-dup pair list: every document
    * gets the MINIMUM id reachable through the pair graph as its
    * `cluster_id`. This is the step that turns pairwise dedup output
    * into actionable groups — "these 5 docs are all the same article,
    * keep one" — and pair lists are NOT transitive (A~B, B~C without
    * A~C is common near the threshold), so a per-pair keeper rule
    * under-deletes.
    *
    * Algorithm: iterative min-label propagation. Each round every node
    * takes the min of its own label and its neighbors' labels; rounds
    * repeat until a fixpoint (no label decreased). Cost per round is
    * one shuffle of the (undirected) edge list joined to the label
    * table plus a min-aggregate — both keyed shuffles that scale
    * horizontally; rounds = graph diameter. Near-dup components are
    * dense (near-cliques around a shared source document), so diameter
    * is small — 2–3 rounds in practice; when a graph exhausts the
    * round cap (chain-shaped components), the call falls back to
    * [[clustersStar]], the O(log n)-round star contraction. Lineage is
    * truncated every round through the [[Ckpt]] switch — eager
    * `localCheckpoint` by default, RELIABLE `checkpoint` under
    * session conf `spark.graft.checkpointDir` (executor loss on a
    * long cluster run must not kill the loop) — so the plan does not
    * grow with iteration count.
    *
    * Returns (id, cluster_id), one row per node that appears in at
    * least one pair — singletons are implicitly their own cluster. */
  def clusters(pairs: DataFrame, maxIters: Int = 25): DataFrame = {
    val edges = pairs.select(col("id_a").as("a"), col("id_b").as("b"))
    val adj = edges.unionByName(edges.select(col("b").as("a"), col("a").as("b")))
      .repartition(col("a")).cache()
    // convergence via the LABEL-SUM invariant (r18): every node's label
    // is non-increasing per round (the min-agg includes its own label),
    // so Σ cluster_id strictly decreases until the fixpoint and is
    // equal iff NO label moved — one narrow aggregate over the freshly
    // checkpointed round replaces the old per-round probe join of two
    // node-sized label tables (exchange of both sides + join + limit).
    // Decimal(38,0) sum: exact, overflow-free for 60-bit ids at any
    // node count (a long sum would ANSI-throw at corpus scale).
    // Coalesced to 0: sum over an EMPTY label table is SQL NULL, and an
    // empty pair list (a batch with no near-dups) is a realistic input
    // — the loop then converges on the first round (0 == 0) and
    // returns the empty frame (r18 advisor).
    //
    // r19: the sum rides the CHECKPOINT'S OWN ACTION via observe() —
    // the eager materialization fills the CollectMetrics accumulator,
    // so the per-round job that re-aggregated the freshly checkpointed
    // labels is gone (the loop is per-round-job-floor-bound at fixture
    // scale: QueryProf r19 shows 49 sub-160 ms jobs on the star twin).
    def ckptWithSum(pre: DataFrame): (DataFrame, java.math.BigDecimal) = {
      val named = pre.observe("graft_label_sum",
        coalesce(sum(col("cluster_id").cast("decimal(38,0)")),
          lit(0).cast("decimal(38,0)")).as("s"))
      val ck = Ckpt(named) // eager: executes named's plan
      (ck, named.queryExecution.observedMetrics("graft_label_sum").getDecimal(0))
    }
    var (labels, prevSum) = ckptWithSum(adj.select(col("a").as("id"))
      .distinct()
      .withColumn("cluster_id", col("id")))
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      val prop = adj
        .join(labels.select(col("id").as("a"), col("cluster_id")), Seq("a"))
        .select(col("b").as("id"), col("cluster_id"))
      val (next, nextSum) = ckptWithSum(labels.unionByName(prop)
        .groupBy(col("id"))
        .agg(min(col("cluster_id")).as("cluster_id")))
      freeCheckpoint(labels) // superseded round's blocks, see the helper
      labels = next
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      iter += 1
    }
    adj.unpersist()
    // a component deeper than the round cap (chain-shaped graphs:
    // templated spam chains, serial near-copies) converges in
    // O(diameter) here but O(log n) under star contraction — switch
    // algorithms instead of failing or raising the cap
    if (converged) labels
    else { freeCheckpoint(labels); clustersStar(pairs) }
  }

  /** PageRank over the near-dup pair graph: which documents are the
    * HUBS of duplication (template sources, boilerplate origins, spam
    * farms)? A dedup report ranks clusters by size; PageRank ranks
    * nodes by how centrally duplication flows through them — the
    * difference between "this cluster is big" and "this document is
    * what everything else is a copy of". Standard synchronous PR with
    * damping 0.85 over the symmetrized pair edges, a fixed `iters`
    * rounds from the uniform prior over paired nodes.
    *
    * Determinism across engines: per-node contribution sums fold a
    * src-sorted list (float addition order written down, not left to
    * shuffle order) and each round's PR re-rounds to 9dp so both
    * engines enter the next round with bit-identical state; the oracle
    * unrolls the same rounds as SQL CTEs (the BPE-training device).
    *
    * Scale: edges/degrees are cached once (bounded: the verified pair
    * set); each round is ONE join of the edge list with the ≤node-sized
    * state and one map-side-combinable per-node aggregate. The fixed
    * round count keeps the plan finite without checkpoint lineage
    * (contrast [[clusters]], whose round count is data-dependent). */
  def neardupPagerank(corpus: DataFrame, iters: Int = 3): DataFrame =
    pagerank(minhashPairs(corpus).select(col("id_a"), col("id_b")), iters)

  /** The graph kernel behind [[neardupPagerank]]: PR over any
    * undirected (id_a, id_b) pair set. */
  def pagerank(pairs: DataFrame, iters: Int = 3): DataFrame = {
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .repartition(col("src")).cache()
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .select(col("src").as("id"), col("deg")).cache()
    val n = deg.count()
    var pr = deg.select(col("id"), col("deg"), lit(1.0 / n).as("pr"))
    for (_ <- 1 to iters) {
      val contrib = edges
        .join(pr.select(col("id").as("src"), (col("pr") / col("deg")).as("c")),
          Seq("src"))
        .select(col("dst").as("id"), col("src"), col("c"))
      val sums = contrib
        .groupBy(col("id"))
        .agg(sort_array(collect_list(struct(col("src"), col("c")))).as("l"))
        .select(col("id"),
          aggregate(col("l"), lit(0.0), (a, x) => a + x.getField("c")).as("s"))
      pr = deg.join(sums, Seq("id"), "left")
        .select(col("id"), col("deg"),
          round(lit(0.15 / n) + lit(0.85) * coalesce(col("s"), lit(0.0)), 9)
            .as("pr"))
    }
    // eager checkpoint via the Ckpt switch (the clusters pattern):
    // materialize the node-sized result BEFORE dropping the edge
    // cache under it
    val out = Ckpt(pr.select(col("id").as("doc_id"), col("deg"),
      round(col("pr"), 6).as("pagerank")))
    edges.unpersist(); deg.unpersist()
    out
  }

  /** DuckDB twin of [[neardupPagerank]]: the same rounds unrolled as
    * CTEs over the shared pair-graph CTE chain. */
  def duckPagerank(iters: Int = 3): String = {
    val sb = new StringBuilder
    sb ++= s"WITH ${duckMinhashPairsCtes()},\n"
    sb ++= "edges AS (SELECT id_a AS src, id_b AS dst FROM kept\n"
    sb ++= "  UNION ALL SELECT id_b AS src, id_a AS dst FROM kept),\n"
    sb ++= "deg AS (SELECT src AS id, count(*)::BIGINT AS deg FROM edges GROUP BY src),\n"
    sb ++= "nn AS (SELECT count(*)::DOUBLE AS n FROM deg),\n"
    sb ++= "pr0 AS (SELECT id, deg, (SELECT 1.0/n FROM nn) AS pr FROM deg),\n"
    for (i <- 1 to iters) {
      sb ++= s"c$i AS (SELECT e.dst AS id, e.src AS src, p.pr / p.deg AS c\n"
      sb ++= s"  FROM edges e JOIN pr${i - 1} p ON p.id = e.src),\n"
      sb ++= s"s$i AS (SELECT id, list(c ORDER BY src ASC) AS l FROM c$i GROUP BY id),\n"
      sb ++= s"pr$i AS (SELECT d.id, d.deg,\n"
      sb ++= s"  ROUND((SELECT 0.15/n FROM nn) + 0.85 * coalesce(\n"
      sb ++= s"    list_reduce(list_prepend(0.0, s.l), (a, b) -> a + b), 0.0), 9) AS pr\n"
      sb ++= s"  FROM deg d LEFT JOIN s$i s ON s.id = d.id),\n"
    }
    sb ++= s"fin AS (SELECT id AS doc_id, deg, ROUND(pr, 6) AS pagerank FROM pr$iters)\n"
    sb ++= "SELECT doc_id, deg, pagerank FROM fin ORDER BY doc_id"
    sb.toString
  }

  /** Free the block-manager storage behind an eager `localCheckpoint`
    * once the frame is SUPERSEDED (a harmless no-op on [[Ckpt]]'s
    * reliable checkpoints, whose state is files the caller's
    * directory owns, not blocks). Iterative loops otherwise leave
    * every round's checkpoint blocks resident for the life of the
    * session — in a long-lived JVM (a real cluster, or the bench
    * harness) that accumulation evicts other queries' execution
    * memory long after the loop finished. Only the final round's
    * result may stay persisted. */
  private def freeCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }.foreach(_.unpersist(false))

  /** Connected components by alternating large-star / small-star
    * contraction (Kiveris et al., "Connected Components in MapReduce
    * and Beyond", SoCC'14) — O(log n) rounds regardless of component
    * diameter, where [[clusters]]' label propagation needs O(diameter)
    * rounds. The scale path for chain-shaped duplicate graphs.
    *
    * Each round is two keyed shuffles over the CURRENT edge set (which
    * only shrinks toward one star edge per non-root node):
    *  - large-star: every node points its LARGER neighbors at its
    *    minimum neighbor — emit (v, m(u)) for v ∈ Γ(u), v > u, with
    *    m(u) = min(Γ(u) ∪ {u});
    *  - small-star: orient edges toward the smaller endpoint, then
    *    every node points its smaller neighbors AND itself at the
    *    minimum — emit (v, m(u)) for v ∈ Γ⁻(u) ∪ {u}.
    * Both preserve connectivity (the paper's Lemmas 1–2); the fixpoint
    * is a forest of stars centered at each component's minimum id.
    * Lineage is truncated per round through the [[Ckpt]] switch
    * (reliable `checkpoint` under `spark.graft.checkpointDir`, else
    * `localCheckpoint`).
    *
    * Same contract as [[clusters]]: returns (id, cluster_id) for every
    * node appearing in at least one pair. */
  def clustersStar(pairs: DataFrame, maxIters: Int = 50): DataFrame = {
    val nodes = pairs.select(col("id_a").as("id"))
      .unionByName(pairs.select(col("id_b").as("id")))
      .distinct()
    // carried across rounds so set-equality needs no count job at all
    // (plus the exceptAll only when cardinalities already match —
    // distinct sets of equal size with an empty one-way difference
    // are equal). r19: the count rides the checkpoint's own eager
    // action via observe() (the clusters() ckptWithSum pattern) — the
    // old per-round `next.count()` over the freshly checkpointed
    // edges was one more job on a loop that is job-floor-bound at
    // fixture scale (49 sub-160 ms jobs in the r19 QueryProf receipt).
    def ckptWithCount(pre: DataFrame): (DataFrame, Long) = {
      val named = pre.observe("graft_edge_count", count(lit(1)).as("n"))
      val ck = Ckpt(named) // eager: executes named's plan
      (ck, named.queryExecution.observedMetrics("graft_edge_count").getLong(0))
    }
    var (edges, edgeCount) = ckptWithCount(
      pairs.select(col("id_a").as("a"), col("id_b").as("b"))
        .filter(col("a") =!= col("b")).distinct())
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      // large-star over both edge directions: (b, m(a)) for b > a
      val dir = edges.unionByName(edges.select(col("b").as("a"), col("a").as("b")))
      val mins = dir.groupBy(col("a"))
        .agg(least(min(col("b")), first(col("a"))).as("m"))
      // NOT distinct'd (r18): duplicates — (b, m) reached via two
      // neighbors — cost nothing downstream (mins2 is a min-agg, and
      // `next` ends in its own distinct) while the distinct here paid
      // one exchange + two hash aggregates per round; volume stays
      // bounded by the directed edge count either way
      val large = dir.join(mins, Seq("a"))
        .filter(col("b") > col("a"))
        .select(col("b").as("a"), col("m").as("b"))
      // small-star over min-oriented edges: (v, m(a)) for v ∈ Γ⁻(a) ∪ {a}
      val oriented = large.select(
        greatest(col("a"), col("b")).as("a"), least(col("a"), col("b")).as("b"))
      val mins2 = oriented.groupBy(col("a")).agg(min(col("b")).as("m"))
      val (next, nextCount) = ckptWithCount(oriented.join(mins2, Seq("a"))
        .filter(col("b") =!= col("m"))
        .select(col("b").as("a"), col("m").as("b"))
        .unionByName(mins2.select(col("a"), col("m").as("b")))
        .distinct())
      converged = nextCount == edgeCount &&
        next.exceptAll(edges).limit(1).count() == 0L
      freeCheckpoint(edges) // superseded round's blocks
      edges = next
      edgeCount = nextCount
      iter += 1
    }
    require(converged,
      s"clustersStar() did not converge within $maxIters rounds — " +
        "O(log n) contraction should never need this many; check the input")
    // fixpoint edges are (node → component root); roots label themselves
    nodes.join(edges.groupBy(col("a")).agg(min(col("b")).as("cid")),
        nodes("id") === col("a"), "left")
      .select(col("id"), coalesce(col("cid"), col("id")).as("cluster_id"))
  }

  /** Cluster + keeper selection in one pass: label every clustered doc,
    * then per cluster pick the longest text (doc_id-asc tiebreak) as
    * the keeper and count members — a single shuffle on cluster_id
    * (both window functions and the count share the partition). */
  def clustersWithKeeper(corpus: DataFrame, pairs: DataFrame): DataFrame =
    keeperize(corpus, clusters(pairs))

  /** Keeper selection over a (id, cluster_id) labeling — shared by the
    * propagation and star-contraction paths so both emit the same
    * report shape. */
  private[ops] def keeperize(corpus: DataFrame, cc: DataFrame): DataFrame = {
    val labeled = cc
      .join(corpus.select(col("doc_id").as("id"), length(col("text")).as("len")), Seq("id"))
      .select(col("id").as("doc_id"), col("cluster_id"), col("len"))
    val ordered = Window.partitionBy(col("cluster_id"))
      .orderBy(col("len").desc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val whole = Window.partitionBy(col("cluster_id"))
    labeled
      .withColumn("keeper_id", first(col("doc_id")).over(ordered))
      .withColumn("n_members", count(lit(1)).over(whole))
      .select(col("cluster_id"), col("doc_id"), col("keeper_id"), col("n_members"))
  }

  /** [[keeperize]] with the QUALITY keeper policy: per cluster keep
    * the highest-quality member ([[TextAnalysis.qualityScore]],
    * doc_id-asc tiebreak on the 6dp-rounded score), not the longest.
    * This is the keeper production dedup pipelines actually want — a
    * near-dup cluster often holds one clean copy and n boilerplate-
    * wrapped ones, and "longest" keeps the wrapper. Same plan shape as
    * [[keeperize]]: quality is a narrow map over the scan, the join
    * retains cluster members only, and the keeper pick is one window
    * over cluster-sized partitions. NULL quality (token-free text)
    * orders LAST under either engine's pinned NULLS LAST. */
  private[graft] def keeperizeByQuality(corpus: DataFrame, cc: DataFrame): DataFrame = {
    val q = TextAnalysis.qualityScore(corpus).select(col("doc_id").as("id"), col("quality"))
    val labeled = cc.join(q, Seq("id"))
      .select(col("id").as("doc_id"), col("cluster_id"), col("quality"))
    val ordered = Window.partitionBy(col("cluster_id"))
      .orderBy(col("quality").desc_nulls_last, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val whole = Window.partitionBy(col("cluster_id"))
    labeled
      .withColumn("keeper_id", first(col("doc_id")).over(ordered))
      .withColumn("n_members", count(lit(1)).over(whole))
      .select(col("cluster_id"), col("doc_id"), col("keeper_id"),
        col("quality"), col("n_members"))
  }

  /** DuckDB twin of [[keeperizeByQuality]] over the minhash pair graph. */
  def duckClustersKeepQuality(pairsSql: String): String =
    s"""WITH RECURSIVE corpus AS ($duckCorpusWithDups),
       |pr AS (SELECT id_a, id_b FROM ($pairsSql) mp),
       |adj AS (SELECT id_a AS a, id_b AS b FROM pr UNION ALL SELECT id_b, id_a FROM pr),
       |nodes AS (SELECT DISTINCT a AS id FROM adj),
       |lp(id, lab) AS (
       |  SELECT id, id FROM nodes
       |  UNION
       |  SELECT adj.b, lp.lab FROM lp JOIN adj ON adj.a = lp.id WHERE lp.lab < adj.b),
       |cc AS (SELECT id, min(lab) AS cluster_id FROM lp GROUP BY id),
       |${TextAnalysis.duckQualityCtesFor("corpus")},
       |labeled AS (SELECT cc.id AS doc_id, cc.cluster_id, q.quality
       |  FROM cc JOIN q ON q.doc_id = cc.id)
       |SELECT cluster_id, doc_id,
       |  first_value(doc_id) OVER (PARTITION BY cluster_id
       |    ORDER BY quality DESC NULLS LAST, doc_id ASC
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS keeper_id,
       |  quality, count(*) OVER (PARTITION BY cluster_id) AS n_members
       |FROM labeled
       |ORDER BY cluster_id, doc_id""".stripMargin

  /** DuckDB twin of [[clusters]]+[[clustersWithKeeper]]: recursive CTE
    * propagating labels along monotone-decreasing paths — the
    * component min reaches every node because every edge out of the
    * min satisfies `lab < b`. */
  def duckClustersWithKeeper(pairsSql: String): String =
    s"""WITH RECURSIVE corpus AS ($duckCorpusWithDups),
       |pr AS (SELECT id_a, id_b FROM ($pairsSql) mp),
       |adj AS (SELECT id_a AS a, id_b AS b FROM pr UNION ALL SELECT id_b, id_a FROM pr),
       |nodes AS (SELECT DISTINCT a AS id FROM adj),
       |lp(id, lab) AS (
       |  SELECT id, id FROM nodes
       |  UNION
       |  SELECT adj.b, lp.lab FROM lp JOIN adj ON adj.a = lp.id WHERE lp.lab < adj.b),
       |cc AS (SELECT id, min(lab) AS cluster_id FROM lp GROUP BY id),
       |labeled AS (SELECT cc.id AS doc_id, cc.cluster_id, length(c.text) AS len
       |  FROM cc JOIN corpus c ON c.doc_id = cc.id)
       |SELECT cluster_id, doc_id,
       |  first_value(doc_id) OVER (PARTITION BY cluster_id
       |    ORDER BY len DESC, doc_id ASC
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS keeper_id,
       |  count(*) OVER (PARTITION BY cluster_id) AS n_members
       |FROM labeled
       |ORDER BY cluster_id, doc_id""".stripMargin

  // -- query/oracle registry ---------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_dedup_embedding_lsh" -> ((s, dir) =>
      Ckpt.ordered(embeddingPairsLsh(t(s, dir, "embeddings")),
        col("id_a"), col("id_b"))),
    "x_dedup_exact" -> ((s, dir) => {
      exact(corpusWithDups(t(s, dir, "documents")))
        .orderBy(col("keeper_id"))
    }),
    "x_dedup_minhash" -> ((s, dir) =>
      minhashPairs(corpusWithDups(t(s, dir, "documents")))
        .orderBy(col("id_a"), col("id_b"))),
    "x_dedup_pagerank" -> ((s, dir) =>
      neardupPagerank(corpusWithDups(t(s, dir, "documents")))
        .orderBy(col("doc_id"))),
    "x_minhash_estimate" -> ((s, dir) =>
      minhashEstimate(corpusWithDups(t(s, dir, "documents")))
        .orderBy(col("id_a"), col("id_b"))),
    // oracle-pinned 32-bit legacy form: the frozen suite hashes
    // against the 32-bit DuckDB twin; the PUBLIC simhashPairs is 64-bit
    "x_dedup_simhash" -> ((s, dir) =>
      simhashPairs32Oracle(corpusWithDups(t(s, dir, "documents")))
        .orderBy(col("id_a"), col("id_b"))),
    "x_dedup_ngram" -> ((s, dir) =>
      ngramJaccardPairs(corpusWithDups(t(s, dir, "documents")))
        .orderBy(col("id_a"), col("id_b"))),
    "x_dedup_embedding" -> ((s, dir) =>
      embeddingPairs(t(s, dir, "embeddings"))
        .orderBy(col("id_a"), col("id_b"))),

    // incremental gate: history = doc_id < 400; the new batch is the
    // rest PLUS planted perturbed copies of history docs (+2000000
    // ids) that MUST be flagged against their sources — non-vacuous
    // by construction
    "x_dedup_incremental" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val history = d.filter(col("doc_id") < 400)
        .select(col("doc_id"), col("text"))
      val planted = history.filter(col("doc_id") % 25 === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          concat(col("text"), lit(" zz yy xx")).as("text"))
      val fresh = d.filter(col("doc_id") >= 400)
        .select(col("doc_id"), col("text"))
        .unionByName(planted)
        .repartition(col("doc_id"))
      dedupAgainstHistory(history, fresh)
        .orderBy(col("new_id"), col("hist_id"))
    }),
    // Containment near-dup: planted 40% prefix excerpts must flag
    // against their sources with containment ≈ 1.0 while symmetric
    // Jaccard (~0.4) would never pair them.
    "x_dedup_containment" -> ((s, dir) =>
      Ckpt.ordered(containmentPairs(corpusWithExcerpts(t(s, dir, "documents"))),
        col("id_a"), col("id_b"))),
    // Bloom-prefiltered EXACT incremental dedup: fresh batch = unseen
    // docs (doc_id >= 400), verbatim re-crawls of every 10th history
    // doc (must resolve to their dup_of), and near-miss edits of every
    // 7th (one appended token — must stay null: exact dedup is not
    // fuzzy). The Bloom sketch only gates the join; the oracle is the
    // sketch-free join, so any sketch-induced semantics drift fails
    // the hash compare.
    "x_dedup_bloom" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val history = d.filter(col("doc_id") < 400).select(col("doc_id"), col("text"))
      val fresh = d.filter(col("doc_id") >= 400).select(col("doc_id"), col("text"))
        .unionByName(history.filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 2000000L).as("doc_id"), col("text")))
        .unionByName(history.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 3000000L).as("doc_id"),
            concat(col("text"), lit(" edited")).as("text")))
      dedupIncrementalBloom(history, fresh)
        .orderBy(col("new_id"))
    }),
    // Pairs → connected components → keeper: the grouping step that
    // makes pairwise near-dup output actionable (transitivity closure
    // over the MinHash pair graph, then one keeper per cluster).
    "x_dedup_clusters" -> ((s, dir) => {
      val corpus = corpusWithDups(t(s, dir, "documents"))
      Ckpt.ordered(
        clustersWithKeeper(corpus,
          minhashPairs(corpus).select(col("id_a"), col("id_b"))),
        col("cluster_id"), col("doc_id"))
    }),

    // Quality keeper policy: per cluster keep the best-quality member
    // — the production choice when a cluster holds one clean copy and
    // n boilerplate-wrapped near-dups (longest-keeper keeps the
    // wrapper; min-id keeps whichever crawled first).
    "x_dedup_keep_quality" -> ((s, dir) => {
      val corpus = corpusWithDups(t(s, dir, "documents"))
      Ckpt.ordered(keeperizeByQuality(corpus,
          clusters(minhashPairs(corpus).select(col("id_a"), col("id_b")))),
        col("cluster_id"), col("doc_id"))
    }),

    // Same components through the O(log n) star contraction — the
    // scale path for chain-shaped graphs, oracle-gated against the
    // identical recursive-CTE labeling so both algorithms are held to
    // the same answer on the same pair list.
    "x_dedup_clusters_star" -> ((s, dir) => {
      val corpus = corpusWithDups(t(s, dir, "documents"))
      Ckpt.ordered(keeperize(corpus,
          clustersStar(minhashPairs(corpus).select(col("id_a"), col("id_b")))),
        col("cluster_id"), col("doc_id"))
    }),

    // Exact-substring dedup: unrelated docs sharing one long verbatim
    // span pair up on shared window hashes. The planted 60-token span
    // yields 41 shared 20-token windows per planted pair — far above
    // minShared, and invisible to whole-doc MinHash.
    "x_substring_dedup" -> ((s, dir) =>
      substringPairs(corpusWithSpan(t(s, dir, "documents")))
        .orderBy(col("id_a"), col("id_b"))),

    // Dedup quality gate: recall of the banded-LSH candidate path
    // against the label-blocked exact pairs (which contain every
    // planted near-dup, since a perturbed copy keeps its label). The
    // round-1 LSH variant hash-matched its oracle while finding 0 of
    // them — recall as a graded output makes that failure mode
    // impossible to miss again.
    "x_dedup_lsh_recall" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      // ONE evaluation of each pair pipeline: membership flags through a
      // full-outer join, all three counts from a single aggregate. The
      // round-3 version counted each side separately AND joined them —
      // four pipeline executions where one pass suffices.
      val exactPairs = embeddingPairs(emb).select(col("id_a"), col("id_b"))
        .withColumn("in_e", lit(1L))
      val lshPairs = embeddingPairsLsh(emb).select(col("id_a"), col("id_b"))
        .withColumn("in_l", lit(1L))
      exactPairs.join(lshPairs, Seq("id_a", "id_b"), "full_outer")
        .agg(
          coalesce(sum(coalesce(col("in_e"), lit(0L))), lit(0L)).as("n_exact"),
          coalesce(sum(coalesce(col("in_l"), lit(0L))), lit(0L)).as("n_lsh"),
          coalesce(sum(when(col("in_e") === 1L && col("in_l") === 1L, 1L)
            .otherwise(0L)), lit(0L)).as("n_common"))
        .select(col("n_exact"), col("n_lsh"), col("n_common"),
          round(when(col("n_exact") > 0,
            col("n_common").cast("double") / col("n_exact")), 6).as("recall"))
    })
  )

  def oracles: Map[String, String] = Map(
    "x_dedup_embedding_lsh" -> duckEmbeddingPairsLsh(),
    "x_dedup_exact" ->
      s"""WITH corpus AS ($duckCorpusWithDups)
         |SELECT md5(text) AS content_hash, min(doc_id) AS keeper_id, count(*) AS n_copies
         |FROM corpus GROUP BY 1 ORDER BY keeper_id""".stripMargin,
    "x_dedup_minhash" -> duckMinhashPairs(),
    "x_dedup_pagerank" -> duckPagerank(),
    "x_minhash_estimate" -> duckMinhashEstimate(),
    // identical shingle hashes, identical df cap on both sides,
    // identical capped denominator
    "x_dedup_containment" ->
      s"""WITH corpus AS ($duckCorpusWithExcerpts),
         |sh AS (SELECT doc_id, list_distinct(list_transform(${duckShingles("text")},
         |    s -> ${Embedder.duckStringHash("s")})) AS hs FROM corpus),
         |posts AS (SELECT doc_id, unnest(hs) AS h FROM sh),
         |rare AS (SELECT doc_id, h FROM (
         |    SELECT doc_id, h, count(*) OVER (PARTITION BY h) AS df FROM posts) z
         |  WHERE df <= 64),
         |sz AS (SELECT doc_id, count(*)::DOUBLE AS sz_a FROM rare GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*)::DOUBLE AS inter
         |  FROM rare a JOIN rare b ON a.h = b.h AND a.doc_id != b.doc_id
         |  GROUP BY 1, 2)
         |SELECT id_a, id_b, ROUND(inter / sz_a, 6) AS containment
         |FROM inter JOIN sz ON sz.doc_id = id_a
         |WHERE ROUND(inter / sz_a, 6) >= 0.9
         |ORDER BY id_a, id_b""".stripMargin,

    // the sketch-free reference join: identical output is the whole
    // point of the Bloom pre-filter
    "x_dedup_bloom" ->
      """WITH history AS (SELECT doc_id, text FROM documents WHERE doc_id < 400),
        |fresh AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id >= 400
        |  UNION ALL
        |  SELECT doc_id + 2000000 AS doc_id, text
        |  FROM documents WHERE doc_id < 400 AND doc_id % 10 = 0
        |  UNION ALL
        |  SELECT doc_id + 3000000 AS doc_id, text || ' edited' AS text
        |  FROM documents WHERE doc_id < 400 AND doc_id % 7 = 0)
        |SELECT f.doc_id AS new_id, min(h.doc_id) AS dup_of
        |FROM fresh f LEFT JOIN history h ON md5(f.text) = md5(h.text)
        |GROUP BY f.doc_id
        |ORDER BY new_id""".stripMargin,

    "x_dedup_incremental" -> {
      s"""WITH history AS (SELECT doc_id, text FROM documents WHERE doc_id < 400),
         |fresh AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id >= 400
         |  UNION ALL
         |  SELECT doc_id + 2000000 AS doc_id, text || ' zz yy xx' AS text
         |  FROM documents WHERE doc_id < 400 AND doc_id % 25 = 0),
         |hsig AS (${duckSigsCte("history", 8)}),
         |fsig AS (${duckSigsCte("fresh", 8)}),
         |hb AS (${duckBandsCte("hsig", 8)}),
         |fb AS (${duckBandsCte("fsig", 8)})
         |SELECT DISTINCT fb.doc_id AS new_id, hb.doc_id AS hist_id,
         |  ROUND(len(list_intersect(fb.hs, hb.hs))::DOUBLE /
         |    len(list_distinct(fb.hs || hb.hs))::DOUBLE, 6) AS jaccard
         |FROM fb JOIN hb ON fb.band = hb.band AND fb.bval = hb.bval
         |WHERE ROUND(len(list_intersect(fb.hs, hb.hs))::DOUBLE /
         |    len(list_distinct(fb.hs || hb.hs))::DOUBLE, 6) >= 0.5
         |ORDER BY new_id, hist_id""".stripMargin
    },
    "x_dedup_simhash" -> duckSimhashPairs(),
    "x_dedup_ngram" -> duckNgramJaccardPairs(),
    "x_dedup_embedding" -> duckEmbeddingPairs(),
    "x_dedup_clusters" -> duckClustersWithKeeper(duckMinhashPairs()),
    "x_dedup_clusters_star" -> duckClustersWithKeeper(duckMinhashPairs()),
    "x_dedup_keep_quality" -> duckClustersKeepQuality(duckMinhashPairs()),
    "x_substring_dedup" -> duckSubstringPairs(),
    "x_dedup_lsh_recall" ->
      s"""WITH e AS (${duckEmbeddingPairs()}), l AS (${duckEmbeddingPairsLsh()})
         |SELECT n_exact, n_lsh, n_common,
         |  ROUND(CASE WHEN n_exact > 0 THEN n_common::DOUBLE / n_exact END, 6) AS recall
         |FROM (SELECT (SELECT count(*) FROM e)::BIGINT AS n_exact,
         |  (SELECT count(*) FROM l)::BIGINT AS n_lsh,
         |  (SELECT count(*) FROM e JOIN l USING (id_a, id_b))::BIGINT AS n_common)""".stripMargin
  )
}
