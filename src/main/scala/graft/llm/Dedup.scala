package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH,
  * SimHash, and exact n-gram Jaccard verification.
  *
  * Scale design (100 TB):
  *  - exact dedup is one hash-aggregate (partial+final, no data movement beyond
  *    one shuffle of group keys);
  *  - MinHash signatures and SimHash are row-local columnar expressions
  *    (no UDFs, whole-stage codegen);
  *  - LSH candidate generation shuffles only (band_idx, band_hash, id) triples
  *    — a tiny fraction of the corpus — and caps pathological buckets
  *    (boilerplate/empty docs produce huge buckets; real pipelines drop them);
  *  - exact Jaccard verification touches only candidate pairs, joining the
  *    shingle sets back by id.
  */
object Dedup {

  /** Exact dedup: one representative row id per distinct value of `cols`,
    * plus the duplicate count. `groupBy(...).agg(min(id))` — the partial/final
    * aggregate shape the reference hand-codes for distinct
    * (stream_compaction.cpp:44-96).
    */
  def exact(df: DataFrame, cols: Seq[String], idCol: String): DataFrame =
    df.groupBy(cols.map(col): _*)
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** MinHash signature: k independent minimum hashes over the doc's word
    * n-gram shingle set. hash_j(s) = xxhash64(s, j) — seeding via an extra
    * hashed column, all codegen'd built-ins.
    */
  def minhashSignature(text: Column, numHashes: Int, shingleSize: Int = 3): Column =
    signatureOfShingles(array_distinct(TextFns.wordShingles(text, shingleSize)), numHashes)

  /** Signature from an already-materialized shingle-set column, via the
    * native one-pass MinHashSignatureExpr (see functions.HashExprs — the k×
    * array_min(transform(...)) form re-walks the shingle array per hash
    * function with interpreted lambdas).
    */
  private def signatureOfShingles(shingles: Column, numHashes: Int): Column =
    graft.functions.Registry.minhash(shingles, numHashes)

  /** (id, hashed-shingle-set) frame, persisted — shared by signature
    * computation and exact-Jaccard verification so each document is shingled
    * and hashed exactly once. Shingles are stored as sorted distinct xxhash64
    * values: set cardinalities (and hence Jaccard) are preserved modulo
    * 64-bit collisions, and every downstream op works on primitive longs.
    */
  private def shingleSets(df: DataFrame, idCol: String, textCol: String, shingleSize: Int): DataFrame =
    df.select(
      col(idCol).as("id"),
      sort_array(array_distinct(
        transform(TextFns.wordShingles(col(textCol), shingleSize), s => xxhash64(s))))
        .as("sh"))
      .persist()

  /** LSH candidate pairs from MinHash signatures.
    *
    * Bands the signature into `bands` groups of `rowsPerBand`, hashes each
    * band, and self-joins ids that share any (band_idx, band_hash) bucket.
    * Buckets larger than `maxBucket` are dropped (skew guard: at corpus scale
    * a few degenerate buckets would otherwise produce O(n²) pairs).
    *
    * Returns distinct (id_a, id_b) with id_a < id_b.
    */
  def minhashCandidates(
      df: DataFrame,
      idCol: String,
      textCol: String,
      bands: Int = 8,
      rowsPerBand: Int = 4,
      shingleSize: Int = 3,
      maxBucket: Int = 1000): DataFrame = {
    val sh = shingleSets(df, idCol, textCol, shingleSize)
    val (cands, banded) = candidatesFromSignatures(
      sh.select(col("id"), signatureOfShingles(col("sh"), bands * rowsPerBand).as("sig")),
      bands, rowsPerBand, maxBucket)
    finishAndRelease(cands, banded, sh)
  }

  /** Materialize `result` (localCheckpoint: computed once, lineage cut), then
    * unpersist the cached intermediates it depended on. Without this, each
    * call leaked its persisted frames until LRU eviction / session end
    * (round-2 advice). The checkpointed result itself is released by the
    * ContextCleaner when the returned DataFrame is garbage-collected.
    */
  private def finishAndRelease(result: DataFrame, cached: DataFrame*): DataFrame = {
    val out = result.localCheckpoint(eager = true)
    cached.foreach(_.unpersist(blocking = false))
    out
  }

  /** Candidate pairs from a persisted (id, sig) frame. Returns the candidate
    * pairs plus the internally-persisted banded frame, which the caller must
    * unpersist once the candidates are materialized.
    */
  private def candidatesFromSignatures(
      sig: DataFrame, bands: Int, rowsPerBand: Int, maxBucket: Int): (DataFrame, DataFrame) = {
    val banded = bandedKeys(sig, bands, rowsPerBand)
      // persisted: referenced twice by the self-join, and banding is the
      // expensive part of the pipeline (signatures over every shingle)
      .persist()
    val capped = capBuckets(banded, maxBucket)
    val a = capped.as("a")
    val b = capped.as("b")
    (a.join(b,
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct(), banded)
  }

  /** Exact word-shingle Jaccard for given pairs: joins the shingle sets back
    * by id and computes |∩| / |∪| with array built-ins.
    */
  def jaccardVerify(
      pairs: DataFrame, // (id_a, id_b)
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3): DataFrame = {
    val sh = shingleSets(df, idCol, textCol, shingleSize)
    finishAndRelease(jaccardOfPairs(pairs, sh), sh)
  }

  private def jaccardOfPairs(pairs: DataFrame, sets: DataFrame): DataFrame =
    pairs
      .join(sets.withColumnsRenamed(Map("id" -> "id_a", "sh" -> "sh_a")), "id_a")
      .join(sets.withColumnsRenamed(Map("id" -> "id_b", "sh" -> "sh_b")), "id_b")
      .select(
        col("id_a"), col("id_b"),
        // sets are sorted long arrays → single merge pass per pair
        graft.functions.Registry.jaccardSorted(col("sh_a"), col("sh_b")).as("jaccard"))

  /** MinHash-LSH near-duplicate pairs with exact Jaccard confirmation.
    *
    * Precision is exact (candidates are verified); recall at similarity j is
    * 1-(1-j^rowsPerBand)^bands — pick (bands, rowsPerBand) so the S-curve
    * midpoint (1/bands)^(1/rowsPerBand) sits WELL BELOW `threshold`, e.g.
    * 16×2 gives midpoint 0.25 and recall ≥ 1-8e-8 for j ≥ 0.8. The defaults
    * (8×4, midpoint 0.59) suit thresholds ≥ 0.85. A signature pre-filter
    * (see below) additionally drops candidates whose estimated Jaccard is
    * more than max(0.4, 2.5/√numHashes) below `threshold`; its false-drop
    * probability at j ≥ threshold is ≲ 1e-6 and it is skipped entirely when
    * numHashes < 16.
    */
  def nearDuplicates(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.7,
      bands: Int = 8,
      rowsPerBand: Int = 4,
      shingleSize: Int = 3): DataFrame = {
    // one shingling pass shared by candidate generation AND verification
    val sh = shingleSets(df, idCol, textCol, shingleSize)
    val numHashes = bands * rowsPerBand
    val sig = sh.select(
      col("id"), signatureOfShingles(col("sh"), numHashes).as("sig")).persist()
    val (cands, banded) = candidatesFromSignatures(sig, bands, rowsPerBand, maxBucket = 1000)
    // Signature pre-filter: the positional match fraction of two signatures
    // estimates Jaccard, and the signatures (numHashes longs) are already
    // computed — far cheaper to join back than the shingle sets (hundreds of
    // longs). The margin below the threshold scales with signature length:
    // the estimator's std at j=threshold is ≤ 0.5/√numHashes, so a margin of
    // max(0.4, 2.5/√numHashes) keeps the false-drop probability ≲ 1e-6 at
    // ANY numHashes (a fixed 0.4 margin is only a ~1e-8 bound for ≥32
    // hashes). Below 16 hashes the estimator is too coarse (granularity
    // 1/numHashes) to drop anything safely — skip the pre-filter entirely
    // and let exact verification do the work.
    val margin = math.max(0.4, 2.5 / math.sqrt(numHashes.toDouble))
    val estCutoff = math.max(0.0, threshold - margin)
    val prefiltered =
      if (numHashes < 16 || estCutoff == 0.0) cands
      else cands
        .join(sig.withColumnsRenamed(Map("id" -> "id_a", "sig" -> "sig_a")), "id_a")
        .join(sig.withColumnsRenamed(Map("id" -> "id_b", "sig" -> "sig_b")), "id_b")
        .filter(graft.functions.Registry.matchFraction(col("sig_a"), col("sig_b")) >= estCutoff)
        .select("id_a", "id_b")
    finishAndRelease(
      jaccardOfPairs(prefiltered, sh).filter(col("jaccard") >= threshold),
      banded, sig, sh)
  }

  /** Filter a corpus down to near-duplicate survivors: every document that
    * appears as the GREATER id of a confirmed near-dup pair is dropped, so
    * the lowest id of each duplicate group survives (pairs are emitted with
    * id_a < id_b). This is the standard practical LSH-dedup policy
    * (single-linkage by pairs, keep-first): transitive chains collapse to
    * their minimum id except where the chain's links were themselves below
    * threshold — acceptable for corpus curation, exact for the common
    * mirror/boilerplate case. One anti-join against the (small) dropped-id
    * set — broadcast-able at any corpus scale.
    */
  def dropNearDuplicates(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.7,
      bands: Int = 8,
      rowsPerBand: Int = 4,
      shingleSize: Int = 3): DataFrame = {
    val pairs = nearDuplicates(df, idCol, textCol, threshold, bands, rowsPerBand, shingleSize)
    val dropped = pairs.select(col("id_b").as(idCol)).distinct()
    df.join(dropped, Seq(idCol), "left_anti")
  }

  /** Near-dup corpus filtering, QUALITY-AWARE policy: instead of keeping the
    * lowest id of each duplicate group ([[dropNearDuplicates]]), keep the
    * group member maximizing `score` (ties → lowest id) — "keep the most
    * complete / highest-quality copy", the curation policy used when
    * duplicates differ (truncated mirrors, boilerplate-injected rehosts).
    * Groups are TRANSITIVE clusters ([[nearDupClusters]]' connected
    * components), so a chain a~b~c keeps exactly one representative even
    * when a~c is below threshold.
    *
    * Scale shape: clustering cost is [[nearDupClusters]] (LSH bands + log-
    * round CC over only the paired docs); the representative pick is ONE
    * ranking window over (cluster_id) with WindowGroupLimit pushdown —
    * no group ever materializes more than its top row per partition.
    */
  def keepBestPerCluster(
      df: DataFrame,
      idCol: String,
      textCol: String,
      score: Column,
      threshold: Double = 0.7,
      bands: Int = 8,
      rowsPerBand: Int = 4,
      shingleSize: Int = 3): DataFrame = {
    val assigned = nearDupClusters(df, idCol, textCol, threshold, bands, rowsPerBand, shingleSize)
    val scored = df.withColumn("__graft_score", score).join(assigned, Seq(idCol))
    graft.operators.Sorts.topKPerGroup(scored, Seq("cluster_id"),
      Seq(col("__graft_score").desc, col(idCol).asc), 1)
      .drop("__graft_score")
  }

  /** Duplicated-SPAN detection — substring-level dedup, the within-document
    * complement of the whole/near-document ops above: per document, the
    * maximal token spans whose word `n`-grams also occur in at least
    * `minDocs` distinct documents (counting this one). Whole-doc dedup
    * misses a page that is 90% boilerplate plus a unique header; span
    * detection localizes the repeated region so a pipeline can CUT it
    * instead of dropping (or keeping) the whole document.
    *
    * Plan shape, all partial+final / window — no pairwise comparison:
    *   1. explode positioned n-grams (one row per token position — the same
    *      gram stream every shingle op here uses, so a 100 TB run shares the
    *      scan);
    *   2. grams appearing in ≥ `minDocs` distinct docs — a two-level
    *      count-distinct aggregate keyed by gram (boilerplate grams are few;
    *      the aggregate shuffles one row per distinct gram after map-side
    *      combine);
    *   3. semi-join positions to duplicated grams (AQE broadcasts the dup
    *      set when it is small, falls back to shuffle when it is not);
    *   4. merge hit positions into maximal spans: two windows per doc
    *      (running max-end, then island numbering) + one group-by — overlap
    *      merging without self-joining intervals.
    *
    * Documents shorter than `n` tokens participate as a single whole-doc
    * gram (the [[graft.llm.TextFns.wordShingles]] convention), so exact
    * short-doc copies still surface as full-width spans. Every step is
    * integer arithmetic over positions — bit-reproducible in any engine.
    *
    * Output: (idCol, span_start, span_end, span_tokens, n_grams) — token
    * positions 0-based inclusive, one row per maximal span.
    */
  def duplicatedSpans(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      minDocs: Int = 2): DataFrame = {
    require(n > 0, s"n must be positive: $n")
    require(minDocs >= 2, s"minDocs below 2 would mark every position: $minDocs")
    import org.apache.spark.sql.expressions.Window
    val grams = df
      .select(col(idCol), TextFns.wordShingles(col(textCol), n).as("__graft_gs"),
        size(TextFns.tokens(col(textCol))).as("__graft_ntok"))
      .select(col(idCol), posexplode(col("__graft_gs")).as(Seq("pos", "__graft_gram")),
        least(lit(n), col("__graft_ntok")).as("__graft_glen"))
    val dupGrams = grams
      .groupBy("__graft_gram")
      .agg(countDistinct(col(idCol)).as("__graft_nd"))
      .filter(col("__graft_nd") >= minDocs)
      .select("__graft_gram")
    val hits = grams.join(dupGrams, Seq("__graft_gram"), "left_semi")
      .select(col(idCol), col("pos"), (col("pos") + col("__graft_glen") - 1).as("__graft_e"))
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val prevEnd = max(col("__graft_e"))
      .over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
    val newIsland = when(prevEnd.isNull || col("pos") > prevEnd + 1, 1).otherwise(0)
    hits
      .withColumn("__graft_isl",
        sum(newIsland).over(byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(idCol), col("__graft_isl"))
      .agg(
        min(col("pos")).as("span_start"),
        max(col("__graft_e")).as("span_end"),
        (max(col("__graft_e")) - min(col("pos")) + 1).as("span_tokens"),
        count(lit(1)).as("n_grams"))
      .drop("__graft_isl")
  }

  /** Corpus-level boilerplate scrub with text reconstruction — the C4/CCNet
    * transform: every word `n`-gram window shared by at least `minDocs`
    * distinct documents marks its token positions covered; covered tokens
    * are dropped and the survivors re-join in position order.
    *
    * Returns (idCol, n_tok, n_kept, clean_text); documents whose every
    * token is covered (pure boilerplate) drop out entirely, mirroring what
    * a curation pipeline does with them.
    *
    * Scale design (100 TB): window identification is HASH-FIRST — the
    * native ShingleHashesExpr emits one 8-byte hash per window (never the
    * window strings, which would be n × corpus-text bytes), the boilerplate
    * candidate set is one hash-keyed partial+final aggregate, and only the
    * surviving (doc, pos) windows re-derive their exact strings for the
    * real count-distinct (also where hash collisions die). Marking is one
    * gram-keyed join back (never doc×doc); removal is a (doc, pos) anti
    * join between co-keyed exploded frames; the rebuild is one per-doc
    * aggregate. Every stage is linear in corpus tokens (ScaleProbe `scrub`).
    */
  def scrubBoilerplate(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      minDocs: Int = 3): DataFrame = {
    require(n > 0, s"n must be positive: $n")
    require(minDocs >= 2, s"minDocs below 2 would mark every position: $minDocs")
    val toks = df
      .select(col(idCol), TextFns.portableTokens(col(textCol)).as("__graft_toks"))
      .withColumn("__graft_n", size(col("__graft_toks")))
      .filter(col("__graft_n") > 0)
      .persist()
    // Hash-first two-phase plan (same split as [[scrubDuplicateSpans]],
    // exactness preserved): phase 1 counts 8-byte native window hashes —
    // count(*) per hash ≥ countDistinct(doc) per gram always, so every
    // qualifying gram's windows survive the filter; phase 2 re-derives the
    // exact window strings only for suspect (doc, pos) rows and runs the
    // real count-distinct there (hash collisions die in phase 2). The
    // corpus-wide shuffle carries hashes instead of gram strings.
    val hashed = toks.selectExpr(idCol, "__graft_n",
      s"posexplode(graft_shingle_hashes(__graft_toks, $n)) AS (pos, __graft_h)")
    val suspectH = hashed.groupBy("__graft_h")
      .agg(count(lit(1)).as("__graft_hc"))
      .filter(col("__graft_hc") >= minDocs)
      .select("__graft_h")
    val suspectGrams = hashed.join(suspectH, Seq("__graft_h"), "left_semi")
      .join(toks.select(col(idCol), col("__graft_toks")), Seq(idCol))
      .select(col(idCol), col("__graft_n"), col("pos"),
        concat_ws(" ",
          slice(col("__graft_toks"), col("pos") + 1, lit(n))).as("__graft_gram"))
    val boiler = suspectGrams.groupBy("__graft_gram")
      .agg(countDistinct(col(idCol)).as("__graft_nd"))
      .filter(col("__graft_nd") >= minDocs)
      .select("__graft_gram")
    val covered = suspectGrams.join(boiler, Seq("__graft_gram"), "left_semi")
      .select(col(idCol), explode(expr(
        s"sequence(pos, least(pos + ${n - 1}, __graft_n - 1))")).as("__graft_p"))
      .distinct()
    val kept = toks
      .select(col(idCol), col("__graft_n"),
        posexplode(col("__graft_toks")).as(Seq("__graft_p", "__graft_w")))
      .join(covered, Seq(idCol, "__graft_p"), "left_anti")
    finishAndRelease(
      kept.groupBy(idCol)
        .agg(first(col("__graft_n")).cast("long").as("n_tok"),
          count(lit(1)).as("n_kept"),
          array_join(array_sort(collect_list(struct(col("__graft_p"),
            col("__graft_w")))).getField("__graft_w"), " ").as("clean_text")),
      toks)
  }

  /** Substring-level exact dedup WITH REMOVAL (the ExactSubstr regime of Lee
    * et al. 2022, "Deduplicating Training Data Makes Language Models Better"):
    * any word `n`-gram window whose exact text occurs at least `minCount`
    * times in the corpus — across documents OR repeated within one — marks
    * its token positions covered; covered tokens are dropped and the
    * survivors re-join in position order. This is the transform q132 only
    * *reports* (it lists duplicated spans) and [[scrubBoilerplate]] only
    * half-covers (its criterion is distinct-DOC count, so within-doc
    * repetition never triggers; its window is short).
    *
    * Two deliberate deltas from the paper, both documented for callers:
    * the window is a parameter (the paper's 50 BPE tokens ≈ n≈30–40 words;
    * tests use shorter windows matched to the corpus' document length), and
    * ALL occurrences of a duplicated window are removed rather than keeping
    * one survivor — remove-all is order-free and therefore deterministic
    * under any partitioning (keep-one needs a global occurrence order),
    * which is what a cross-engine differential gate and a resumable 100 TB
    * job both want. Callers who need a retained copy union the dropped
    * spans' first occurrence back from [[duplicatedSpans]].
    *
    * Returns (idCol, n_tok, n_kept, clean_text); fully-covered documents
    * drop out (same contract as [[scrubBoilerplate]]).
    *
    * Scale design (100 TB): identical to [[scrubBoilerplate]]'s hash-first
    * two-phase plan — native 8-byte window hashes feed the duplicate-count
    * aggregate (count(*), cheaper than the boilerplate path's
    * count-distinct since no doc ids travel), only suspect (doc, pos)
    * windows re-derive exact strings for the verifying count, then one
    * (doc, pos) anti join and one per-doc rebuild agg. Every stage linear
    * in corpus tokens; ScaleProbe `scrub_dupspans` measures wall vs tokens
    * (the string-form predecessor was GC-bound superlinear at the 800k-doc
    * step; the hash-first form cut that step 70 → 21 s and restored
    * linearity).
    */
  def scrubDuplicateSpans(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 15,
      minCount: Int = 2): DataFrame = {
    require(n > 0, s"n must be positive: $n")
    require(minCount >= 2, s"minCount below 2 would mark every position: $minCount")
    val toks = df
      .select(col(idCol), TextFns.portableTokens(col(textCol)).as("__graft_toks"))
      .withColumn("__graft_n", size(col("__graft_toks")))
      .filter(col("__graft_n") > 0)
      .persist()
    // Hash-first two-phase plan (exactness preserved): at n = 15 each window
    // STRING is ~200-500 B, so the string forms allocate n × corpus-text
    // bytes just to feed the duplicate-count agg — measured GC-bound
    // superlinear at the probe's 800k-doc step. Phase 1 hashes every window
    // natively (graft_shingle_hashes: one xxhash64 per token + a polynomial
    // fold per window, 8 B out, ZERO window strings) and counts hashes;
    // hash-count ≥ string-count always, so every true duplicate's window
    // survives the filter. Phase 2 re-derives the exact window string ONLY
    // for suspect (doc, pos) rows — O(duplicated windows), not O(corpus) —
    // and re-counts on strings, which also eliminates hash collisions
    // (colliding singletons fall below minCount there and are never marked).
    val hashed = toks.selectExpr(idCol, "__graft_n",
      s"posexplode(graft_shingle_hashes(__graft_toks, $n)) AS (pos, __graft_h)")
    val suspectH = hashed.groupBy("__graft_h")
      .agg(count(lit(1)).as("__graft_hc"))
      .filter(col("__graft_hc") >= minCount)
      .select("__graft_h")
    val suspectGrams = hashed.join(suspectH, Seq("__graft_h"), "left_semi")
      .join(toks.select(col(idCol), col("__graft_toks")), Seq(idCol))
      .select(col(idCol), col("__graft_n"), col("pos"),
        concat_ws(" ",
          slice(col("__graft_toks"), col("pos") + 1, lit(n))).as("__graft_gram"))
    val dups = suspectGrams.groupBy("__graft_gram")
      .agg(count(lit(1)).as("__graft_c"))
      .filter(col("__graft_c") >= minCount)
      .select("__graft_gram")
    val covered = suspectGrams.join(dups, Seq("__graft_gram"), "left_semi")
      .select(col(idCol), explode(expr(
        s"sequence(pos, least(pos + ${n - 1}, __graft_n - 1))")).as("__graft_p"))
      .distinct()
    val kept = toks
      .select(col(idCol), col("__graft_n"),
        posexplode(col("__graft_toks")).as(Seq("__graft_p", "__graft_w")))
      .join(covered, Seq(idCol, "__graft_p"), "left_anti")
    finishAndRelease(
      kept.groupBy(idCol)
        .agg(first(col("__graft_n")).cast("long").as("n_tok"),
          count(lit(1)).as("n_kept"),
          array_join(array_sort(collect_list(struct(col("__graft_p"),
            col("__graft_w")))).getField("__graft_w"), " ").as("clean_text")),
      toks)
  }

  /** Benchmark decontamination: flag training documents that share word
    * n-grams with a held-out evaluation set (the GPT-3/PaLM-style n-gram
    * overlap check — a training doc containing eval n-grams leaks the
    * benchmark into the training corpus).
    *
    * Returns (idCol, n_grams, n_matched) for every training doc with at
    * least `minMatches` distinct n-grams that appear anywhere in `bench` —
    * callers anti-join this against the corpus to drop contaminated docs.
    *
    * Scale design: the benchmark gram set is tiny relative to a 100 TB
    * corpus (eval suites are fixed, ~10⁶ grams), so it is deduplicated and
    * BROADCAST — the corpus-side explode+join is map-side with no corpus
    * shuffle, and the per-doc counts come from one partial+final aggregate
    * keyed by doc id. Grams are matched as strings (not hashes) so the
    * check is byte-exact and reproducible in any engine.
    */
  def decontaminate(
      train: DataFrame,
      bench: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 5,
      minMatches: Int = 1,
      maxBroadcastGrams: Long = 10000000L): DataFrame = {
    require(n > 0 && minMatches > 0, s"need n > 0 and minMatches > 0, got n=$n minMatches=$minMatches")
    val benchGrams = bench
      .select(explode(array_distinct(TextFns.wordShingles(col(textCol), n))).as("gram"))
      .distinct()
      .withColumn("hit", lit(1))
    val trainGrams = train.select(col(idCol),
      explode(array_distinct(TextFns.wordShingles(col(textCol), n))).as("gram"))
    // Enforce the "eval suites stay tiny" assumption instead of trusting it:
    // the gram count is measured (one job over the BENCH side only — the
    // corpus is untouched) and an oversized set falls back to a planner-
    // chosen shuffle join rather than forcing a driver-OOM-sized broadcast.
    val nBenchGrams = benchGrams.count()
    val benchSide =
      if (nBenchGrams <= maxBroadcastGrams) broadcast(benchGrams)
      else {
        org.slf4j.LoggerFactory.getLogger("graft.llm.Dedup").warn(
          s"decontaminate: bench gram set has $nBenchGrams distinct grams " +
            s"(> $maxBroadcastGrams); using a shuffle join instead of broadcast")
        benchGrams
      }
    trainGrams
      .join(benchSide, Seq("gram"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("hit"), lit(0))).as("n_matched"))
      .filter(col("n_matched") >= minMatches)
  }

  /** Pre-built LSH index of a STATIC corpus for incremental near-dup
    * screening: the banded bucket keys plus the hashed shingle sets, both
    * persisted. Build once, screen every ingest batch against it (see
    * [[screenAgainstCorpus]]); call [[CorpusIndex.release]] when retiring
    * the index. At cluster scale the two frames are ordinary cached
    * DataFrames — bucket keys are 3 longs per (doc, band), shingle sets ~1
    * long per token, both partitioned by their join keys on first use.
    */
  final case class CorpusIndex(
      banded: DataFrame, // (id, band_idx, band_hash)
      sets: DataFrame, // (id, sh: sorted array<long>)
      bands: Int,
      rowsPerBand: Int,
      shingleSize: Int) {
    def release(): Unit = {
      banded.unpersist(blocking = false)
      sets.unpersist(blocking = false)
    }
  }

  def buildCorpusIndex(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      bands: Int = 8,
      rowsPerBand: Int = 4,
      shingleSize: Int = 3,
      maxBucket: Int = 1000): CorpusIndex = {
    val sh = shingleSets(corpus, idCol, textCol, shingleSize)
    // Same skew guard as the self-join path (candidatesFromSignatures): a
    // degenerate corpus bucket (boilerplate / near-empty docs sharing a band
    // hash) would otherwise multiply EVERY ingest batch that touches it.
    // Capped at index-build time, once, rather than per screened batch.
    val banded = capBuckets(bandedKeys(
      sh.select(col("id"), signatureOfShingles(col("sh"), bands * rowsPerBand).as("sig")),
      bands, rowsPerBand), maxBucket).persist()
    CorpusIndex(banded, sh, bands, rowsPerBand, shingleSize)
  }

  /** Screen a batch of NEW documents against an indexed static corpus:
    * returns (new_id, corpus_id, jaccard) for every pair at or above
    * `threshold`. This is the incremental-ingest path — from Structured
    * Streaming, call it inside `foreachBatch` (the corpus is static, so
    * per-micro-batch batch semantics are exact and no cross-batch state is
    * needed; StreamingSpec asserts stream == batch). Per-batch cost is
    * O(batch) row-local signatures plus an equi-join against the bucket
    * index on (band_idx, band_hash) — the corpus is never re-scanned.
    * Recall follows the banding S-curve (see [[nearDuplicates]]); precision
    * is exact (candidates are verified on the shingle sets).
    */
  def screenAgainstCorpus(
      newDocs: DataFrame,
      idCol: String,
      textCol: String,
      index: CorpusIndex,
      threshold: Double = 0.7): DataFrame = {
    val shNew = shingleSets(newDocs, idCol, textCol, index.shingleSize)
    val bandedNew = bandedKeys(
      shNew.select(col("id"),
        signatureOfShingles(col("sh"), index.bands * index.rowsPerBand).as("sig")),
      index.bands, index.rowsPerBand)
    val candIds = bandedNew.toDF("new_id", "band_idx", "band_hash")
      .join(index.banded.toDF("corpus_id", "band_idx", "band_hash"),
        Seq("band_idx", "band_hash"))
      .select("new_id", "corpus_id")
      .distinct()
    val verified = candIds
      .join(shNew.withColumnsRenamed(Map("id" -> "new_id", "sh" -> "sh_n")), "new_id")
      .join(index.sets.withColumnsRenamed(Map("id" -> "corpus_id", "sh" -> "sh_c")), "corpus_id")
      .select(col("new_id"), col("corpus_id"),
        graft.functions.Registry.jaccardSorted(col("sh_n"), col("sh_c")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
    finishAndRelease(verified, shNew)
  }

  /** Drop buckets larger than `maxBucket` (skew guard). Implemented as a
    * window count on the bucket key: the window's hash-partitioning and sort
    * on (band_idx, band_hash) are exactly what the downstream bucket join
    * needs — Catalyst reuses the exchange, so the cap costs one shuffle
    * total for cap+join. (The partial-agg + broadcast-anti-join alternative
    * measured SLOWER — extra pass and stage; see round-3 notes.)
    */
  private def capBuckets(banded: DataFrame, maxBucket: Int): DataFrame =
    banded
      .withColumn("bucket_n", count(lit(1))
        .over(org.apache.spark.sql.expressions.Window.partitionBy("band_idx", "band_hash")))
      .filter(col("bucket_n") <= maxBucket)
      .drop("bucket_n")

  /** (id, band_idx, band_hash) bucket keys of a (id, sig) frame. */
  private def bandedKeys(sig: DataFrame, bands: Int, rowsPerBand: Int): DataFrame =
    sig.select(
      col("id"),
      posexplode(transform(
        sequence(lit(0), lit(bands - 1)),
        b => xxhash64(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)), b))))
      .toDF("id", "band_idx", "band_hash")

  /** Connected components over an undirected edge list, via the alternating
    * large-star / small-star algorithm (Kiveris et al., "Connected Components
    * in MapReduce and Beyond", SoCC'14). Each round is two aggregate+join
    * passes keyed on a node id — pure shuffle-on-key operations that converge
    * in O(log n) rounds to per-component stars rooted at the component
    * minimum, so the algorithm scales to edge lists that never fit on one
    * machine (unlike label propagation, whose round count is the graph
    * diameter — unbounded for duplicate chains).
    *
    * `pairs`'s first two columns are the edge endpoints (any orderable id
    * type). Returns ("id", "cluster_id") for every node that appears in an
    * edge, with cluster_id = the minimum node id of its component. Each
    * iteration localCheckpoints the shrinking edge set (iterative lineage
    * would otherwise grow unboundedly); intermediates are released by the
    * ContextCleaner as references drop.
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 50): DataFrame = {
    val cols = pairs.columns
    require(cols.length >= 2, "pairs needs at least two columns (edge endpoints)")
    // lazy checkpoint + checksum: the checksum aggregate is the action that
    // materializes each checkpoint, so every round costs ONE job, not two
    var edges = pairs
      .select(col(cols(0)).as("u"), col(cols(1)).as("v"))
      .filter(col("u").isNotNull && col("v").isNotNull && col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v"))
      .distinct()
      .localCheckpoint(eager = false)
    var prev = edgeChecksum(edges)
    var it = 0
    var converged = prev._1 == 0L // no edges → nothing to iterate
    while (!converged && it < maxIter) {
      val next = smallStar(largeStar(edges)).localCheckpoint(eager = false)
      val ck = edgeChecksum(next)
      converged = ck == prev
      prev = ck
      edges = next
      it += 1
    }
    // at the fixpoint the edges form one star per component: (min, member)
    edges.select(col("v").as("id"), col("u").as("cluster_id"))
      .union(edges.select(col("u").as("id"), col("u").as("cluster_id")))
      .groupBy("id").agg(min(col("cluster_id")).as("cluster_id"))
  }

  /** Large-star: every node connects its strictly-larger neighbors to the
    * minimum of its closed neighborhood. Input/output edges are canonical
    * (u < v); output (m, v) is canonical because m ≤ u < v.
    */
  private def largeStar(e: DataFrame): DataFrame = {
    val nbrs = e.union(e.select(col("v").as("u"), col("u").as("v")))
    val mins = nbrs.groupBy("u").agg(min(col("v")).as("mn"))
      .select(col("u"), least(col("mn"), col("u")).as("m"))
    nbrs.join(mins, "u")
      .filter(col("v") > col("u"))
      .select(col("m").as("u"), col("v"))
      .distinct()
  }

  /** Small-star: every node connects its strictly-smaller neighbors (and
    * itself) to the minimum of that set. Grouping key is the canonical
    * larger endpoint, so no direction-doubling is needed.
    */
  private def smallStar(e: DataFrame): DataFrame = {
    val mins = e.groupBy("v").agg(min(col("u")).as("m"))
    val rewired = e.join(mins, "v")
      .select(col("m").as("u"), col("u").as("v"))
      .filter(col("u") =!= col("v"))
    rewired.union(mins.select(col("m").as("u"), col("v"))).distinct()
  }

  /** (row count, order-independent hash sum) — convergence test for the star
    * iteration. Sum wraps on overflow (ANSI off), which is fine for a
    * fixpoint check: iteration is monotone, so a stable checksum over two
    * consecutive rounds means a stable edge set (collision odds ~2⁻⁶⁴).
    */
  private def edgeChecksum(e: DataFrame): (Long, Long) = {
    val r = e.agg(count(lit(1)), sum(xxhash64(col("u"), col("v")))).head()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  /** Cluster assignment for a whole corpus: LSH near-dup pairs → connected
    * components → every document labeled with its cluster representative
    * (the minimum doc id of its duplicate group; singletons label
    * themselves). This is the canonical final stage of a corpus-dedup
    * pipeline — unlike the pairwise `dropNearDuplicates` policy it collapses
    * transitive chains a~b~c into ONE cluster even when a~c itself is below
    * threshold. The component computation touches only documents that appear
    * in a near-dup pair (a small fraction of the corpus), and the final
    * assignment is one left join of the corpus against that small label set.
    */
  def nearDupClusters(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.7,
      bands: Int = 8,
      rowsPerBand: Int = 4,
      shingleSize: Int = 3): DataFrame = {
    val pairs = nearDuplicates(df, idCol, textCol, threshold, bands, rowsPerBand, shingleSize)
    val cc = connectedComponents(pairs.select("id_a", "id_b"))
      .withColumnRenamed("id", idCol)
    df.select(col(idCol))
      .join(cc, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("cluster_id"), col(idCol)).as("cluster_id"))
  }

  /** EXACT Jaccard set-similarity self-join via prefix filtering (the
    * AllPairs/PPJoin family): unlike the MinHash-LSH path (probabilistic
    * recall), this finds EVERY pair with word-token Jaccard ≥ `threshold` —
    * zero false negatives — while never forming the all-pairs product.
    *
    * Under a single global token order, any pair with J ≥ τ must share a
    * token inside each side's first `L − ⌈τ·L⌉ + 1` tokens (L = set size):
    * if a set's whole intersection sat in its last `⌈τ·L⌉ − 1 < τ·L ≤ |A∩B|`
    * positions, the intersection wouldn't fit. Candidates therefore come
    * from an equi join on PREFIX tokens only, pruned by the length-ratio
    * bound `τ·|a| ≤ |b| ≤ |a|/τ`, then verified with the native merge-pass
    * `jaccardSorted`. The order is rarest-first, so prefixes land on rare
    * tokens and candidate fan-out tracks true similarity, not stopword
    * frequency.
    *
    * Scale notes: the global rank is a VOCABULARY-sized sort (a dictionary
    * build — orders of magnitude smaller than the corpus; at 100 TB,
    * range-partition the sort or bucket document frequencies). Everything
    * else shuffles only (prefix-token, id) pairs and candidate ids.
    */
  def similarityJoinExact(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(threshold > 0 && threshold <= 1, s"threshold in (0,1]: $threshold")
    val toks = df.select(col(idCol).as("id"),
        explode(array_distinct(TextFns.tokens(col(textCol)))).as("tok"))
      .filter(col("tok") =!= "")
    val ranked = toks.groupBy("tok").agg(count(lit(1)).as("tdf"))
      .withColumn("rk",
        row_number().over(Window.orderBy(col("tdf"), col("tok"))).cast("long"))
      .select("tok", "rk")
    val docArr = toks.join(ranked, "tok")
      .groupBy("id").agg(sort_array(collect_list(col("rk"))).as("ranks"))
      .withColumn("sz", size(col("ranks")))
      .withColumn("plen",
        (col("sz") - ceil(col("sz") * lit(threshold)) + 1).cast("int"))
    val pref = docArr.select(col("id"), col("ranks"), col("sz"),
      explode(slice(col("ranks"), lit(1), col("plen"))).as("ptok"))
    val a = pref.toDF("id_a", "ra", "sa", "ptok")
    val b = pref.toDF("id_b", "rb", "sb", "ptok")
    a.join(b, Seq("ptok"))
      .filter(col("id_a") < col("id_b") &&
        col("sb") >= col("sa") * threshold && col("sa") >= col("sb") * threshold)
      .select("id_a", "id_b", "ra", "rb").distinct()
      .withColumn("jaccard",
        graft.functions.Registry.jaccardSorted(col("ra"), col("rb")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Brute-force all-pairs Jaccard (testing oracle; O(n²) — small inputs only). */
  def bruteForcePairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      shingleSize: Int = 3): DataFrame = {
    val sh = shingleSets(df, idCol, textCol, shingleSize)
    val pairs = sh.select(col("id").as("id_a"))
      .crossJoin(sh.select(col("id").as("id_b")))
      .filter(col("id_a") < col("id_b"))
    finishAndRelease(jaccardOfPairs(pairs, sh).filter(col("jaccard") >= threshold), sh)
  }

  /** 64-bit SimHash over whitespace tokens: bit i of the signature is set iff
    * the majority of token hashes have bit i set (per-bit ±1 vote). One
    * native pass over the token array (functions.SimHash64Expr); token hashes
    * are bit-compatible with Spark's `xxhash64` (seed 42).
    * Hamming-close simhashes ⇒ near-duplicate texts.
    */
  def simhash64(text: Column): Column =
    graft.functions.Registry.simhash64(TextFns.tokens(text))

  /** Hamming distance between two 64-bit simhashes. */
  def hamming(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs via pigeonhole chunk blocking (Manku, Jain &
    * Sarma, WWW'07 §3): the 64-bit signature is split into `maxDist + 1`
    * near-equal chunks — two signatures within hamming distance `maxDist`
    * differ in at most `maxDist` chunks, so AT LEAST ONE chunk matches
    * exactly. Ids sharing any (chunk_idx, chunk) bucket are joined and the
    * full hamming distance verified, giving exact recall for any `maxDist`
    * (maxDist=3 reproduces the classic 4×16-bit blocking).
    *
    * Buckets larger than `maxBucket` are dropped — same skew guard as the
    * MinHash path: degenerate simhashes (empty/boilerplate docs) share
    * chunks and would otherwise go O(n²). Recall is exact only while no
    * true pair's every matching chunk sits in an over-cap bucket.
    *
    * Scale note: chunk width is 64/(maxDist+1) bits, so blocking selectivity
    * decays as maxDist grows (maxDist=10 → ~6-bit chunks → ~n/57 ids per
    * bucket on uniform signatures). For loose thresholds over very large
    * corpora prefer `nearDuplicates` (MinHash-LSH keeps selectivity by
    * adding hashes instead of shrinking chunks).
    */
  def simhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxDist: Int = 3,
      maxBucket: Int = 1000): DataFrame =
    simhashPairsFromSigs(
      df.select(col(idCol).as("id"), simhash64(col(textCol)).as("sig")),
      bits = 64, maxDist = maxDist, maxBucket = maxBucket)

  /** [[simhashPairs]] with the CROSS-ENGINE 31-bit signature
    * (functions.PortableSimHashExpr) — same pigeonhole blocking, but every
    * step is reproducible in plain integer SQL, so the pair set is
    * DuckDB-oracle-checkable (q109). 64-bit xxhash simhash stays the
    * production form.
    */
  def simhashPairsPortable(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxDist: Int = 3,
      maxBucket: Int = 1000): DataFrame =
    simhashPairsFromSigs(
      df.select(col(idCol).as("id"),
        graft.functions.Registry.simhashPortable(
          TextFns.portableTokens(col(textCol))).as("sig")),
      bits = 31, maxDist = maxDist, maxBucket = maxBucket)

  /** Pigeonhole-blocked hamming pairs over a precomputed (id, sig) frame:
    * the signature's `bits` are split into maxDist+1 chunks, so any pair at
    * distance ≤ maxDist agrees on ≥ 1 whole chunk (exact, not probabilistic)
    * and the candidate join is an equi-join on (chunk_idx, chunk value).
    * Public so gate faces can run the blocking over an independently-dumped
    * signature frame (q45's oracle brute-forces the same closure in DuckDB).
    */
  def simhashPairsFromSigs(
      withSig: DataFrame,
      bits: Int,
      maxDist: Int,
      maxBucket: Int): DataFrame = {
    require(maxDist >= 0 && maxDist < bits, s"maxDist must be in [0, $bits): $maxDist")
    val numChunks = maxDist + 1
    // distribute the bits as evenly as possible: the first (bits % numChunks)
    // chunks get one extra bit
    val widths = Array.tabulate(numChunks)(i =>
      bits / numChunks + (if (i < bits % numChunks) 1 else 0))
    val offsets = widths.scanLeft(0)(_ + _)
    val chunkCols = (0 until numChunks).map { i =>
      val mask = if (widths(i) == 64) -1L else (1L << widths(i)) - 1L
      shiftrightunsigned(col("sig"), offsets(i)).bitwiseAND(lit(mask))
    }
    val chunked = withSig.select(
      col("id"), col("sig"), posexplode(array(chunkCols: _*)))
      .toDF("id", "sig", "chunk_idx", "chunk")
    // window-count skew cap: the window's partitioning+sort on
    // (chunk_idx, chunk) is reused by the self-join's SMJ — one shuffle
    // total (see the MinHash cap above for the measured comparison)
    val capped = chunked
      .withColumn("bucket_n", count(lit(1))
        .over(org.apache.spark.sql.expressions.Window.partitionBy("chunk_idx", "chunk")))
      .filter(col("bucket_n") <= maxBucket)
      .drop("bucket_n")
    val a = capped.as("a")
    val b = capped.as("b")
    a.join(b,
        col("a.chunk_idx") === col("b.chunk_idx") &&
          col("a.chunk") === col("b.chunk") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        hamming(col("a.sig"), col("b.sig")).as("dist"))
      .filter(col("dist") <= maxDist)
      .distinct()
  }
}
