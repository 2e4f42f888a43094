package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis functions for large-scale training-data pipelines: token
  * counting, quality scoring, language ID, document fingerprinting.
  *
  * Everything here is built from codegen'd Spark built-ins (split/transform/
  * aggregate/xxhash64) — no UDFs — so the operators stay inside whole-stage
  * codegen and scale linearly with no shuffle (they are row-local).
  */
object TextFns {

  /** Lower-cased whitespace tokens. */
  def tokens(text: Column): Column =
    split(trim(lower(text)), "\\s+")

  /** [[tokens]] with empty tokens removed — the tokenization the PORTABLE
    * (cross-engine) hash functions use. Spark's split on an empty/whitespace-
    * only string yields [""], and the mod-prime folds would hash that empty
    * token to the seed; the DuckDB oracle's string_split(t, '') / unicode(c)
    * mirror cannot reproduce a codepoint fold over "" (unicode('') is not a
    * codepoint). Dropping empty tokens on BOTH sides keeps the cross-engine
    * contract total — defined for every input, including empty documents.
    */
  def portableTokens(text: Column): Column =
    filter(tokens(text), t => t =!= lit(""))

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    size(tokens(text))

  /** BPE-ish subword count estimate: regex-pretokenizer pieces — letter runs,
    * digit runs, single punctuation — whitespace dropped.
    */
  def subwordCount(text: Column): Column =
    size(filter(
      split(text,
        "(?=[^A-Za-z0-9])|(?<=[^A-Za-z0-9])|(?<=[A-Za-z])(?=[0-9])|(?<=[0-9])(?=[A-Za-z])"),
      t => length(trim(t)) > 0))

  /** PII redaction for training-data curation: replace emails, phone-like
    * number runs, and IPv4 addresses with typed placeholder tokens. Pure
    * regexp_replace chain — row-local, codegen'd, linear scan per doc; the
    * patterns are RE2-compatible (no lookahead/backreferences) so the same
    * redaction is reproducible in any RE2-based engine. Order matters: IPs
    * are redacted before phones so dotted quads never half-match the
    * phone pattern.
    */
  def redactPii(text: Column): Column = {
    val email = regexp_replace(text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]")
    val ip = regexp_replace(email,
      "\\b(\\d{1,3}\\.){3}\\d{1,3}\\b", "[IP]")
    regexp_replace(ip,
      "\\+?\\d[\\d() -]{7,}\\d", "[PHONE]")
  }

  /** Canonical text normalization for dedup / matching: strip punctuation,
    * collapse runs of whitespace to one space, trim, lower-case. Running
    * exact or near dedup over `normalize(text)` instead of raw text makes
    * trivially-reformatted copies (case, spacing, punctuation) collapse to
    * byte-identical keys — row-local and codegen'd like everything here.
    */
  def normalize(text: Column): Column =
    lower(trim(regexp_replace(regexp_replace(text, "\\p{Punct}", ""), "\\s+", " ")))

  /** Word n-gram shingles (space-joined), e.g. n=3 for near-dup detection.
    * Native one-pass WordShinglesExpr; semantically identical to the
    * composable when(size<n, [whole-doc]) / transform(sequence, slice+
    * concat_ws) form, which pays an interpreted lambda per window on
    * gram-explode pipelines (PlanSpec asserts the equivalence).
    */
  def wordShingles(text: Column, n: Int): Column =
    graft.functions.Registry.wordShingles(tokens(text), n)

  /** Character n-gram shingles. */
  def charShingles(text: Column, n: Int): Column =
    transform(
      sequence(lit(0), greatest(length(text) - lit(n), lit(0))),
      i => text.substr(i + lit(1), lit(n)))

  /** Punctuation character count. */
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))

  /** Ratio helpers for quality scoring. */
  def upperRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[A-Z]", ""))).cast("double") /
      greatest(length(text), lit(1))

  def digitRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[0-9]", ""))).cast("double") /
      greatest(length(text), lit(1))

  /** Stopword hit count (duplicates counted) against a literal stopword set. */
  def stopwordCount(text: Column, stopwords: Seq[String]): Column =
    graft.functions.Registry.stopwordHits(tokens(text), Seq(stopwords)).getItem(0)

  val EnglishStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that", "for",
    "on", "with", "as", "was", "at", "by", "be", "this")

  /** Composite quality score in [0,1]: mean-word-length sanity, punctuation
    * density, stopword density. A simple, deterministic heuristic — the point
    * is the columnar shape, not linguistic accuracy.
    */
  def qualityScore(text: Column): Column = {
    val nTok = greatest(tokenCount(text), lit(1)).cast("double")
    val meanWordLen = length(regexp_replace(text, "\\s+", "")).cast("double") / nTok
    val wordLenScore = when(meanWordLen.between(3.0, 10.0), lit(1.0)).otherwise(lit(0.0))
    val punctRatio = punctCount(text).cast("double") / greatest(length(text), lit(1))
    val punctScore = when(punctRatio <= 0.2, lit(1.0)).otherwise(lit(0.0))
    val stopRatio = stopwordCount(text, EnglishStopwords).cast("double") / nTok
    val stopScore = least(stopRatio * lit(5.0), lit(1.0))
    round((wordLenScore + punctScore + stopScore) / lit(3.0), 4)
  }

  /** Per-language stopword lists for the n-gram/stopword language-ID heuristic. */
  val LangStopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "was", "for"),
    "fr" -> Seq("le", "la", "les", "de", "des", "et", "un", "une", "est", "que"),
    "es" -> Seq("el", "la", "los", "las", "de", "y", "un", "una", "es", "que"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "eine", "von", "zu", "mit"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "他", "这", "中", "大"))

  /** Heuristic language ID: argmax of per-language stopword hit counts; ties
    * and all-zero scores fall back to "und". All per-language counts come from
    * ONE native pass over the token array (token → bitmask-of-languages hash
    * lookup, functions.StopwordHitsExpr) — the k× `filter(toks, isin)` form
    * walks the array per language with interpreted lambdas.
    */
  def langId(text: Column): Column = {
    val langs = LangStopwords.toSeq.sortBy(_._1)
    val counts = graft.functions.Registry.stopwordHits(tokens(text), langs.map(_._2))
    val scored = langs.zipWithIndex.map { case ((lang, _), i) =>
      struct(counts.getItem(i).as("score"), lit(lang).as("lang"))
    }
    val best = greatest(scored: _*)
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** 64-bit document fingerprint: order-sensitive polynomial rolling hash over
    * per-token xxhash64 values (ANSI off → wrapping int64 math, as intended).
    */
  def fingerprint(text: Column): Column =
    aggregate(
      tokens(text),
      lit(1469598103934665603L),
      (acc, t) => acc * lit(1099511628211L) + xxhash64(t))

  /** Cross-engine document fingerprint (native PortableFingerprintExpr):
    * nested mod-(2^31−1) polynomial folds over codepoints and tokens, with
    * every intermediate < 2^48 — so the identical value is computable in
    * plain int64 SQL in any engine (DuckDB mirror: two `list_reduce` folds).
    * Weaker bits than [[fingerprint]] (31 vs 64) but fully under the
    * cross-engine correctness gate; prefer [[fingerprint]] when only
    * Spark-side reproducibility matters.
    */
  def fingerprintPortable(text: Column): Column =
    graft.functions.Registry.fingerprintPortable(portableTokens(text))

  /** Gopher-style repetition signal: fraction of duplicate segments after
    * splitting on `delimRegex` (lines with "\n", sentences with "\\.\\s+"),
    * trimming each segment and dropping empties. 0.0 for a document with no
    * non-empty segments. Row-local — scales linearly, no shuffle.
    *
    * Ref: Rae et al., "Scaling Language Models" (Gopher), repetition filters
    * (duplicate line / paragraph fraction).
    */
  def dupSegmentFraction(text: Column, delimRegex: String): Column = {
    val segs = filter(transform(split(text, delimRegex), s => trim(s)),
      s => length(s) > 0)
    when(size(segs) <= 0, lit(0.0)).otherwise(
      (size(segs) - size(array_distinct(segs))).cast("double") /
        size(segs).cast("double"))
  }

  /** Duplicate word-n-gram fraction (Gopher's duplicate n-gram filter):
    * 1 - distinct/total over the document's n-gram multiset. Row-local,
    * computed by the native NgramDupFracsExpr — the composable
    * size(array_distinct(wordShingles(...))) form builds every gram string
    * through interpreted lambdas and is ~50× slower at corpus scale. For
    * several n at once, call Registry.dupFracs directly (one pass).
    */
  def dupNgramFraction(text: Column, n: Int): Column =
    graft.functions.Registry.dupFracs(tokens(text), Seq((n, 1))).getItem(0)

  /** Overlapping fixed-width word chunks for context-window packing: starts at
    * 0, strideWords, 2*strideWords, ... covering every token; each chunk is
    * chunkWords tokens (the last may be shorter), space-rejoined. Returns an
    * array — pair with posexplode for one row per chunk. Row-local: a 100 TB
    * corpus chunks with zero shuffle, and the per-doc fan-out keeps partition
    * sizes bounded (docs grow by ~chunk/stride ×).
    */
  def chunks(text: Column, chunkWords: Int, strideWords: Int): Column = {
    require(chunkWords > 0 && strideWords > 0 && strideWords <= chunkWords,
      s"need 0 < strideWords <= chunkWords, got chunk=$chunkWords stride=$strideWords")
    val w = tokens(text)
    // ceil((max(n-chunk,0))/stride) + 1 starts, in pure integer math so the
    // DuckDB oracle (`//`) computes the identical count.
    val nStarts = call_function("div",
      greatest(size(w) - lit(chunkWords), lit(0)) + lit(strideWords - 1),
      lit(strideWords)) + lit(1L)
    transform(sequence(lit(0L), nStarts - lit(1L)),
      k => concat_ws(" ", slice(w, (k * lit(strideWords) + lit(1L)).cast("int"),
        lit(chunkWords))))
  }
}
