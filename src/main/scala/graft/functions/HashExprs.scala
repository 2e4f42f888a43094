package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String

/** Native hashing expressions for the dedup hot paths.
  *
  * The composable forms (`aggregate(zip_with(...))` per bit, or k×
  * `array_min(transform(...))`) evaluate interpreted lambdas per element with
  * boxing — at corpus scale that's the whole cost of signature computation.
  * These expressions make one primitive pass over the token/shingle array,
  * and all of them implement full codegen (`doGenCode`): the per-PAIR
  * expressions (JaccardSorted, MatchFraction) run once per candidate pair
  * inside joins, the per-DOCUMENT ones (SimHash, MinHash, StopwordHits)
  * once per row with reusable mutable-state buffers — everything stays
  * inside whole-stage codegen, with the interpreted `nullSafeEval` kept as
  * the contract (and the fallback under codegen-off configs).
  */
object HashExprs {
  /** xxhash64 of a UTF8String with a seed. */
  @inline private[functions] def hashStr(s: UTF8String, seed: Long): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), seed)

  /** Cross-engine rolling fingerprint over a token array (see
    * [[PortableFingerprintExpr]]). Public and static so generated code can
    * call it directly — the math is two nested mod-prime polynomial folds,
    * all intermediates < 2^48, so plain int64 reproduces it in ANY engine:
    *
    *   tokenHash: h = 7;          h = (h·131 + codepoint) mod (2^31 − 1)
    *   document:  H = 1469598103; H = (H·65599 + tokenHash) mod (2^31 − 1)
    */
  /** The shared per-token fold: h = 7; h = (h·131 + codepoint) mod (2^31−1).
    * Public and static so [[PortableTokenHashExpr]]'s generated code can
    * call it directly.
    */
  @inline def portableTokenHash(s: String): Long = {
    var h = 7L
    var j = 0
    while (j < s.length) {
      val cp = s.codePointAt(j)
      h = (h * 131L + cp) % 2147483647L
      j += Character.charCount(cp)
    }
    h
  }

  def portableFingerprint(arr: ArrayData): Long = {
    var acc = 1469598103L
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        acc = (acc * 65599L + portableTokenHash(arr.getUTF8String(i).toString)) % 2147483647L
      }
      i += 1
    }
    acc
  }

  /** 31-bit cross-engine SimHash (see [[PortableSimHashExpr]]): bit b of the
    * result is set iff the majority of portable token hashes have bit b set.
    */
  def portableSimHash(arr: ArrayData): Long = {
    val counters = new Array[Int](31)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = portableTokenHash(arr.getUTF8String(i).toString)
        var b = 0
        while (b < 31) {
          if (((h >>> b) & 1L) == 1L) counters(b) += 1 else counters(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 31) {
      if (counters(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** 64-bit hash of every word n-gram window of a token array WITHOUT ever
    * materializing the window strings (see [[ShingleHashesExpr]]): one
    * xxhash64 per token, then a wrapping-int64 polynomial fold per window.
    * Window positions mirror [[graft.functions.ShingleExplodeExpr]] exactly
    * (a document shorter than n yields its single whole-document window at
    * pos 0), so a hash-keyed pre-filter stage can re-derive the exact
    * window string for any (doc, pos) it keeps. Engine-internal (no
    * cross-engine mirror needed — callers must verify survivors on exact
    * strings, which also eliminates hash collisions).
    *
    * Inputs must be NULL-FREE (TextFns.portableTokens guarantees this): the
    * exact-string phase re-derives windows via concat_ws, which DROPS nulls,
    * so a null token would break the hash-position ↔ string-window mirror
    * contract (two distinct windows could verify as the same string). A null
    * element therefore throws rather than hashing to a sentinel.
    */
  def shingleHashes(arr: ArrayData, n: Int): GenericArrayData = {
    val numToks = arr.numElements()
    val th = new Array[Long](numToks)
    var i = 0
    while (i < numToks) {
      if (arr.isNullAt(i))
        throw new IllegalArgumentException(
          s"graft_shingle_hashes: null token at position $i — tokenize with " +
            "a null-free tokenizer (e.g. TextFns.portableTokens)")
      th(i) = hashStr(arr.getUTF8String(i), 42L)
      i += 1
    }
    val win = math.min(n, numToks)
    val m = if (numToks < n) 1 else numToks - n + 1
    val out = new Array[Long](m)
    var k = 0
    while (k < m) {
      var h = -3750763034362895579L // xxh64 prime_1 as the fold seed
      var j = 0
      while (j < win) {
        h = h * -7046029254386353131L + th(k + j) // xxh64 prime_2 multiplier
        j += 1
      }
      out(k) = h
      k += 1
    }
    new GenericArrayData(out)
  }
}

/** Order-sensitive document fingerprint that any SQL engine can reproduce
  * exactly — unlike the xxhash64-based [[graft.llm.TextFns.fingerprint]],
  * whose wrapping-int64 polynomial exists only where xxhash64 does. The
  * per-token and per-document folds both reduce mod 2^31 − 1 after every
  * step (intermediates stay < 2^48), so the DuckDB mirror is a pair of
  * `list_reduce` folds over `string_split`/`unicode` — byte-exact parity,
  * which puts the fingerprint under the cross-engine correctness gate
  * instead of a rows-only check.
  */
/** Cross-engine per-token hash (string → int64 in [0, 2^31−1)): the same
  * mod-prime polynomial fold the portable simhash/fingerprint use, exposed
  * as a scalar so feature-hashing / bucketing pipelines can reproduce the
  * bucket assignment in ANY engine (DuckDB mirror: `list_reduce` over
  * `string_split` + `unicode`, as in the q109 oracle). Codegen'd; null in →
  * null out.
  */
case class PortableTokenHashExpr(child: Expression) extends UnaryExpression {

  override def prettyName: String = "graft_token_hash"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_token_hash expects string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(
      HashExprs.portableTokenHash(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.HashExprs.portableTokenHash($s.toString());")

  override protected def withNewChildInternal(newChild: Expression): PortableTokenHashExpr =
    copy(child = newChild)
}

case class PortableFingerprintExpr(child: Expression) extends UnaryExpression {

  override def prettyName: String = "graft_fingerprint_portable"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_fingerprint_portable expects array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(
      HashExprs.portableFingerprint(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.HashExprs.portableFingerprint($arr);")

  override protected def withNewChildInternal(newChild: Expression): PortableFingerprintExpr =
    copy(child = newChild)
}

/** 31-bit SimHash over the CROSS-ENGINE portable token hash — same majority-
  * vote construction as [[SimHash64Expr]], but every ingredient (mod-prime
  * token hash, bit tests, majority) is plain integer SQL, so DuckDB
  * reproduces the signatures (and therefore the hamming-distance pairs)
  * bit-exactly: the simhash near-dup mechanism goes under the cross-engine
  * gate, not just a rows-only check. 31 bits vs 64 trades collision margin;
  * the 64-bit xxhash form remains the production signature.
  */
case class PortableSimHashExpr(child: Expression) extends UnaryExpression {

  override def prettyName: String = "graft_simhash_portable"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_simhash_portable expects array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(HashExprs.portableSimHash(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.HashExprs.portableSimHash($arr);")

  override protected def withNewChildInternal(newChild: Expression): PortableSimHashExpr =
    copy(child = newChild)
}

/** 64-bit SimHash over an array<string> token column: bit i of the result is
  * set iff the majority of token hashes have bit i set (±1 vote per token).
  */
case class SimHash64Expr(child: Expression)
    extends UnaryExpression {

  override def prettyName: String = "graft_simhash64"
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counters = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = HashExprs.hashStr(arr.getUTF8String(i), 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counters(b) += 1 else counters(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counters(b) > 0) sig |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(sig)
  }

  // Full codegen: per-document signature loop stays inside whole-stage
  // codegen. The 64-counter buffer is mutable state reused across rows.
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val counters = ctx.addMutableState("int[]", "graftSimhashCounters",
        v => s"$v = new int[64];")
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val b = ctx.freshName("b"); val b2 = ctx.freshName("b2")
      val h = ctx.freshName("h"); val s = ctx.freshName("s")
      val sig = ctx.freshName("sig")
      s"""
        |java.util.Arrays.fill($counters, 0);
        |final int $n = $arr.numElements();
        |for (int $i = 0; $i < $n; $i++) {
        |  if (!$arr.isNullAt($i)) {
        |    final org.apache.spark.unsafe.types.UTF8String $s = $arr.getUTF8String($i);
        |    final long $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        |      $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);
        |    for (int $b = 0; $b < 64; $b++) {
        |      if ((($h >>> $b) & 1L) == 1L) { $counters[$b]++; } else { $counters[$b]--; }
        |    }
        |  }
        |}
        |long $sig = 0L;
        |for (int $b2 = 0; $b2 < 64; $b2++) {
        |  if ($counters[$b2] > 0) $sig |= (1L << $b2);
        |}
        |${ev.value} = $sig;
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

/** |A ∩ B| / |A ∪ B| of two SORTED array<long> columns (hashed shingle sets)
  * via a single merge pass — no per-pair hash-set allocation, which is what
  * `array_intersect`/`array_union` cost on millions of candidate pairs.
  */
case class JaccardSortedExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def prettyName: String = "graft_jaccard_sorted"
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    val union = na + nb - inter
    if (union == 0) java.lang.Double.valueOf(0.0)
    else java.lang.Double.valueOf(inter.toDouble / union)
  }

  // Full codegen: this runs once per candidate PAIR (the pair-verification
  // hot path), so staying inside whole-stage codegen avoids the per-row
  // interpreted-call overhead of CodegenFallback.
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val inter = ctx.freshName("inter"); val uni = ctx.freshName("uni")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
        |final int $na = $a.numElements();
        |final int $nb = $b.numElements();
        |int $i = 0; int $j = 0; int $inter = 0;
        |while ($i < $na && $j < $nb) {
        |  final long $x = $a.getLong($i);
        |  final long $y = $b.getLong($j);
        |  if ($x == $y) { $inter++; $i++; $j++; }
        |  else if ($x < $y) { $i++; } else { $j++; }
        |}
        |final int $uni = $na + $nb - $inter;
        |${ev.value} = $uni == 0 ? 0.0d : ((double) $inter) / $uni;
      """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): JaccardSortedExpr =
    copy(left = newLeft, right = newRight)
}

/** MinHash signature over a shingle-set column — array<string> or
  * array<long> (pre-hashed shingles): k minimum values of
  * h_j(s) = h1(s) + j·h2(s) (two-base universal hashing — one hash pair per
  * shingle instead of k full hashes). For pre-hashed input, h1 is the value
  * and h2 a finalizer-mixed variant, so shingle strings are hashed exactly
  * once in the whole dedup pipeline.
  */
case class MinHashSignatureExpr(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def prettyName: String = "graft_minhash"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private lazy val elemIsLong: Boolean = child.dataType match {
    case ArrayType(LongType, _) => true
    case ArrayType(StringType, _) => false
    case other => throw new IllegalArgumentException(
      s"graft_minhash expects array<string|bigint>, got $other")
  }

  /** splitmix64 finalizer — decorrelates h2 from h1 for pre-hashed input. */
  @inline private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        var h1 = 0L
        var h2 = 0L
        if (elemIsLong) {
          h1 = arr.getLong(i)
          h2 = mix(h1) | 1L // odd → full-period stride
        } else {
          val s = arr.getUTF8String(i)
          h1 = HashExprs.hashStr(s, 0L)
          h2 = HashExprs.hashStr(s, 1L) | 1L
        }
        var j = 0
        var h = h1
        while (j < numHashes) {
          if (h < mins(j)) mins(j) = h
          h += h2
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  // Full codegen: the k-mins stride loop is the per-document cost of the
  // whole MinHash pipeline. The mins buffer is mutable state reused across
  // rows (copied into the output array); elemIsLong is resolved at codegen
  // time so each branch generates straight-line code.
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val mins = ctx.addMutableState("long[]", "graftMinhashMins",
        v => s"$v = new long[$numHashes];")
      val mixFn = ctx.addNewFunction("graftSplitmix64",
        s"""
          |private long graftSplitmix64(long z) {
          |  z += 0x9E3779B97F4A7C15L;
          |  z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L;
          |  z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL;
          |  return z ^ (z >>> 31);
          |}
        """.stripMargin)
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val h = ctx.freshName("h")
      val h1 = ctx.freshName("h1"); val h2 = ctx.freshName("h2")
      val s = ctx.freshName("s")
      val hashPair =
        if (elemIsLong)
          s"""
            |final long $h1 = $arr.getLong($i);
            |final long $h2 = $mixFn($h1) | 1L;
          """.stripMargin
        else
          s"""
            |final org.apache.spark.unsafe.types.UTF8String $s = $arr.getUTF8String($i);
            |final long $h1 = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
            |  $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 0L);
            |final long $h2 = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
            |  $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 1L) | 1L;
          """.stripMargin
      s"""
        |java.util.Arrays.fill($mins, Long.MAX_VALUE);
        |final int $n = $arr.numElements();
        |for (int $i = 0; $i < $n; $i++) {
        |  if (!$arr.isNullAt($i)) {
        |    $hashPair
        |    long $h = $h1;
        |    for (int $j = 0; $j < $numHashes; $j++) {
        |      if ($h < $mins[$j]) $mins[$j] = $h;
        |      $h += $h2;
        |    }
        |  }
        |}
        |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        |  java.util.Arrays.copyOf($mins, $numHashes));
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSignatureExpr =
    copy(child = newChild)
}

/** Fraction of positions where two equal-length array<long> columns agree —
  * the MinHash estimate of Jaccard similarity between the underlying sets.
  * Used as a cheap candidate pre-filter between LSH banding and exact
  * verification: signatures are tens of longs, shingle sets hundreds.
  */
case class MatchFractionExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def prettyName: String = "graft_match_frac"
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    require(b.numElements() == n, s"graft_match_frac: length mismatch $n vs ${b.numElements()}")
    if (n == 0) return java.lang.Double.valueOf(0.0)
    var m = 0
    var i = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) m += 1
      i += 1
    }
    java.lang.Double.valueOf(m.toDouble / n)
  }

  // Full codegen — runs per candidate pair in the LSH pre-filter (see
  // JaccardSortedExpr for rationale). The length check is kept in codegen.
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      s"""
        |final int $n = $a.numElements();
        |if ($b.numElements() != $n) {
        |  throw new IllegalArgumentException(
        |    "graft_match_frac: length mismatch " + $n + " vs " + $b.numElements());
        |}
        |int $m = 0;
        |for (int $i = 0; $i < $n; $i++) {
        |  if ($a.getLong($i) == $b.getLong($i)) $m++;
        |}
        |${ev.value} = $n == 0 ? 0.0d : ((double) $m) / $n;
      """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): MatchFractionExpr =
    copy(left = newLeft, right = newRight)
}

/** Per-list hit counts (duplicates counted) of an array<string> token column
  * against several literal word lists, in ONE pass: token → bitmask of the
  * lists containing it via a single hash lookup. Replaces k×
  * `filter(toks, t => t.isInCollection(words))` — interpreted lambdas with a
  * linear scan of the word list per token — as the language-ID hot path.
  */
case class StopwordHitsExpr(child: Expression, wordLists: Seq[Seq[String]])
    extends UnaryExpression {

  require(wordLists.nonEmpty && wordLists.size <= 32, "1..32 word lists")

  override def prettyName: String = "graft_stopword_hits"
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)

  @transient private lazy val masks: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer]()
    for ((ws, i) <- wordLists.zipWithIndex; w <- ws)
      m.merge(UTF8String.fromString(w), Integer.valueOf(1 << i), (a, b) =>
        Integer.valueOf(a.intValue | b.intValue))
    m
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val k = wordLists.size
    val counts = new Array[Int](k)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val m = masks.get(arr.getUTF8String(i))
        if (m != null) {
          val mv = m.intValue
          var j = 0
          while (j < k) {
            counts(j) += (mv >>> j) & 1
            j += 1
          }
        }
      }
      i += 1
    }
    new GenericArrayData(counts)
  }

  // Full codegen: the mask map rides along as a reference object; counts
  // buffer is reusable mutable state. Completes codegen coverage of the
  // language-ID hot path.
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val k = wordLists.size
      // raw HashMap + explicit cast: Janino parses but does not IMPLEMENT
      // generics, so a HashMap<UTF8String, Integer>.get() returns Object and
      // the typed assignment below would fail to compile (silent interpreted
      // fallback) if the reference were declared with type arguments
      val masksRef = ctx.addReferenceObj("graftStopwordMasks", masks,
        "java.util.HashMap")
      val counts = ctx.addMutableState("int[]", "graftStopwordCounts",
        v => s"$v = new int[$k];")
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val m = ctx.freshName("m")
      val mv = ctx.freshName("mv")
      s"""
        |java.util.Arrays.fill($counts, 0);
        |final int $n = $arr.numElements();
        |for (int $i = 0; $i < $n; $i++) {
        |  if (!$arr.isNullAt($i)) {
        |    final Integer $m = (Integer) $masksRef.get($arr.getUTF8String($i));
        |    if ($m != null) {
        |      final int $mv = $m.intValue();
        |      for (int $j = 0; $j < $k; $j++) {
        |        $counts[$j] += ($mv >>> $j) & 1;
        |      }
        |    }
        |  }
        |}
        |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        |  java.util.Arrays.copyOf($counts, $k));
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): StopwordHitsExpr =
    copy(child = newChild)
}

/** Reusable per-partition workspace for NgramDupFracsExpr: token-hash buffer
  * plus a stamped open-addressed long set, so the per-row cost is pure
  * primitive arithmetic with zero allocation (buffers grow to the largest
  * document seen and are reused across rows; the stamp makes clearing O(1)).
  * One instance per generated-code object / per interpreted expression —
  * never shared across threads.
  */
final class NgramDupComputer(ns: Array[Int], strides: Array[Int]) {
  private[this] var tokHashes = new Array[Long](128)
  private[this] var keys = new Array[Long](256) // power-of-two
  private[this] var stamps = new Array[Int](256)
  private[this] var stamp = 0

  private def ensureSet(minSlots: Int): Unit = {
    var cap = keys.length
    while (cap < minSlots) cap <<= 1
    if (cap != keys.length) {
      keys = new Array[Long](cap)
      stamps = new Array[Int](cap)
      stamp = 0
    }
  }

  /** Duplicate-window fraction per (n, stride) spec over an array<string>
    * token column. Windows start at 0, stride, 2*stride, ... and span
    * min(n, remaining) tokens — for stride 1 this is exactly the wordShingles
    * n-gram list (a doc shorter than n yields its single whole-doc gram), for
    * stride == n non-overlapping blocks with a short final block. Two windows
    * are duplicates iff their token sequences are equal, tracked via a 64-bit
    * polynomial hash of per-token xxhash64 values (collision odds over a
    * document's ~1e2 windows are ~1e-16 — far below any realistic corpus).
    */
  def compute(arr: ArrayData): ArrayData = {
    val numToks = arr.numElements()
    if (tokHashes.length < numToks) {
      var cap = tokHashes.length
      while (cap < numToks) cap <<= 1
      tokHashes = new Array[Long](cap)
    }
    var i = 0
    while (i < numToks) {
      tokHashes(i) =
        if (arr.isNullAt(i)) 0L
        else HashExprs.hashStr(arr.getUTF8String(i), 0L)
      i += 1
    }
    val fracs = new Array[Double](ns.length)
    var s = 0
    while (s < ns.length) {
      val n = ns(s)
      val stride = strides(s)
      val nStarts = (math.max(numToks - n, 0) + stride - 1) / stride + 1
      ensureSet(nStarts * 2 + 2)
      val mask = keys.length - 1
      if (stamp == Int.MaxValue) { // wrap guard: stale stamps must never match
        java.util.Arrays.fill(stamps, 0)
        stamp = 0
      }
      stamp += 1
      var distinct = 0
      var k = 0
      while (k < nStarts) {
        val start = k * stride
        val end = math.min(start + n, numToks)
        // include the window length so a short final block can never alias a
        // full-width window's hash prefix
        var h = 1469598103934665603L + (end - start)
        var t = start
        while (t < end) {
          h = h * 1099511628211L + tokHashes(t)
          t += 1
        }
        // finalize to spread consecutive hashes across slots
        var z = h + 0x9E3779B97F4A7C15L
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        z ^= (z >>> 31)
        var idx = z.toInt & mask
        while (stamps(idx) == stamp && keys(idx) != h) idx = (idx + 1) & mask
        if (stamps(idx) != stamp) {
          stamps(idx) = stamp
          keys(idx) = h
          distinct += 1
        }
        k += 1
      }
      fracs(s) = (nStarts - distinct).toDouble / nStarts.toDouble
      s += 1
    }
    new GenericArrayData(fracs)
  }
}

/** Duplicate-n-gram / duplicate-block fractions for Gopher-style repetition
  * filters: array<double>, one fraction per (n, stride) spec, all computed in
  * ONE pass over the token array (per-token hashes shared across specs). The
  * composable form — size(array_distinct(transform(sequence(...), slice+
  * concat_ws))) per n — builds every gram string through interpreted lambdas;
  * this expression replaces it with primitive rolling hashes (~50× on the
  * documents corpus).
  */
case class NgramDupFracsExpr(child: Expression, specs: Seq[(Int, Int)])
    extends UnaryExpression {
  require(specs.nonEmpty && specs.forall { case (n, st) => n > 0 && st > 0 },
    s"specs must be non-empty (n, stride) pairs with positive entries: $specs")

  override def prettyName: String = "graft_dup_fracs"
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.DoubleType, containsNull = false)

  // Interpreted fallback: the SAME expression instance can be evaluated by
  // several tasks concurrently (unlike codegen, where each generated object
  // owns its mutable state), so the reusable workspace must be per-thread.
  @transient private lazy val computer =
    ThreadLocal.withInitial[NgramDupComputer](() =>
      new NgramDupComputer(specs.map(_._1).toArray, specs.map(_._2).toArray))

  override def nullSafeEval(input: Any): Any =
    computer.get().compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val nsLit = specs.map(_._1).mkString(", ")
      val stLit = specs.map(_._2).mkString(", ")
      val comp = ctx.addMutableState("graft.functions.NgramDupComputer",
        "graftDupComp",
        v => s"$v = new graft.functions.NgramDupComputer(" +
          s"new int[]{$nsLit}, new int[]{$stLit});")
      s"${ev.value} = $comp.compute($arr);"
    })

  override protected def withNewChildInternal(newChild: Expression): NgramDupFracsExpr =
    copy(child = newChild)
}

/** Static gram-builder shared by WordShinglesExpr's interpreted and generated
  * paths (stateless → thread-safe; the output strings must be materialized
  * anyway, so the only state is the per-call window scratch).
  */
object WordShingles {
  private val Space = UTF8String.fromString(" ")

  def compute(arr: ArrayData, n: Int): ArrayData = {
    val numToks = arr.numElements()
    val toks = new Array[UTF8String](numToks)
    var i = 0
    while (i < numToks) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      i += 1
    }
    if (numToks < n) {
      // short doc → its single whole-doc gram (concat_ws semantics: nulls
      // skipped), exactly like the composable slice+concat_ws form
      new GenericArrayData(Array[Any](UTF8String.concatWs(Space, toks: _*)))
    } else {
      val m = numToks - n + 1
      val out = new Array[Any](m)
      val win = new Array[UTF8String](n)
      var k = 0
      while (k < m) {
        System.arraycopy(toks, k, win, 0, n)
        out(k) = UTF8String.concatWs(Space, win: _*)
        k += 1
      }
      new GenericArrayData(out)
    }
  }
}

/** Word n-gram shingles (space-joined sliding windows, stride 1; a doc
  * shorter than n yields its single whole-doc gram) as ONE native pass. The
  * composable transform(sequence, slice+concat_ws) form evaluates an
  * interpreted lambda per window — on gram-explode pipelines (boilerplate
  * detection, LSH shingling) that interpretation is most of the query cost.
  */
case class WordShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression {
  require(n > 0, s"shingle size must be positive: $n")

  override def prettyName: String = "graft_word_shingles"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.WordShingles.compute($arr, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordShinglesExpr =
    copy(child = newChild)
}

/** 64-bit hashes of every word n-gram window in ONE native pass that never
  * builds a window string (see [[HashExprs.shingleHashes]]): one xxhash64
  * per token + a wrapping polynomial fold per window. At long windows
  * (n ≈ 15-50, the substring-dedup regime) the string forms allocate
  * n × corpus-text bytes just to feed a count aggregate — this emits 8 bytes
  * per window instead, and survivors are re-derived and verified as exact
  * strings downstream (which also removes hash collisions). Positions mirror
  * [[ShingleExplodeExpr]]/[[WordShinglesExpr]]: a doc shorter than n yields
  * one whole-doc window at pos 0.
  */
case class ShingleHashesExpr(child: Expression, n: Int)
    extends UnaryExpression {
  require(n > 0, s"shingle size must be positive: $n")

  override def prettyName: String = "graft_shingle_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_shingle_hashes expects array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    HashExprs.shingleHashes(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.HashExprs.shingleHashes($arr, $n);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashesExpr =
    copy(child = newChild)
}
