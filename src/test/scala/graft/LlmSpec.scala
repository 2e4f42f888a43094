package graft

import graft.llm.{Dedup, Multimodal, Similarity, TextFns}
import org.apache.spark.sql.functions._

/** LLM-pipeline operators: dedup recall vs exact Jaccard, simhash invariants,
  * similarity-search recall vs brute force, text analysis, multimodal plumbing.
  */
class LlmSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = Engine.table(spark, sfDir, "documents")
  private lazy val emb = Engine.table(spark, sfDir, "embeddings")

  test("token count matches whitespace splitting") {
    val d = Seq("one two  three", " lead trail ", "single").toDF("text")
    assert(rows(d.select(TextFns.tokenCount($"text"))).map(_(0)) == Seq(3, 2, 1))
  }

  test("fingerprint is deterministic and order-sensitive") {
    val d = Seq("a b c", "a b c", "c b a").toDF("text")
    val fps = rows(d.select(TextFns.fingerprint($"text"))).map(_(0))
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
  }

  test("fingerprintPortable matches the hand-computed mod-prime fold") {
    // tokenHash("ab") = ((7*131 + 97)*131 + 98) % p = 133252
    // tokenHash("c")  = (7*131 + 99) % p = 1016
    // fp = ((1469598103*65599 + 133252) % p * 65599 + 1016) % p
    val p = 2147483647L
    val tAb = ((7L * 131 + 'a') * 131 + 'b') % p
    val tC = (7L * 131 + 'c') % p
    val want = (((1469598103L * 65599 + tAb) % p) * 65599 + tC) % p
    val d = Seq("  AB c ", "ab c", "c ab", "").toDF("text")
    val fps = rows(d.select(TextFns.fingerprintPortable($"text"))).map(_(0))
    assert(fps(0) == want, s"got ${fps(0)}, want $want") // trim+lower applied
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2)) // order-sensitive
    assert(fps(3) != fps(0)) // empty text gets its own stable value
  }

  test("portable hashes are total: empty/whitespace docs get the zero-token value") {
    // portableTokens drops the [""] Spark's split yields on empty input, so
    // the cross-engine contract (DuckDB can't fold unicode('')) holds for
    // every document: fingerprint = the outer-fold seed, simhash = 0
    val d = Seq("", "   ", "\t\n").toDF("text")
    val fps = rows(d.select(TextFns.fingerprintPortable($"text"))).map(_(0))
    assert(fps.forall(_ == 1469598103L), s"zero-token fingerprint: $fps")
    val sigs = rows(d.select(graft.functions.Registry.simhashPortable(
      TextFns.portableTokens($"text")))).map(_(0))
    assert(sigs.forall(_ == 0L), s"zero-token simhash: $sigs")
  }

  test("duplicatedSpans finds maximal shared-gram spans; merges overlaps; short docs whole-width") {
    // doc 1 and 2 share the 8-token run "a b c d e f g h" (3-grams at
    // positions 0..5 in doc 1 → one maximal span [0,7]); doc 3 is unique;
    // docs 4 and 5 are identical 2-token docs (< n → whole-doc gram)
    val d = Seq(
      (1L, "a b c d e f g h unique1 unique2"),
      (2L, "pre1 pre2 a b c d e f g h"),
      (3L, "nothing shared here at all today"),
      (4L, "tiny doc"),
      (5L, "tiny doc")
    ).toDF("doc_id", "text")
    val got = rows(Dedup.duplicatedSpans(d, "doc_id", "text", n = 3)
      .orderBy("doc_id", "span_start"))
      .map(r => (r(0), r(1), r(2), r(3), r(4)))
    assert(got == Seq(
      (1L, 0, 7, 8, 6L),   // grams 0..5, span covers tokens 0..7
      (2L, 2, 9, 8, 6L),
      (4L, 0, 1, 2, 1L),   // whole-doc gram of the 2-token copy
      (5L, 0, 1, 2, 1L)))
    // disjoint duplicated regions stay separate spans
    val d2 = Seq(
      (1L, "x y z GAP1 GAP2 GAP3 GAP4 p q r"),
      (2L, "x y z other tokens between them p q r")
    ).toDF("doc_id", "text")
    val got2 = rows(Dedup.duplicatedSpans(d2, "doc_id", "text", n = 3)
      .orderBy("doc_id", "span_start")).map(r => (r(0), r(1), r(2)))
    assert(got2 == Seq((1L, 0, 2), (1L, 7, 9), (2L, 0, 2), (2L, 7, 9)))
    // minDocs=3: the pairwise-only span disappears
    assert(Dedup.duplicatedSpans(d2, "doc_id", "text", n = 3, minDocs = 3).isEmpty)
  }

  test("langId picks the language with most stopword hits") {
    val d = Seq(
      "the cat sat on the mat and it was good",
      "le chat est sur la table et il est un chat",
      "el perro es un animal y la casa es grande",
      "xyzzy qwerty plugh").toDF("text")
    assert(rows(d.select(TextFns.langId($"text"))).map(_(0))
      == Seq("en", "fr", "es", "und"))
  }

  test("decontaminate flags train docs sharing n-grams with the benchmark") {
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val train = Seq(
      (1L, "we saw the quick brown fox yesterday near the barn"), // shares "the quick brown fox"
      (2L, "completely unrelated text about spark shuffles and joins"),
      (3L, "jumps over the lazy dog was written on the wall")) // shares "jumps over the lazy", "over the lazy dog"
      .toDF("doc_id", "text")
    val out = rows(Dedup.decontaminate(train, bench, "doc_id", "text",
      n = 4, minMatches = 1).orderBy("doc_id"))
    assert(out.map(_(0)) == Seq(1L, 3L))
    val byId = out.map(r => r(0) -> r(2)).toMap
    assert(byId(1L) == 1L) // one matched 4-gram
    assert(byId(3L) == 2L) // two matched 4-grams
    // minMatches raises the floor
    assert(rows(Dedup.decontaminate(train, bench, "doc_id", "text",
      n = 4, minMatches = 2)).map(_(0)) == Seq(3L))
    intercept[IllegalArgumentException](
      Dedup.decontaminate(train, bench, "doc_id", "text", n = 0))
    // an oversized bench gram set falls back to a shuffle join (no forced
    // broadcast) with identical results
    val fallback = rows(Dedup.decontaminate(train, bench, "doc_id", "text",
      n = 4, minMatches = 1, maxBroadcastGrams = 1L).orderBy("doc_id"))
    assert(fallback == out)
  }

  test("exact dedup groups identical texts") {
    val d = Seq((1L, "same text"), (2L, "same text"), (3L, "other"))
      .toDF("doc_id", "text")
    assertSameRows(Dedup.exact(d, Seq("text"), "doc_id").select("keep_id", "dup_count"),
      Seq(Seq(1L, 2L), Seq(3L, 1L)))
  }

  test("simhash: identical texts collide, disjoint texts differ") {
    val d = Seq("spark engine columnar data", "spark engine columnar data",
      "totally unrelated words here now").toDF("text")
    val sigs = rows(d.select(Dedup.simhash64($"text"))).map(_(0).asInstanceOf[Long])
    assert(sigs(0) == sigs(1))
    assert(sigs(0) != sigs(2))
  }

  test("simhashPairs: exact recall vs brute-force hamming at maxDist=10 on 5k docs") {
    // 5k synthetic docs with planted near-dups: pigeonhole blocking on
    // maxDist+1 chunks must find EXACTLY the brute-force hamming pairs
    // (recall and precision both exact when no bucket is capped).
    val rnd = new scala.util.Random(42)
    val vocab = Array.tabulate(500)(i => s"w$i")
    def doc(): String = Array.fill(40)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
    val bases = Seq.tabulate(2450)(i => (i.toLong, doc()))
    // planted: copy of a base with one word appended (small hamming delta)
    val dups = bases.take(100).map { case (i, t) => (10000L + i, t + " extra") }
    val corpus = (bases ++ dups ++ Seq.tabulate(2450)(i => (20000L + i, doc())))
      .toDF("doc_id", "text")
    assert(corpus.count() >= 5000)
    val sigs = corpus.select($"doc_id", Dedup.simhash64($"text").as("sig")).persist()
    val truth = sigs.as("a").join(sigs.as("b"), $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("id_a"), $"b.doc_id".as("id_b"),
        Dedup.hamming($"a.sig", $"b.sig").as("dist"))
      .filter($"dist" <= 10)
    val truthPairs = rows(truth.select("id_a", "id_b")).map(_.toList).toSet
    val got = Dedup.simhashPairs(corpus, "doc_id", "text", maxDist = 10,
      maxBucket = Int.MaxValue)
    val gotPairs = rows(got.select("id_a", "id_b")).map(_.toList).toSet
    sigs.unpersist()
    assert(truthPairs.nonEmpty, "test corpus must contain true near-dup pairs")
    assert(gotPairs == truthPairs,
      s"missed: ${(truthPairs -- gotPairs).take(5)}; spurious: ${(gotPairs -- truthPairs).take(5)}")
  }

  test("simhashPairs: maxBucket cap drops degenerate buckets instead of exploding") {
    // 500 identical docs share every chunk: without the cap this is 124,750
    // pairs; with a small cap the degenerate bucket is dropped entirely.
    val degenerate = Seq.tabulate(500)(i => (i.toLong, "same text every time"))
      .toDF("doc_id", "text")
    val capped = Dedup.simhashPairs(degenerate, "doc_id", "text", maxDist = 3,
      maxBucket = 100)
    assert(capped.count() == 0)
  }

  test("minhash-LSH finds planted near-duplicates (recall vs brute force)") {
    val base = "the quick brown fox jumps over the lazy dog and runs far away today"
    val nearDup = base.replace("today", "tonight")
    val planted = Seq((9001L, base), (9002L, nearDup))
      .toDF("doc_id", "text")
    val corpus = docs.select("doc_id", "text").unionAll(planted)
    val exact = Dedup.bruteForcePairs(corpus, "doc_id", "text", threshold = 0.6)
    val lsh = Dedup.nearDuplicates(corpus, "doc_id", "text", threshold = 0.6)
    val exactPairs = rows(exact.select("id_a", "id_b")).toSet
    val lshPairs = rows(lsh.select("id_a", "id_b")).toSet
    assert(exactPairs.contains(Seq(9001L, 9002L)), "planted pair must be a true near-dup")
    // LSH must recover a large fraction of true pairs (probabilistic bound)
    assert(exactPairs.nonEmpty)
    val recall = lshPairs.intersect(exactPairs).size.toDouble / exactPairs.size
    assert(recall >= 0.8, s"LSH recall $recall too low; found ${lshPairs.size} of ${exactPairs.size}")
    // and every reported pair must truly pass the threshold (verified exact)
    assert(lshPairs.subsetOf(exactPairs))
  }

  test("dropNearDuplicates keeps the lowest id of each duplicate group") {
    val base = "the quick brown fox jumps over the lazy dog and runs far away today"
    val corpus = Seq(
      (1L, base), (2L, base), (3L, base.replace("today", "tonight")),
      (9L, "completely different content about spark engines and columnar data"))
      .toDF("doc_id", "text")
    val kept = Dedup.dropNearDuplicates(corpus, "doc_id", "text", threshold = 0.6,
      bands = 16, rowsPerBand = 2)
    val ids = rows(kept.select("doc_id")).map(_.head.asInstanceOf[Long]).toSet
    assert(ids == Set(1L, 9L), s"expected lowest-id survivors, got $ids")
  }

  test("cosine matches hand computation") {
    val d = Seq((Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
      (Array(1.0f, 1.0f), Array(1.0f, 1.0f))).toDF("a", "b")
    val sims = rows(d.select(Similarity.cosine($"a", $"b"))).map(_(0).asInstanceOf[Double])
    assert(math.abs(sims(0)) < 1e-12)
    assert(math.abs(sims(1) - 1.0) < 1e-12)
  }

  test("brute-force top-k is exact and ranked") {
    val tiny = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val out = Similarity.bruteForceTopK(tiny, tiny.filter($"vec_id" === 1), "vec_id", "embedding", 2)
    assert(rows(out.select("neighbor_id", "rank"))
      == Seq(Seq(2L, 1), Seq(3L, 2)))
  }

  test("LSH ANN recall@1 vs brute force on real embeddings") {
    val bf = Similarity.bruteForceTopK(emb, emb, "vec_id", "embedding", 1)
      .select($"query_id", $"neighbor_id".as("true_nn"))
    // the synthetic embeddings are near-random (top-1 cosine ≈ 0.37), the
    // hardest case for sign-LSH — short codes + many tables for recall
    val ann = Similarity.lshTopK(emb, emb, "vec_id", "embedding", 1,
      dim = 64, bits = 4, numTables = 16)
      .select($"query_id", $"neighbor_id".as("ann_nn"))
    val joined = bf.join(ann, "query_id")
    val n = joined.count().toDouble
    val hits = joined.filter($"true_nn" === $"ann_nn").count().toDouble
    assert(n > 400, s"ANN returned too few results: $n")
    val recall = hits / n
    assert(recall >= 0.7, s"ANN recall@1 $recall below 0.7")
  }

  test("multimodal decode stage: schema + deterministic stub features") {
    val media = Multimodal.fromDocuments(docs.limit(20))
    val decoded = Multimodal.decodeStage(media)
    assert(decoded.columns.toSeq ==
      Seq("media_id", "payload", "meta", "width", "height", "channels", "features"))
    val twice = Multimodal.decodeStage(media)
    assert(rows(decoded.select("media_id", "features")).toSet
      == rows(twice.select("media_id", "features")).toSet)
    assert(decoded.count() == 20)
  }

  test("payload stats digest matches sha2 of the text") {
    val d = Seq((7L, "hello")).toDF("doc_id", "text")
      .withColumn("source", lit("s")).withColumn("n_chars", lit(5L))
    val media = Multimodal.fromDocuments(d)
    val digest = Multimodal.payloadStats(media).select("digest").collect()(0).getString(0)
    val expected = d.select(sha2($"text", 256)).collect()(0).getString(0)
    assert(digest == expected)
  }

  test("q280 chunking: full token coverage, stride-24 starts, width <= 32") {
    // n_tok(cid) = min(32, n - 24·cid) for every chunk, and cids are exactly
    // 0..(n-1) div 24 — together these prove the chunks tile the doc with an
    // 8-token overlap and the final partial chunk reaches token n (coverage).
    val nByDoc = docs
      .select(col("doc_id"), size(TextFns.portableTokens(col("text"))).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val chunks = SparkEntry.queries("q280_rag_chunking")(spark, sfDir)
      .select("doc_id", "chunk_id", "n_tok").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(chunks.nonEmpty)
    val byDoc = chunks.groupBy(_._1)
    for ((doc, cs) <- byDoc) {
      val n = nByDoc(doc)
      val cids = cs.map(_._2).sorted
      assert(cids.toSeq == (0L to ((n - 1) / 24).toLong),
        s"doc $doc: chunk ids not contiguous for n=$n")
      for ((_, cid, nTok) <- cs)
        assert(nTok == math.min(32L, n - 24 * cid),
          s"doc $doc chunk $cid: n_tok=$nTok for n=$n")
    }
    // docs with >=1 token all chunked
    assert(byDoc.keySet == nByDoc.filter(_._2 > 0).keySet)
  }

  test("quality score is in [0,1] and penalizes garbage") {
    val d = Seq(
      "the cat sat on the mat and it was a good day for all of us",
      "!!!! ???? #### $$$$ %%%%").toDF("text")
    val scores = rows(d.select(TextFns.qualityScore($"text"))).map(_(0).asInstanceOf[Double])
    assert(scores.forall(s => s >= 0.0 && s <= 1.0))
    assert(scores(0) > scores(1))
  }

  test("subword count and char shingles") {
    import org.apache.spark.sql.functions.col
    val d = Seq(("hello, world42", "abcd")).toDF("a", "b")
    val sw = rows(d.select(TextFns.subwordCount(col("a")))).head.head
    assert(sw == 4, s"hello / , / world / 42 -> got $sw") // whitespace dropped
    val cs = rows(d.select(TextFns.charShingles(col("b"), 2))).head.head
      .asInstanceOf[scala.collection.Seq[String]]
    assert(cs.toSeq == Seq("ab", "bc", "cd"))
  }

  test("cache/CSE: reused subplan is computed from the cached relation") {
    val d = docs.select("doc_id", "n_chars").cache()
    try {
      d.count()
      val joined = d.filter(d("n_chars") > 200).join(d, "doc_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("InMemoryTableScan"), plan)
    } finally d.unpersist()
  }

  test("IVF ANN recall@1 vs brute force") {
    val bf = Similarity.bruteForceTopK(emb, emb, "vec_id", "embedding", 1)
      .select($"query_id", $"neighbor_id".as("true_nn"))
    val ivf = Similarity.ivfTopK(emb, emb, "vec_id", "embedding", 1,
      nlist = 8, nprobe = 4)
      .select($"query_id", $"neighbor_id".as("ivf_nn"))
    val joined = bf.join(ivf, "query_id")
    val n = joined.count().toDouble
    assert(n > 450, s"IVF returned too few results: $n")
    val recall = joined.filter($"true_nn" === $"ivf_nn").count().toDouble / n
    assert(recall >= 0.6, s"IVF recall@1 $recall below 0.6")
  }

  test("embedding near-dup pairs are symmetric-free and thresholded") {
    val pairs = Similarity.cosineNearDupPairs(emb, "vec_id", "embedding", 0.40)
    val got = rows(pairs)
    assert(got.nonEmpty)
    assert(got.forall(r => r(0).asInstanceOf[Long] < r(1).asInstanceOf[Long]))
    assert(got.forall(_(2).asInstanceOf[Double] >= 0.40))
  }

  test("connectedComponents: chains merge, components stay separate, noise ignored") {
    // 1-2-3 is a transitive chain (1~3 not directly linked); (11,10) duplicates
    // (10,11) in reverse; (5,5) is a self-loop that must be dropped
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 10L), (5L, 5L))
      .toDF("id_a", "id_b")
    assertSameRows(Dedup.connectedComponents(pairs),
      Seq(Seq(1L, 1L), Seq(2L, 1L), Seq(3L, 1L), Seq(10L, 10L), Seq(11L, 10L)))
  }

  test("connectedComponents matches driver-side union-find on a random graph") {
    val rnd = new scala.util.Random(42)
    val n = 300
    val edges = Seq.fill(260)((rnd.nextInt(n), rnd.nextInt(n)))
      .filter(e => e._1 != e._2)
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val compMin = nodes.groupBy(find).map { case (r, ms) => (r, ms.min) }
    val expected = nodes.map(id => Seq(id.toLong, compMin(find(id)).toLong))
    assertSameRows(
      Dedup.connectedComponents(edges.map(e => (e._1.toLong, e._2.toLong)).toDF("a", "b")),
      expected)
  }

  test("nearDupClusters labels every doc; singletons label themselves") {
    val d = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "the quick brown fox jumps over the lazy dog again and again today"),
      (7L, "completely different content about distributed query engines at scale"))
      .toDF("doc_id", "text")
    assertSameRows(Dedup.nearDupClusters(d, "doc_id", "text", threshold = 0.8,
      bands = 16, rowsPerBand = 2),
      Seq(Seq(1L, 1L), Seq(2L, 1L), Seq(7L, 7L)))
  }

  test("redactPii replaces emails, phones, and IPs with typed placeholders") {
    val d = Seq(
      "mail a.b-c_1@sub.example.org now",
      "call +1 (415) 555-0132 today",
      "host 192.168.001.42 up",
      "mixed bob@x.io at 10.0.0.1 tel 555-123-4567",
      "no pii here, just 42 and v1.2").toDF("text")
    assert(rows(d.select(TextFns.redactPii($"text"))).map(_(0)) == Seq(
      "mail [EMAIL] now",
      "call [PHONE] today",
      "host [IP] up",
      "mixed [EMAIL] at [IP] tel [PHONE]",
      "no pii here, just 42 and v1.2"))
  }

  test("normalize strips punctuation, collapses whitespace, lowercases") {
    val d = Seq("  Hello,,   World!! ", "hello world", "A.B-C").toDF("text")
    assert(rows(d.select(TextFns.normalize($"text"))).map(_(0))
      == Seq("hello world", "hello world", "abc"))
  }

  test("multimodal resize and frame-sample stages") {
    import org.apache.spark.sql.functions.col
    val media = Multimodal.fromDocuments(docs.limit(10))
    val resized = Multimodal.resizeStage(media, 8, 8)
    assert(resized.columns.toSeq == Seq("media_id", "payload", "meta"))
    val lens = rows(resized.select(col("meta.n_bytes"))).map(_(0).asInstanceOf[Long])
    assert(lens.forall(_ <= 64))
    // frame sampling: 1 row in -> up to maxFrames rows out, deterministic
    val frames = Multimodal.frameSampleStage(media, frameBytes = 32, everyN = 2, maxFrames = 4)
    assert(frames.columns.toSeq == Seq("media_id", "frame_idx", "frame"))
    assert(frames.count() > 10, "frame sampling must expand cardinality")
    val perDoc = frames.groupBy("media_id").count()
    assert(rows(perDoc).forall(_(1).asInstanceOf[Long] <= 4))
    val twice = Multimodal.frameSampleStage(media, frameBytes = 32, everyN = 2, maxFrames = 4)
    assert(frames.count() == twice.count())
  }

  test("repetition stats: dup segment and n-gram fractions") {
    val d = Seq(
      "a b\na b\nc d",          // 3 lines, one dup pair -> 1/3
      "x y\n  \n x y ",         // blank line dropped, trims equal -> 1/2
      "unique line").toDF("text")
    val segs = rows(d.select(TextFns.dupSegmentFraction($"text", "\n")))
      .map(_(0).asInstanceOf[Double])
    assert(segs(0) === 1.0 / 3 && segs(1) === 0.5 && segs(2) === 0.0)

    val g = Seq("a b a b a", "a b c d e", "x").toDF("text")
    val fr = rows(g.select(TextFns.dupNgramFraction($"text", 2)))
      .map(_(0).asInstanceOf[Double])
    // "a b a b a": 2-grams [ab, ba, ab, ba] -> 2 dups of 4 -> 0.5
    assert(fr(0) === 0.5 && fr(1) === 0.0 && fr(2) === 0.0)
  }

  test("chunks cover every token with the configured overlap") {
    val d = Seq.tabulate(25)(i => s"w$i").mkString(" ")
    val out = rows(Seq(d).toDF("text")
      .select(posexplode(TextFns.chunks($"text", 10, 5))))
    // 25 tokens, chunk 10 stride 5 -> starts 0,5,10,15 -> 4 chunks
    assert(out.size == 4)
    val chunks = out.map(_(1).asInstanceOf[String].split(" ").toSeq)
    assert(chunks(0) == Seq.tabulate(10)(i => s"w$i"))
    assert(chunks(3) == (15 until 25).map(i => s"w$i"))
    // consecutive chunks overlap by chunk - stride = 5 tokens
    assert(chunks(0).drop(5) == chunks(1).take(5))
    // short doc -> exactly one chunk, the whole doc
    val one = rows(Seq("a b c").toDF("text")
      .select(posexplode(TextFns.chunks($"text", 10, 5))))
    assert(one.size == 1 && one.head(1) == "a b c")
  }

  test("bm25TopK ranks the doc saturated with rare terms first") {
    val d = Seq(
      (1L, "apple banana apple banana apple"), // common terms only
      (2L, "apple quartz zebra quartz"),       // rare terms, short doc
      (3L, "apple apple apple apple apple apple apple apple"),
      (4L, "banana banana")).toDF("doc_id", "text")
    val top = rows(graft.llm.Retrieval.bm25TopK(
      d, "doc_id", "text", Seq("quartz", "zebra", "apple"), k = 3))
    // doc 2 holds both rare terms -> highest; every returned doc hit >= 1 term
    assert(top.head(0) == 2L)
    assert(top.size == 3)
    val hits = top.map(_(2).asInstanceOf[Long])
    assert(hits.head == 3L && hits.forall(_ >= 1L))
    // absent query terms must not blow up
    val none = graft.llm.Retrieval.bm25TopK(
      d, "doc_id", "text", Seq("nosuchterm"), k = 3)
    assert(none.count() == 0)
  }

  test("corpus index caps degenerate buckets; screening still finds real dups") {
    import spark.implicits._
    // 300 identical boilerplate docs (one giant bucket) + distinct docs
    val boiler = (0L until 300L).map(i => (i, "the same boilerplate text repeated over and over again"))
    val real = (1000L until 1020L).map(i =>
      (i, s"unique document number $i with its own words alpha beta gamma delta epsilon zeta"))
    val corpus = (boiler ++ real).toDF("doc_id", "text")
    val idx = Dedup.buildCorpusIndex(corpus, "doc_id", "text",
      bands = 16, rowsPerBand = 2, maxBucket = 100)
    // the boilerplate bucket (300 > maxBucket) is dropped from the index
    assert(idx.banded.count() < 300L * 16)
    // a new doc near-duplicating a REAL corpus doc still matches...
    val batch = Seq(
      (5000L, "unique document number 1000 with its own words alpha beta gamma delta epsilon zeta extra"),
      (5001L, "the same boilerplate text repeated over and over again")).toDF("doc_id", "text")
    val hits = Dedup.screenAgainstCorpus(batch, "doc_id", "text", idx, threshold = 0.7)
    val matchedNew = rows(hits.select("new_id").distinct()).map(_(0).asInstanceOf[Long]).toSet
    assert(matchedNew.contains(5000L))
    // ...while the boilerplate probe produces NO quadratic bucket join
    // (its bucket was capped away) — documented recall trade-off
    assert(!matchedNew.contains(5001L))
    idx.release()
  }

  test("quantized top-1 agrees with the float top-1 on most queries") {
    val codes = Similarity.quantizeInt8(emb, "vec_id", "embedding")
    val qTop = Similarity.quantizedTop1(codes, codes)
      .select("query_id", "neighbor_id")
    val fTop = Similarity.bruteForceTopK(emb, emb, "vec_id", "embedding", 1)
      .select("query_id", "neighbor_id")
    val n = emb.count().toDouble
    val agree = qTop.join(fTop, Seq("query_id", "neighbor_id")).count()
    // 8-bit quantization perturbs cosines by ~1e-2 at most; ties/near-ties
    // may flip, but the vast majority of top-1 picks must survive
    assert(agree / n > 0.9, s"quantized top-1 agreement too low: $agree of $n")
  }

  test("quantizeInt8 round-trips within half a step and handles zeros") {
    val d = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val q = rows(Similarity.quantizeInt8(d, "vec_id", "embedding")
      .orderBy("vec_id"))
    val scale1 = q(0)(1).asInstanceOf[Double]
    val codes1 = q(0)(2).asInstanceOf[scala.collection.Seq[Int]]
    assert(scale1 === 127.0)
    assert(codes1 == Seq(64, -127, 32, 0))
    // dequantized values within half a quantization step
    val orig = Seq(0.5, -1.0, 0.25, 0.0)
    codes1.zip(orig).foreach { case (c, x) =>
      assert(math.abs(c / scale1 - x) <= 0.5 / scale1 + 1e-12) }
    // all-zero vector: scale 0, all codes 0 (no NaN/overflow)
    assert(q(1)(1).asInstanceOf[Double] === 0.0)
    assert(q(1)(2).asInstanceOf[scala.collection.Seq[Int]].forall(_ == 0))
  }

  test("keepBestPerCluster keeps the top-scored member of each transitive cluster") {
    import spark.implicits._
    // 1~2~3 form one chain (1~3 may be sub-threshold); 10 is a singleton
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val d = Seq(
      (1L, base),
      (2L, base + " lambda"),
      (3L, base + " lambda mu"), // longest -> the survivor
      (10L, "completely different words about another topic entirely here")
    ).toDF("doc_id", "text")
    val kept = rows(Dedup.keepBestPerCluster(
      d, "doc_id", "text", length(col("text")), threshold = 0.5,
      bands = 16, rowsPerBand = 2).select("doc_id").orderBy("doc_id"))
      .map(_(0).asInstanceOf[Long])
    assert(kept == Seq(3L, 10L), s"got $kept")
  }

  test("tfidfTopTerms ranks a document's distinctive repeated term above ubiquitous ones") {
    import spark.implicits._
    val d = Seq(
      (1L, "common quartz quartz"),
      (2L, "common zebra zebra"),
      (3L, "common words only here"),
      (4L, "common words only here too")).toDF("doc_id", "text")
    val top = graft.llm.Retrieval.tfidfTopTerms(d, "doc_id", "text", k = 1)
    val byDoc = rows(top)
      .map(r => r(0).asInstanceOf[Long] -> r(1).asInstanceOf[String]).toMap
    // quartz: tf=2, df=1 -> 2*5/2 = 5.0; common: tf=1, df=4 -> 1*5/5 = 1.0
    assert(byDoc(1L) == "quartz")
    assert(byDoc(2L) == "zebra")
    // k larger than a doc's vocabulary returns the whole vocabulary, ranked
    assert(graft.llm.Retrieval.tfidfTopTerms(d, "doc_id", "text", k = 10)
      .filter(col("id") === 1L).count() == 2)
  }

  test("heavyHitterTerms keeps only terms above the relative threshold") {
    import spark.implicits._
    // 'hot' is 6 of 12 tokens; every other term appears once
    val d = Seq(
      (1L, "hot hot hot a b c"),
      (2L, "hot hot hot d e f")).toDF("doc_id", "text")
    val hh = rows(graft.llm.Retrieval.heavyHitterTerms(d, "text", denom = 4L))
    assert(hh.map(_(0)) == Seq("hot")) // 6*4 > 12; singletons 1*4 < 12
    assert(hh.head(1) == 6L && hh.head(2) == 12L)
    // a denom above total/min-count admits everything
    assert(graft.llm.Retrieval.heavyHitterTerms(d, "text", denom = 13L)
      .count() == 7)
  }

  test("semanticDedup keeps the lowest id per duplicate neighborhood, distinct vectors survive") {
    import spark.implicits._
    import graft.llm.Similarity
    // ids 1/2/3 are near-parallel (cosine ≈ 1), id 4 is orthogonal to them,
    // id 5 is the negation of 4 (cosine -1: never a duplicate)
    val e = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(2.0f, 0.001f)),
      (3L, Array(0.5f, 0.0f)),
      (4L, Array(0.0f, 1.0f)),
      (5L, Array(0.0f, -1.0f))).toDF("vec_id", "embedding")
    // nlist=1 → a single cluster: the pure pairwise-drop semantics
    val kept = Similarity.semanticDedup(e, "vec_id", "embedding",
      threshold = 0.9, nlist = 1, lloydIters = 1)
    assert(rows(kept.select("vec_id")).map(_.head) == Seq(1L, 4L, 5L))
  }

  test("hierarchical assignment matches flat assignment on separated groups; scalable dedup keeps recall") {
    import spark.implicits._
    import graft.llm.Similarity
    // 4 tight groups on distinct axes in dim 4; fine nlist=4, coarse √4=2
    val e = (0 until 40).map { i =>
      val g = i % 4
      val v = Array.fill(4)(0.01f); v(g) = 1.0f + (i / 4) * 0.01f
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
    val cents = Similarity.trainCentroids(e, "vec_id", "embedding",
      nlist = 4, lloydIters = 3)
    val flat = Similarity.assignClusters(e, "vec_id", "embedding", cents)
      .select("vec_id", "cid").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val hier = Similarity.assignClustersHierarchical(e, "vec_id", "embedding", cents)
      .select("vec_id", "cid").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(flat == hier)
    // scalable path (sampled training + hierarchical routing) still drops
    // the in-group near-dups down to one representative per group
    val kept = Similarity.semanticDedup(e, "vec_id", "embedding",
      threshold = 0.99, nlist = 4, lloydIters = 3,
      sampleCap = 30, hierarchical = true)
    assert(kept.count() == 4)
    assert(rows(kept.select("vec_id")).map(_.head).toSet == Set(0L, 1L, 2L, 3L))
  }

  test("semanticDedup with clusters only compares within a cluster") {
    import spark.implicits._
    import graft.llm.Similarity
    // two tight groups on orthogonal axes; k-means with nlist=2 separates
    // them, and each group keeps exactly its lowest id
    val e = Seq(
      (10L, Array(1.0f, 0.0f)), (11L, Array(0.9f, 0.01f)),
      (20L, Array(0.0f, 1.0f)), (21L, Array(0.01f, 0.9f)))
      .toDF("vec_id", "embedding")
    val cents = Similarity.trainCentroids(e, "vec_id", "embedding",
      nlist = 2, lloydIters = 2)
    val assigned = Similarity.assignClusters(e, "vec_id", "embedding", cents)
    // the two groups land in different clusters
    assert(assigned.select("cid").distinct().count() == 2)
    val kept = Similarity.dropSemanticDups(assigned, threshold = 0.95)
    assert(rows(kept.select("vec_id")).map(_.head).toSet == Set(10L, 20L))
  }

  test("similarityJoinExact equals the naive token-Jaccard join (zero false negatives)") {
    import graft.llm.{Dedup, TextFns}
    val d = Engine.table(spark, sfDir, "documents").filter(col("doc_id") < 200)
    val tau = 0.6
    val got = Dedup.similarityJoinExact(d, "doc_id", "text", tau)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // naive: full token-overlap join, no prefix filter
    val toks = d.select(col("doc_id"),
        explode(array_distinct(TextFns.tokens(col("text")))).as("tok"))
      .filter(col("tok") =!= "").persist()
    val sizes = toks.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val naive = toks.toDF("a", "tok").join(toks.toDF("b", "tok"), "tok")
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("i"))
      .join(sizes.toDF("a", "na"), "a").join(sizes.toDF("b", "nb"), "b")
      .filter(col("i").cast("double") / (col("na") + col("nb") - col("i")) >= tau)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    toks.unpersist()
    assert(got == naive,
      s"missed=${(naive -- got).take(5)} extra=${(got -- naive).take(5)}")
    assert(got.nonEmpty)
  }

  test("PQ codes are in range, encoding is deterministic, and ADC self-recall holds") {
    val e = Engine.table(spark, sfDir, "embeddings")
    val books = Similarity.trainPQ(e, "vec_id", "embedding", m = 8, k = 16)
    assert(books.length == 8 && books.forall(_.length == 16) &&
      books.forall(_.forall(_.length == 8)))
    val codes = Similarity.encodePQ(e, "vec_id", "embedding", books).persist()
    val flat = codes.select(explode(col("codes")).as("c"))
    assert(flat.filter(col("c") < 0 || col("c") >= 16).count() == 0)
    // deterministic: a second encode pass is bit-identical
    val again = Similarity.encodePQ(e, "vec_id", "embedding", books)
    assert(codes.exceptAll(again).count() == 0 && again.exceptAll(codes).count() == 0)
    // ADC faithfulness: querying with every vector, its own reconstruction
    // wins top-1 for ≥90% of queries (100% observed at sf0.01)
    val top = Similarity.pqTop1(codes, e, "vec_id", "embedding", books)
    val n = e.count()
    val selfHits = top.filter(col("query_id") === col("neighbor_id")).count()
    assert(selfHits >= (n * 9) / 10, s"self-recall $selfHits/$n below 90%")
    codes.unpersist()
  }

  test("scrubBoilerplate drops ≥minDocs-shared 3-gram spans, rebuilds in order, drops all-boilerplate docs") {
    val d = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "the quick brown cat sleeps"),
      (3L, "the quick brown dog barks"),
      (4L, "totally unique words here"),
      (5L, "the quick brown") // nothing survives → row drops out
    ).toDF("doc_id", "text")
    val got = Dedup.scrubBoilerplate(d, "doc_id", "text", n = 3, minDocs = 3)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // "the quick brown" is in 4 docs (≥3) → positions 0-2 covered there;
    // every other window is unique to its doc
    assert(got.toSeq == Seq(
      (1L, 5L, 2L, "fox jumps"),
      (2L, 5L, 2L, "cat sleeps"),
      (3L, 5L, 2L, "dog barks"),
      (4L, 4L, 4L, "totally unique words here")))
  }

  test("scrubDuplicateSpans removes ALL occurrences of ≥minCount n-gram windows, incl. within-doc repeats") {
    val d = Seq(
      // docs 1 and 2 share a 4-token window; unique tails survive
      (1L, "alpha beta gamma delta fox jumps"),
      (2L, "alpha beta gamma delta cat sleeps"),
      // doc 3 repeats a 4-token window WITHIN itself twice (disjoint) —
      // q284's distinct-doc criterion would never trigger; this must
      (3L, "red red red red mid red red red red tail"),
      (4L, "totally unique words here now yes"),
      // doc 5 = exactly the shared window → fully covered → drops out
      (5L, "alpha beta gamma delta")
    ).toDF("doc_id", "text")
    val got = Dedup.scrubDuplicateSpans(d, "doc_id", "text", n = 4, minCount = 2)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // doc 3: "red red red red" matches at positions 0..5 except pos 4
    // contains "mid"... windows: 0:(r r r r) 1:(r r r m) 2:(r r m r)
    // 3:(r m r r) 4:(m r r r) 5:(r r r r) — window "red red red red"
    // occurs at 0 and 5 (count 2 ≥ 2) → covers 0-3 and 5-8 → "mid tail"
    assert(got.toSeq == Seq(
      (1L, 6L, 2L, "fox jumps"),
      (2L, 6L, 2L, "cat sleeps"),
      (3L, 10L, 2L, "mid tail"),
      (4L, 6L, 6L, "totally unique words here now yes")))
  }

  test("codebook-as-TABLE forms are result-identical to the literal forms and plan a broadcast") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    // centroid assignment: literal vs 1-row-broadcast-table, same cid per vec
    val cents = Similarity.trainCentroids(e, "vec_id", "embedding", nlist = 8)
    val viaLit = Similarity.assignClusters(e, "vec_id", "embedding", cents)
      .select("vec_id", "cid")
    val viaTab = Similarity.assignClustersViaTable(e, "vec_id", "embedding",
      Similarity.centroidsAsTable(spark, cents)).select("vec_id", "cid")
    assert(viaLit.exceptAll(viaTab).count() == 0 &&
      viaTab.exceptAll(viaLit).count() == 0)
    assert(viaTab.queryExecution.executedPlan.toString.contains("Broadcast"),
      "centroid table did not ride as a broadcast")
    // PQ ADC top-1: literal vs table codebook, identical (query, neighbor, score)
    val books = Similarity.trainPQ(e, "vec_id", "embedding", m = 8, k = 16)
    val codes = Similarity.encodePQ(e, "vec_id", "embedding", books).persist()
    val q = e.filter(col("vec_id") < 50)
    val topLit = Similarity.pqTop1(codes, q, "vec_id", "embedding", books)
    val topTab = Similarity.pqTop1ViaTable(codes, q, "vec_id", "embedding",
      Similarity.booksAsTable(spark, books), m = 8, subdim = 8)
    assert(topLit.exceptAll(topTab).count() == 0 &&
      topTab.exceptAll(topLit).count() == 0)
    codes.unpersist()
  }

  test("q296 contrastive triples: negatives provably non-matching, positives label-preserving") {
    val got = SparkEntry.queries("q296_contrastive_pairs")(spark, sfDir).persist()
    val lbl = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "label")
    // anti-join gate: NO (anchor, negative) pair may share a label — the
    // triple set must be empty after joining through the same-label pair set
    val sameLabelPairs = lbl.toDF("anchor_id", "la")
      .join(lbl.toDF("neg_id", "lb"), col("la") === col("lb"))
      .select("anchor_id", "neg_id")
    assert(got.join(sameLabelPairs, Seq("anchor_id", "neg_id"), "left_semi").count() == 0,
      "a hard negative shares its anchor's label")
    // positives are same-label and never the anchor itself
    val posBad = got.join(lbl.toDF("anchor_id", "la"), "anchor_id")
      .join(lbl.toDF("pos_id", "lb"), "pos_id")
      .filter(col("la") =!= col("lb") || col("anchor_id") === col("pos_id"))
    assert(posBad.count() == 0)
    // triples exist for (nearly) every anchor at these LSH settings; note
    // the testdata's labels are independent of embedding geometry, so
    // neg_cos > pos_cos is common here — hardness ordering is a property
    // of the data, not of the builder, and is deliberately not asserted
    assert(got.count() >= 450)
    got.unpersist()
  }

  test("scrubDuplicateSpans: short docs (< n tokens) dedup on their whole text") {
    val d = Seq(
      (1L, "same short doc"), (2L, "same short doc"), // whole-doc dup → both drop
      (3L, "a different one")
    ).toDF("doc_id", "text")
    val got = Dedup.scrubDuplicateSpans(d, "doc_id", "text", n = 15, minCount = 2)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(3)))
    assert(got.toSeq == Seq((3L, "a different one")))
  }

  test("q302 mixture materialization: greedy-prefix shortfall bounded by the longest doc") {
    import org.apache.spark.sql.functions._
    // the emitted mixture can undershoot its per-source token target only
    // by less than one document (the greedy prefix stops at the first doc
    // that would overshoot) — the closed-form bound the audit columns
    // carry; also every copy count is base or base+1 (checksum consistency
    // is already hash-gated by the oracle)
    val rep = SparkEntry.queries("q302_mixture_materialization")(spark, sfDir)
    val maxLen = Engine.table(spark, sfDir, "documents")
      .select(max(size(graft.llm.TextFns.portableTokens(col("text")))))
      .head().getInt(0).toLong
    val rows = rep.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val shortfall = r.getLong(r.fieldIndex("shortfall"))
      assert(shortfall >= 0 && shortfall <= maxLen,
        s"${r.getString(0)}: shortfall $shortfall outside [0, $maxLen]")
      val (nDocs, emitted, base) = (r.getLong(r.fieldIndex("n_docs")),
        r.getLong(r.fieldIndex("emitted_docs")),
        r.getLong(r.fieldIndex("base_copies")))
      assert(emitted >= nDocs * base && emitted <= nDocs * (base + 1),
        s"${r.getString(0)}: emitted_docs $emitted outside copy bounds")
    }
  }
}
