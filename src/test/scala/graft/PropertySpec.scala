package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.{Graph, Joins}

/** Property-based differential tests: core operators vs naive in-memory
  * models on scalacheck-generated inputs (fixed seeds — deterministic runs).
  * The DuckDB oracle gates each op on the real tables; these close the gap
  * on adversarial shapes the testdata never produces (duplicate timestamps,
  * empty keys, degenerate intervals, self-loops, disconnected forests).
  */
class PropertySpec extends SparkSuite {

  private def samples[T](g: Gen[T], n: Int, seed: Long): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  test("asofJoin backward matches the naive model on random inputs") {
    import spark.implicits._
    val rowGen = for {
      k <- Gen.choose(0, 3)
      t <- Gen.choose(0L, 20L)
      v <- Gen.choose(0, 99)
    } yield (k, t, v)
    for (round <- 0 until 5) {
      val lRows = samples(rowGen, 40, 1000 * round).map { case (k, t, _) => (k, t) }
      val rRows = samples(rowGen, 30, 7000 * round + 13)
      val l = lRows.toDF("k", "lt")
      val r = rRows.toDF("k", "rt", "v")
      val got = Joins.asofJoin(l, r, Seq("k"), "lt", "rt", Seq("v"),
          how = "left", tieBreak = Seq("v"))
        .collect()
        .map(x => (x.getInt(0), x.getLong(1),
          if (x.isNullAt(2)) None else Some(x.getInt(2)))).toSeq.sorted
      // naive: per left row, the right row with max rt <= lt; ties on rt
      // resolved by the (rt, v) order the tieBreak pins (largest v wins
      // under `last` over ascending order)
      val expect = lRows.map { case (k, lt) =>
        val cand = rRows.filter(rr => rr._1 == k && rr._2 <= lt)
        val best = if (cand.isEmpty) None
          else Some(cand.maxBy(rr => (rr._2, rr._3))._3)
        (k, lt, best)
      }.sorted
      assert(got == expect, s"round $round mismatch")
    }
  }

  test("AsOfMergeJoin exec matches the naive model on random inputs") {
    import spark.implicits._
    import graft.plans.AsOfMergeJoin
    val rowGen = for {
      k <- Gen.choose(0, 3)
      t <- Gen.choose(0L, 20L)
      v <- Gen.choose(0, 99)
    } yield (k, t, v)
    for (round <- 0 until 5) {
      val lRows = samples(rowGen, 40, 2000 * round).map { case (k, t, _) => (k, t) }
      // unique (k, rt): the exec's equal-time winner is sort-order-dependent
      // (the window form pins it via tieBreak); q254 dedupes the same way
      val rRows = samples(rowGen, 30, 9000 * round + 41)
        .groupBy(r => (r._1, r._2)).map(_._2.maxBy(_._3)).toSeq
      val l = lRows.toDF("k", "lt")
      val r = rRows.toDF("k", "rt", "v")
      val got = AsOfMergeJoin.join(l, r, Seq("k"), "lt", "rt", Seq("v"), how = "left")
        .collect()
        .map(x => (x.getInt(0), x.getLong(1),
          if (x.isNullAt(2)) None else Some(x.getInt(2)))).toSeq.sorted
      val expect = lRows.map { case (k, lt) =>
        val cand = rRows.filter(rr => rr._1 == k && rr._2 <= lt)
        val best = if (cand.isEmpty) None else Some(cand.maxBy(_._2)._3)
        (k, lt, best)
      }.sorted
      assert(got == expect, s"round $round mismatch")

      // forward + tolerance against the same model
      val gotF = AsOfMergeJoin.join(l, r, Seq("k"), "lt", "rt", Seq("v"),
          how = "left", direction = "forward", tolerance = Some(3L))
        .collect()
        .map(x => (x.getInt(0), x.getLong(1),
          if (x.isNullAt(2)) None else Some(x.getInt(2)))).toSeq.sorted
      val expectF = lRows.map { case (k, lt) =>
        val cand = rRows.filter(rr =>
          rr._1 == k && rr._2 >= lt && rr._2 - lt <= 3L)
        val best = if (cand.isEmpty) None else Some(cand.minBy(_._2)._3)
        (k, lt, best)
      }.sorted
      assert(gotF == expectF, s"round $round forward mismatch")
    }
  }

  test("rangeJoin matches the naive point-in-interval join on random inputs") {
    import spark.implicits._
    val ptGen = Gen.choose(0L, 100L)
    val ivGen = for {
      lo <- Gen.choose(0L, 100L)
      len <- Gen.choose(-5L, 20L) // includes empty (lo > hi) intervals
    } yield (lo, lo + len)
    for (round <- 0 until 5) {
      val pts = samples(ptGen, 50, 31 * round).zipWithIndex
        .map { case (p, i) => (i.toLong, p) }
      val ivs = samples(ivGen, 25, 77 * round + 5).zipWithIndex
        .map { case ((lo, hi), i) => (i.toLong, lo, hi) }
      val l = pts.toDF("pid", "p")
      val r = ivs.toDF("iid", "lo", "hi")
      val got = Joins.rangeJoin(l, r, "p", "lo", "hi", binWidth = 8)
        .select("pid", "iid").collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSeq.sorted
      val expect = (for {
        (pid, p) <- pts
        (iid, lo, hi) <- ivs
        if p >= lo && p <= hi
      } yield (pid, iid)).sorted
      assert(got == expect, s"round $round mismatch")
    }
  }

  test("connectedComponents matches union-find on random graphs with self-loops") {
    import spark.implicits._
    val edgeGen = for {
      a <- Gen.choose(0L, 30L)
      b <- Gen.choose(0L, 30L)
    } yield (a, b) // includes self-loops (filtered by the op) and dups
    for (round <- 0 until 5) {
      val edges = samples(edgeGen, 35, 500 * round + 3)
      val got = graft.llm.Dedup.connectedComponents(edges.toDF("a", "b"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      // union-find model
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.filter(e => e._1 != e._2).foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = edges.filter(e => e._1 != e._2).flatMap(e => Seq(e._1, e._2)).distinct
      val expect = nodes.map(x => x -> find(x)).toMap
      // canonicalize both labelings to min-of-component
      def canon(m: Map[Long, Long]): Map[Long, Long] = {
        val byComp = m.groupBy(_._2).map { case (_, kv) => (kv.keys.min, kv.keys.toSet) }
        byComp.flatMap { case (mn, ids) => ids.map(_ -> mn) }
      }
      assert(canon(got) == canon(expect), s"round $round mismatch")
    }
  }

  test("labelPropagation matches the naive synchronous model on random graphs") {
    import spark.implicits._
    // dense 10-node space: self-loops, multi-edges (de-duped by the op),
    // in-degree-0 nodes (must keep their own label), heavy ties
    val edgeGen = for {
      a <- Gen.choose(0L, 9L)
      b <- Gen.choose(0L, 9L)
    } yield (a, b)
    for (round <- 0 until 5; iters <- Seq(1, 3)) {
      val es = samples(edgeGen, 25, 31000 * round + 7).distinct
      val got = Graph.labelPropagation(es.toDF("s", "t"), "s", "t", iters)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct
      var lbl = nodes.map(n => n -> n).toMap
      for (_ <- 1 to iters) {
        lbl = nodes.map { v =>
          val inl = es.filter(_._2 == v).map(e => lbl(e._1))
          if (inl.isEmpty) v -> lbl(v)
          else v -> inl.groupBy(identity).toSeq
            .map { case (l, g) => (-g.size, l) }.min._2
        }.toMap
      }
      assert(got == lbl, s"round $round iters $iters mismatch")
    }
  }

  test("greedy BPE merge count equals the islands ceil(L/2) identity (q290 oracle equivalence)") {
    // q290's Spark side counts merges with a greedy left-to-right fold;
    // its DuckDB oracle counts sum((L+1)//2) over islands of consecutive
    // match positions. This is the identity that makes them equal.
    val tokGen = Gen.listOfN(30, Gen.oneOf("a", "b", "c"))
    for (round <- 0 until 20) {
      val toks = samples(tokGen, 1, 500 * round + 3).head
      for ((w1, w2) <- Seq(("a", "a"), ("a", "b"), ("b", "c"))) {
        val ps = toks.indices.dropRight(1)
          .filter(i => toks(i) == w1 && toks(i + 1) == w2)
        var e = -2; var greedy = 0
        ps.foreach(p => if (p >= e) { e = p + 2; greedy += 1 })
        val islands = ps.foldLeft(List.empty[List[Int]]) {
          case (h :: t, p) if h.head == p - 1 => (p :: h) :: t
          case (acc, p) => List(p) :: acc
        }
        val viaIslands = islands.map(l => (l.size + 1) / 2).sum
        assert(greedy == viaIslands,
          s"round $round pair ($w1,$w2): greedy=$greedy islands=$viaIslands toks=$toks")
      }
    }
  }

  test("Bpe.train matches the naive greedy-merge model; merged pairs cannot survive their round") {
    import spark.implicits._
    // tiny alphabet → heavy merging, overlap runs (w1 == w2), and compound
    // merges (round 2 picking a pair that contains round 1's merged token)
    val tokGen = Gen.choose(4, 14).flatMap(n => Gen.listOfN(n, Gen.oneOf("a", "b", "c")))
    def naiveRound(docs: Map[Long, Vector[String]]): ((String, String), Map[Long, Vector[String]]) = {
      val counts = docs.values.toSeq.flatMap(ts => ts.zip(ts.drop(1)))
        .groupBy(identity).map { case (p, g) => (p, g.size) }
      val (w1, w2) = counts.toSeq.map { case ((a, b), c) => (-c, a, b) }.min match {
        case (_, a, b) => (a, b)
      }
      ((w1, w2), docs.map { case (id, ts) =>
        val buf = scala.collection.mutable.ArrayBuffer[String]()
        var i = 0
        while (i < ts.length) {
          if (i + 1 < ts.length && ts(i) == w1 && ts(i + 1) == w2) {
            buf += s"${w1}_${w2}"; i += 2
          } else { buf += ts(i); i += 1 }
        }
        id -> buf.toVector
      })
    }
    for (round <- 0 until 3) {
      val corpus = (0L until 8L).map(id =>
        id -> samples(tokGen, 1, 900 * round + id).head.toVector).toMap
      val df = corpus.toSeq.map { case (id, ts) => (id, ts.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = graft.llm.Bpe.train(df, "doc_id", "text", rounds = 3)
      val rows = got.collect().map(r => (
        r.getAs[Long]("doc_id"), r.getSeq[String](r.fieldIndex("toks")).toVector,
        r.getAs[String]("r1_pair"), r.getAs[String]("r2_pair"),
        r.getAs[String]("r3_pair"))).sortBy(_._1)
      var cur = corpus
      val learned = (1 to 3).map { _ =>
        val (p, next) = naiveRound(cur)
        // the invariant the oracle leans on: a merged pair with w1 ≠ w2
        // has ZERO adjacencies left after its own round (w1 == w2 runs may
        // legitimately leave an odd trailing token)
        if (p._1 != p._2)
          assert(!next.values.exists(ts => ts.zip(ts.drop(1)).contains(p)),
            s"pair $p survived its round")
        cur = next
        s"${p._1} ${p._2}"
      }
      assert(rows.map(_._1).toSeq == corpus.keys.toSeq.sorted)
      rows.foreach { case (id, toks, r1, r2, r3) =>
        assert(toks == cur(id), s"round $round doc $id: $toks vs ${cur(id)}")
        assert(Seq(r1, r2, r3) == learned, s"round $round learned pairs differ")
      }
      // token conservation: n_after = n0 − total merges each round
      val totalAfter = rows.map(_._2.size).sum
      assert(totalAfter == cur.values.map(_.size).sum)
      // and the Spark-side pair counts of the FINAL corpus must reflect the
      // last merge: a w1 ≠ w2 winning pair cannot appear in Bpe.pairCounts
      // over the rewritten tokens (round k+1's counts see round k's merges)
      val Array(lw1, lw2) = learned.last.split(" ", 2)
      if (lw1 != lw2) {
        val survivors = graft.llm.Bpe.pairCounts(got)
          .filter(col("w1") === lw1 && col("w2") === lw2).count()
        assert(survivors == 0, s"round $round: merged pair ($lw1,$lw2) survives")
      }
    }
  }

  test("Bpe.train: a round with NO adjacent pairs is a no-op with a NULL pair, never a wipe") {
    import spark.implicits._
    // every doc is a single token after round 1 ("a a" merges to ["a_a"]),
    // so round 2 has an EMPTY pair set — docs must survive unchanged
    val df = Seq((1L, "a a"), (2L, "a a")).toDF("doc_id", "text")
    val out = graft.llm.Bpe.train(df, "doc_id", "text", rounds = 2)
      .orderBy("doc_id")
      .select("doc_id", "toks", "r1_pair", "r2_pair").collect()
    assert(out.length == 2, "empty-pair round wiped the corpus")
    out.foreach { r =>
      assert(r.getSeq[String](1) == Seq("a_a"))
      assert(r.getString(2) == "a a")
      assert(r.isNullAt(3), "round with no pairs must record a NULL merge")
    }
  }

  test("Bpe.applyMerges (inference) reproduces the training rewrite and encodes unseen text") {
    import spark.implicits._
    val tokGen = Gen.choose(4, 14).flatMap(n => Gen.listOfN(n, Gen.oneOf("a", "b", "c")))
    val corpus = (0L until 8L).map(id =>
      id -> samples(tokGen, 1, 4242 + id).head.mkString(" "))
    val df = corpus.toDF("doc_id", "text")
    val trained = graft.llm.Bpe.train(df, "doc_id", "text", rounds = 3)
    val merges = trained.select("r1_pair", "r2_pair", "r3_pair").head() match {
      case r => (0 to 2).map { i =>
        val Array(a, b) = r.getString(i).split(" ", 2); (a, b)
      }
    }
    // applying the learned list to the SAME corpus = the training rewrite
    val applied = graft.llm.Bpe.applyMerges(df, "doc_id", "text", merges)
    val t = trained.select("doc_id", "toks").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toVector).toMap
    val a = applied.select("doc_id", "toks").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toVector).toMap
    assert(t == a, "inference over the training corpus diverged from training")
    // and it encodes UNSEEN text with the fixed list (hand-checkable case)
    val unseen = Seq((99L, "a b a b c")).toDF("doc_id", "text")
    val enc = graft.llm.Bpe.applyMerges(unseen, "doc_id", "text", Seq(("a", "b")))
      .select("toks").head().getSeq[String](0).toVector
    assert(enc == Vector("a_b", "a_b", "c"))
  }

  test("Bpe.train with sampleCap: sampled-learned merges + full-corpus apply == the train output") {
    import spark.implicits._
    // 24 docs, sampleCap 8 → the winner is learned from a strict hash-
    // sample, but the rewrite covers every doc; applyMerges with the
    // learned list over the full corpus must reproduce the train output
    // exactly (the scaladoc'd sampled-train + full-apply pattern)
    val tokGen = Gen.choose(4, 14).flatMap(n => Gen.listOfN(n, Gen.oneOf("a", "b", "c")))
    val corpus = (0L until 24L).map(id =>
      id -> samples(tokGen, 1, 777 + id).head.mkString(" "))
    val df = corpus.toDF("doc_id", "text")
    val trained = graft.llm.Bpe.train(df, "doc_id", "text", rounds = 3,
      sampleCap = 8)
    assert(trained.count() == 24, "sampling must not drop rewrite rows")
    val merges = trained.select("r1_pair", "r2_pair", "r3_pair").head() match {
      case r => (0 to 2).flatMap { i =>
        Option(r.getString(i)).map { p =>
          val Array(a, b) = p.split(" ", 2); (a, b)
        }
      }
    }
    val applied = graft.llm.Bpe.applyMerges(df, "doc_id", "text", merges)
    val t = trained.select("doc_id", "toks").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toVector).toMap
    val a = applied.select("doc_id", "toks").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toVector).toMap
    assert(t == a, "sampled-train rewrite diverged from full-corpus apply")
    // determinism: a second sampled train learns the identical list
    val again = graft.llm.Bpe.train(df, "doc_id", "text", rounds = 3,
      sampleCap = 8).select("r1_pair", "r2_pair", "r3_pair").head()
    assert((0 to 2).map(again.getString) ==
      trained.select("r1_pair", "r2_pair", "r3_pair").head().toSeq)
  }

  test("Bpe.train sampleCap at k=64: tokenizer-shaped round count, " +
      "sampled-learn + full apply == train") {
    import spark.implicits._
    // the k≤3 gates prove the invariant; this proves it HOLDS at a
    // tokenizer-shaped merge count on the sampled path (the documented
    // mitigation for the driver-synchronous round loop): 64 rounds learned
    // from a 16-doc hash sample of 48 docs, rewrite covering all 48 —
    // applyMerges with the learned 64-merge list must reproduce the train
    // output token-for-token. Wall is recorded in BASELINE.md.
    val vocab = ('a' to 'l').map(_.toString)
    val tokGen = Gen.choose(24, 48).flatMap(n => Gen.listOfN(n, Gen.oneOf(vocab)))
    val corpus = (0L until 48L).map(id =>
      id -> samples(tokGen, 1, 4242 + id).head.mkString(" "))
    val df = corpus.toDF("doc_id", "text")
    val k = 64
    val trained = graft.llm.Bpe.train(df, "doc_id", "text", rounds = k,
      sampleCap = 16)
    assert(trained.count() == 48, "sampling must not drop rewrite rows")
    val head = trained.select((1 to k).map(i => col(s"r${i}_pair")): _*).head()
    val merges = (0 until k).flatMap { i =>
      Option(head.getString(i)).map { p =>
        val Array(a, b) = p.split(" ", 2); (a, b)
      }
    }
    assert(merges.length == k, s"expected $k learned merges, got ${merges.length}")
    val applied = graft.llm.Bpe.applyMerges(df, "doc_id", "text", merges)
    val t = trained.select("doc_id", "toks").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toVector).toMap
    val a = applied.select("doc_id", "toks").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toVector).toMap
    assert(t == a, "k=64 sampled-train rewrite diverged from full-corpus apply")
  }

  test("sessTwapBatch matches the naive session-walk model on random inputs") {
    // the batch twin of the SessTwapProcessor (StreamingSpec proves
    // stream == batch; this closes the model gap on adversarial shapes:
    // duplicate timestamps, gap exactly AT the threshold, single-event
    // sessions, interleaved users)
    import spark.implicits._
    val gapMin = 1
    val gapUs = gapMin * 60000000L
    val rowGen = for {
      u <- Gen.choose(0L, 3L)
      us <- Gen.choose(0L, 300000000L) // 0..300 s in micros
      cents <- Gen.choose(0L, 999L)
    } yield (u, us, cents)
    for (round <- 0 until 5) {
      val rows = samples(rowGen, 60, 4200 * round + 17).zipWithIndex
        .map { case ((u, us, c), i) => (u, us, c, i.toLong) }
      val ev = rows.toDF("user_id", "us", "cents", "event_id")
        .select(col("user_id"), col("event_id"),
          timestamp_micros(col("us")).as("ts"),
          (col("cents") / 100.0).as("value"))
      val got = graft.streaming.Events.sessTwapBatch(ev, gapMin).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSeq.sorted
      // naive walk per user in (us, event_id) order
      val expect = rows.groupBy(_._1).toSeq.flatMap { case (u, rs) =>
        val sorted = rs.sortBy(r => (r._2, r._4))
        var sess = 0L
        sorted.sliding(2).flatMap {
          case Seq((_, pUs, pC, _), (_, us, _, eid)) =>
            if (us - pUs > gapUs) { sess += 1; None }
            else {
              val gapS = math.floorDiv(us - pUs, 1000000L)
              Some((u, eid, sess, gapS, pC * gapS))
            }
          case _ => None
        }
      }.sorted
      assert(got == expect, s"round $round mismatch")
    }
  }

  test("quantileNormalize is rank-preserving and bounded by the global extremes") {
    import spark.implicits._
    val vGen = Gen.choose(0L, 50L)
    for (round <- 0 until 3) {
      val rows = samples(vGen, 60, 90 * round + 7).zipWithIndex
        .map { case (v, i) => (s"g${i % 4}", v, i.toLong) }
      val df = rows.toDF("g", "v", "id")
      val out = graft.operators.Analytics.quantileNormalize(df, "g", "v")
        .select("g", "v", "norm").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      val (mn, mx) = (rows.map(_._2).min.toDouble, rows.map(_._2).max.toDouble)
      assert(out.forall(o => o._3 >= mn && o._3 <= mx))
      // within a group, larger v never maps to a smaller normalized value
      out.groupBy(_._1).foreach { case (_, g) =>
        val sorted = g.sortBy(_._2)
        sorted.sliding(2).foreach {
          case Array(a, b) => assert(a._3 <= b._3, s"rank inversion in $sorted")
          case _ =>
        }
      }
    }
  }
}
