package graft

import graft.operators.{SetOps, Sorts, RowOps}
import org.apache.spark.sql.functions._

/** Sort surface per reference sort.hpp:76-81 (multi-key, per-key ascending,
  * nulls placement, positive/negative limit) + set-like ops (SURVEY §2.6).
  */
class SortsSetOpsSpec extends SparkSuite {
  import spark.implicits._

  private lazy val df = Seq(
    (Some(3L), "c"), (Some(1L), "a"), (None, "n"), (Some(2L), "b"), (Some(5L), "e"))
    .toDF("k", "v")

  test("sort ascending, nulls at end") {
    assert(rows(Sorts.sort(df, Seq("k"), Seq(true), nullsAtEnd = true))
      .map(_(1)) == Seq("a", "b", "c", "e", "n"))
  }

  test("sort descending, nulls first") {
    assert(rows(Sorts.sort(df, Seq("k"), Seq(false), nullsAtEnd = false))
      .map(_(1)) == Seq("n", "e", "c", "b", "a"))
  }

  test("positive limit = head (top-k plan)") {
    val topk = Sorts.sort(df, Seq("k"), Seq(true), limit = Some(2))
    assert(rows(topk).map(_(1)) == Seq("a", "b"))
    val plan = topk.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k plan:\n$plan")
  }

  test("negative limit = tail, order restored (sort.cpp:425-432)") {
    assert(rows(Sorts.sort(df, Seq("k"), Seq(true), limit = Some(-2)))
      .map(_(1)) == Seq("e", "n"))
  }

  test("assignSplit: deterministic, exhaustive, and roughly proportional") {
    import org.apache.spark.sql.functions.col
    import graft.operators.RowOps
    val ids = spark.range(10000).toDF("id")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val labeled = ids.select(col("id"), RowOps.assignSplit(col("id"), splits).as("s"))
    val counts = rows(labeled.groupBy("s").count())
      .map(r => r(0).asInstanceOf[String] -> r(1).asInstanceOf[Long]).toMap
    assert(counts.values.sum == 10000) // every row labeled
    assert(counts("train") > 7500 && counts("train") < 8500)
    assert(counts("val") > 500 && counts("val") < 1500)
    // determinism across partitionings
    val repartitioned = ids.repartition(13)
      .select(col("id"), RowOps.assignSplit(col("id"), splits).as("s"))
    assert(rows(labeled.orderBy("id")).map(_.toString) ==
      rows(repartitioned.orderBy("id")).map(_.toString))
    intercept[IllegalArgumentException](
      RowOps.assignSplit(col("id"), Seq("a" -> 0.5, "b" -> 0.4)))
  }

  test("stratifiedSample: per-stratum fractions, deterministic, composes with assignSplit") {
    import org.apache.spark.sql.functions.{col, when}
    import graft.operators.RowOps
    val rows10k = spark.range(10000)
      .select(col("id"), when(col("id") % 3 === 0, "en").otherwise("fr").as("lang"))
    val sampled = RowOps.stratifiedSample(rows10k, "id", "lang",
      Map("en" -> 1.0, "fr" -> 0.3), defaultFraction = 0.0)
    val counts = rows(sampled.groupBy("lang").count())
      .map(r => r(0).asInstanceOf[String] -> r(1).asInstanceOf[Long]).toMap
    assert(counts("en") == 3334L) // fraction 1.0 keeps the whole stratum
    assert(counts("fr") > 1600 && counts("fr") < 2400)
    // deterministic: same rows on a different partitioning
    val again = RowOps.stratifiedSample(rows10k.repartition(13), "id", "lang",
      Map("en" -> 1.0, "fr" -> 0.3), defaultFraction = 0.0)
    assert(rows(again.orderBy("id")).map(_.toString) ==
      rows(sampled.orderBy("id")).map(_.toString))
    // same bucketing as assignSplit: the 30% fr sample is exactly the fr rows
    // whose split-bucket falls below 0.3 — sampling then splitting is stable
    val buckets = rows10k.select(col("id"), col("lang"),
      RowOps.assignSplit(col("id"), Seq("a" -> 0.3, "b" -> 0.7)).as("s"))
    val expectFr = buckets.filter(col("lang") === "fr" && col("s") === "a")
    assert(expectFr.count() == counts("fr"))
    intercept[IllegalArgumentException](
      RowOps.stratifiedSample(rows10k, "id", "lang", Map("en" -> 1.5), 0.2))
  }

  test("weightedSample: clamped probabilities, deterministic, weight-monotone") {
    import org.apache.spark.sql.functions.{col, lit}
    import graft.operators.RowOps
    val rows10k = spark.range(10000).select(col("id"))
    // weight 0 keeps nothing; weight >= 1 (clamped) keeps everything
    assert(RowOps.weightedSample(rows10k, "id", lit(0.0)).count() == 0)
    assert(RowOps.weightedSample(rows10k, "id", lit(2.5)).count() == 10000)
    // constant weight ~ keep fraction; reproducible across partitionings
    val half = RowOps.weightedSample(rows10k, "id", lit(0.5))
    assert(half.count() > 4500 && half.count() < 5500)
    val again = RowOps.weightedSample(rows10k.repartition(17), "id", lit(0.5))
    assert(rows(again.orderBy("id")).map(_.toString) ==
      rows(half.orderBy("id")).map(_.toString))
    // monotone in the weight: a row kept at w stays kept at w' > w
    val ids05 = rows(half.orderBy("id")).map(_(0).asInstanceOf[Long]).toSet
    val ids08 = rows(RowOps.weightedSample(rows10k, "id", lit(0.8)).orderBy("id"))
      .map(_(0).asInstanceOf[Long]).toSet
    assert(ids05.subsetOf(ids08))
  }

  test("negativeSamples matches the arithmetic model; deterministic; positives excluded") {
    import org.apache.spark.sql.functions.col
    import graft.operators.RowOps
    val B = 16; val k = 3; val seed = 7L
    val corpus = spark.range(300).toDF("id")
    val queries = corpus.filter(col("id") % 10 === 0)
    // independent driver-side model of the same overflow-free hash draw
    def mix(x: Long, m: Long) = x % 1000000L * 2654435761L % m
    def cb(c: Long) = mix(c % 1000000L * 1000003L + seed, B)
    def pb(q: Long, i: Int) = mix(q % 1000000L * 1000003L + i * 7919L + seed, B)
    def tb(q: Long, i: Int, c: Long) =
      mix(c % 1000000L * 7919L + q % 1000000L * 104729L + i, 1000000L)
    val expected = (for {
      q <- 0L until 300L by 10L; i <- 0 until k
      cands = (0L until 300L).filter(c => cb(c) == pb(q, i) && c != q)
      if cands.nonEmpty
    } yield (q, i, cands.minBy(c => (tb(q, i, c), c)))).sorted
    val got = RowOps.negativeSamples(queries, corpus, "id", "id", k, B, seed)
    val gotRows = rows(got.orderBy("id", "neg_rank")).map(r =>
      (r(0).asInstanceOf[Long], r(1).asInstanceOf[Int], r(2).asInstanceOf[Long]))
    assert(gotRows == expected)
    assert(gotRows.forall { case (q, _, c) => q != c }) // no self-pairs
    // partition-invariant (the draw depends only on ids, never on layout)
    val again = RowOps.negativeSamples(
      queries.repartition(13), corpus.repartition(7), "id", "id", k, B, seed)
    assert(rows(again.orderBy("id", "neg_rank")).map(_.toString) ==
      rows(got.orderBy("id", "neg_rank")).map(_.toString))
    // excluding a (query, candidate) positive re-draws or drops that slot
    val hit = gotRows.head
    val pos = Seq((hit._1, hit._3)).toDF("q", "c") // positional contract
    val masked = RowOps.negativeSamples(queries, corpus, "id", "id", k, B, seed,
      positives = Some(pos))
    val maskedRows = rows(masked).map(r =>
      (r(0).asInstanceOf[Long], r(1).asInstanceOf[Int], r(2).asInstanceOf[Long]))
    assert(!maskedRows.contains(hit))
    // every slot other than the masked one draws exactly as before
    assert(maskedRows.filterNot(r => (r._1, r._2) == ((hit._1, hit._2))).toSet ==
      expected.filterNot(r => (r._1, r._2) == ((hit._1, hit._2))).toSet)
  }

  test("packSequences: prefix-sum packing, start-bin assignment, deterministic") {
    import org.apache.spark.sql.functions.col
    val d = spark.range(1000).toDF("id")
      .withColumn("grp", (col("id") % 4).cast("string"))
      .withColumn("ntok", col("id") % 97 + lit(1L))
    val packed = RowOps.packSequences(d, "id", "ntok", budget = 500L, Seq("grp"))
      .persist()
    // every doc keeps its row; seq_id is exactly start_offset // budget
    assert(packed.count() == 1000)
    assert(packed.filter(col("seq_id") =!= floor(col("start_offset") / 500L)).count() == 0)
    // per group: offsets are a gapless prefix sum of token counts
    val sums = rows(packed.groupBy("grp").agg(
      sum(col("ntok")).as("total"),
      max(col("start_offset") + col("ntok")).as("end")))
    sums.foreach(r => assert(r(1) == r(2), s"prefix-sum gap in $r"))
    // deterministic across input partitionings
    val again = RowOps.packSequences(d.repartition(17), "id", "ntok", 500L, Seq("grp"))
    assert(rows(packed.orderBy("id")).map(_.toString) ==
      rows(again.orderBy("id")).map(_.toString))
    packed.unpersist()
    intercept[IllegalArgumentException](
      RowOps.packSequences(d, "id", "ntok", 0L, Seq("grp")))
    intercept[IllegalArgumentException](
      RowOps.packSequences(d, "id", "ntok", 500L, Seq.empty))
  }

  test("topKPerGroup: row vs rank tie semantics + WindowGroupLimit pushdown") {
    import org.apache.spark.sql.functions.col
    val d = Seq(("g1", 3), ("g1", 3), ("g1", 2), ("g1", 1),
      ("g2", 9)).toDF("g", "score")
    val byRow = Sorts.topKPerGroup(d, Seq("g"), Seq(col("score").desc), k = 2)
    assert(byRow.filter(col("g") === "g1").count() == 2) // exactly k
    val byRank = Sorts.topKPerGroup(d, Seq("g"), Seq(col("score").desc), k = 2,
      rank = "rank")
    // rank: both score=3 rows share rank 1, score=2 has rank 3 > k → 2 rows
    // for the tie, none beyond
    assert(rows(byRank.filter(col("g") === "g1")).map(_(1)).toSet == Set(3))
    assert(byRank.filter(col("g") === "g2").count() == 1)
    // map-side partial top-k: Spark plans the rank filter as WindowGroupLimit
    val plan = byRow.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"expected WindowGroupLimit:\n$plan")
  }

  test("multi-key with mixed directions") {
    val d = Seq((1, 9), (1, 3), (2, 5), (2, 7)).toDF("a", "b")
    assert(rows(Sorts.sort(d, Seq("a", "b"), Seq(true, false)))
      == Seq(Seq(1, 9), Seq(1, 3), Seq(2, 7), Seq(2, 5)))
  }

  test("distinct keeps one arbitrary row per key (hash_one semantics)") {
    val d = Seq((1, "x"), (1, "y"), (2, "z")).toDF("k", "v")
    val out = SetOps.distinct(d, Seq("k"))
    assert(out.count() == 2)
    assert(out.select("k").as[Int].collect().sorted.toSeq == Seq(1, 2))
  }

  test("union + slice") {
    val a = Seq(1, 2).toDF("x")
    val b = Seq(3, 4, 5).toDF("x")
    val u = SetOps.union(Seq(a, b))
    assert(u.count() == 5)
    val s = SetOps.slice(u.orderBy("x"), 1, 2)
    assert(rows(s).map(_(0)) == Seq(2, 3))
  }

  test("intersect / exceptAll") {
    val a = Seq(1, 2, 2, 3).toDF("x")
    val b = Seq(2, 3, 4).toDF("x")
    assert(rows(SetOps.intersect(a, b).orderBy("x")).map(_(0)) == Seq(2, 3))
    assert(rows(SetOps.exceptAll(a, b).orderBy("x")).map(_(0)) == Seq(1, 2))
  }

  test("sequence matches spark.range semantics") {
    val s = RowOps.sequence(spark, 5, 10)
    assert(rows(s).map(_(0)) == Seq(10L, 11L, 12L, 13L, 14L))
  }

  test("isInColumn = broadcast semi-join membership") {
    val needles = Seq(1, 2, 5).toDF("n")
    val hay = Seq(2, 5, 9).toDF("h")
    val out = RowOps.isInColumn(needles, "n", hay, "h").orderBy("n")
    assert(rows(out) == Seq(Seq(1, false), Seq(2, true), Seq(5, true)))
  }

  test("dropNulls and maskNans (polars misc unary fns, unary.py:101-108)") {
    val d = Seq(
      (Some(1.0), Some("a")), (Some(Double.NaN), Some("b")),
      (None, Some("c")), (Some(4.0), None))
      .toDF("x", "s")
    // drop_nulls: subset + all-columns forms; NaN is a VALUE, not null
    // (polars semantics — Spark's own na.drop would discard the NaN row too)
    assert(RowOps.dropNulls(d, Seq("x")).count() == 3)
    assert(RowOps.dropNulls(d).count() == 2)
    // mask_nans: NaN -> null, values and nulls untouched
    val masked = rows(d.select(RowOps.maskNans(col("x")))).map(_(0))
    assert(masked(0) == 1.0 && masked(1) == null && masked(2) == null && masked(3) == 4.0)
    // composes: drop_nulls(mask_nans(x)) clears NaNs too
    assert(d.select(RowOps.maskNans(col("x")).as("x")).na.drop(Seq("x")).count() == 2)
  }

  test("sliceRange: python negative indexing, count-free (column.hpp:432-439)") {
    val n = 10
    val data = (0 until n).map(i => (i.toLong, s"v$i"))
    // deliberately unsorted input — the keys define the positional order
    val df = scala.util.Random.shuffle(data).toDF("k", "v").repartition(4)
    def got(start: Long, stop: Option[Long]): Seq[Long] =
      rows(SetOps.sliceRange(df, Seq("k"), Seq(true), start, stop))
        .map(_.head.asInstanceOf[Long])
    def exp(start: Int, stop: Option[Int]): Seq[Long] = {
      val idx = (0 until n).toList
      stop.fold(idx.slice(if (start < 0) n + start else start, n))(e =>
        idx.slice(if (start < 0) n + start else start, if (e < 0) n + e else e))
        .map(_.toLong)
    }
    val cases = Seq[(Long, Option[Long])](
      (2L, Some(5L)), (0L, Some(10L)), (7L, Some(3L)), // fwd, full, empty
      (3L, None), // open end
      (-4L, None), // tail
      (-7L, Some(-2L)), (-3L, Some(-3L)), // negative window, empty
      (2L, Some(-3L)), (0L, Some(-10L)), // drop-last forms
      (15L, None), (15L, Some(20L)), // start past the end → empty
      (-20L, None), (-20L, Some(-15L)), // tail larger than the frame
      (3L, Some(-20L))) // drop more than exists → empty
    cases.foreach { case (s, e) =>
      assert(got(s, e) == exp(s.toInt, e.map(_.toInt)),
        s"sliceRange($s, $e): got ${got(s, e)}, want ${exp(s.toInt, e.map(_.toInt))}")
    }
    // the count-dependent combination is rejected, not silently wrong
    intercept[IllegalArgumentException](
      SetOps.sliceRange(df, Seq("k"), Seq(true), -5L, Some(8L)))
    // plain slice refuses negatives and points at sliceRange
    intercept[IllegalArgumentException](SetOps.slice(df, -1L, 3L))
    // positions past Int range fail loudly instead of wrapping negative
    // (Spark's offset/limit are Int-typed; silent .toInt would corrupt)
    intercept[IllegalArgumentException](SetOps.slice(df, Int.MaxValue + 1L, 3L))
    intercept[IllegalArgumentException](
      SetOps.sliceRange(df, Seq("k"), Seq(true), -(Int.MaxValue + 2L), None))
  }

  test("snapshotDiff classifies insert/delete/update; unchanged and null==null rows drop") {
    val olds = Seq(
      (1L, Some("a")), (2L, Some("b")), (3L, None: Option[String]),
      (4L, Some("d")), (5L, Some("e"))).toDF("id", "v")
    val news = Seq(
      (1L, Some("a")),            // unchanged -> dropped
      (2L, Some("B")),            // update
      (3L, None: Option[String]), // null <=> null -> unchanged, dropped
      (4L, None: Option[String]), // value -> null IS an update
      (6L, Some("f"))             // insert; id 5 deleted
    ).toDF("id", "v")
    val diff = rows(SetOps.snapshotDiff(olds, news, Seq("id"), Seq("v"))
      .orderBy("id"))
    assert(diff.map(r => (r(0), r(1))) ==
      Seq((2L, "update"), (4L, "update"), (5L, "delete"), (6L, "insert")))
    // new-side values ride along; null for deletes
    assert(diff.find(_(0) == 6L).get(2) == "f")
    assert(diff.find(_(0) == 5L).get(2) == null)
  }

  test("applyChanges: insert/update/delete, last sequence wins, untouched rows survive") {
    val snap = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("id", "v")
    val changes = Seq(
      (2L, "b2", "U", 1L),  // plain update
      (3L, "c2", "U", 1L),  // update then delete -> gone
      (3L, "c2", "D", 2L),
      (4L, "d2", "D", 1L),  // delete then re-insert -> new image wins
      (4L, "d3", "I", 2L),
      (5L, "e", "I", 1L),   // insert of an absent key
      (5L, "e2", "U", 2L)   // ... immediately updated; id 1 untouched
    ).toDF("id", "v", "op", "seq")
    val got = rows(SetOps.applyChanges(snap, changes, Seq("id"), "op", "seq")
      .orderBy("id")).map(r => (r(0), r(1)))
    assert(got == Seq((1L, "a"), (2L, "b2"), (4L, "d3"), (5L, "e2")))
    // applying the diff of two snapshots reconstructs the target snapshot
    val target = Seq((1L, "a"), (2L, "bX"), (6L, "f")).toDF("id", "v")
    val diff = SetOps.snapshotDiff(snap, target, Seq("id"), Seq("v"))
      .select(col("id"), col("new_v").as("v"),
        when(col("op") === "insert", "I").when(col("op") === "delete", "D")
          .otherwise("U").as("op"),
        lit(1L).as("seq"))
    val rebuilt = rows(SetOps.applyChanges(snap, diff, Seq("id"), "op", "seq")
      .orderBy("id")).map(_.toString)
    assert(rebuilt == rows(target.orderBy("id")).map(_.toString))
    // schema guard: changes must carry snapshot columns + op + seq
    intercept[IllegalArgumentException](
      SetOps.applyChanges(snap, changes.drop("v"), Seq("id"), "op", "seq"))
  }

  test("withRowIndex: rank order across many partitions, offset, descending key") {
    import graft.operators.RowOps
    // shuffled unique keys across 16 input partitions: index must equal
    // rank in sort order, contiguous from offset, whatever the input layout
    val n = 5000
    val df = spark.range(n).repartition(16)
      .select((pmod(col("id") * 2654435761L, lit(n.toLong))).as("k"))
    val idx = RowOps.withRowIndex(df, "idx", Seq(col("k")), offset = 10)
    val got = idx.orderBy("k").select("k", "idx").as[(Long, Long)].collect()
    assert(got.length == n)
    got.zipWithIndex.foreach { case ((k, i), pos) =>
      assert(k == pos && i == pos + 10, s"at $pos: key=$k idx=$i")
    }
    // descending order flips the index
    val desc = RowOps.withRowIndex(df, "idx", Seq(col("k").desc))
      .filter(col("k") === 0).select("idx").as[Long].head()
    assert(desc == n - 1)
  }
}
