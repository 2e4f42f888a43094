package graft

import org.apache.spark.sql.functions._

/** ShingleExplodeExpr (custom Catalyst Generator): semantics must equal the
  * materialize-then-explode composition exactly, plus the Generator-specific
  * edge cases (null array → no rows, short doc → one whole-doc gram).
  */
class GeneratorSpec extends SparkSuite {

  test("shingle generator equals posexplode over the array form") {
    val d = Engine.table(spark, sfDir, "documents").filter(col("doc_id") < 80)
      .select(col("doc_id"), graft.llm.TextFns.tokens(col("text")).as("toks"))
    val viaGen = d.selectExpr("doc_id", "graft_shingle_explode(toks, 3) AS (pos, shingle)")
    val viaArray = d.select(col("doc_id"),
        posexplode(graft.functions.Registry.wordShingles(col("toks"), 3)))
      .toDF("doc_id", "pos", "shingle")
    assert(viaGen.count() > 0)
    assert(viaGen.exceptAll(viaArray).isEmpty && viaArray.exceptAll(viaGen).isEmpty)
  }

  test("short, empty, and null token arrays") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(Seq("a", "b"))),     // shorter than n → one whole-doc gram
      (2L, Some(Seq[String]())),     // zero tokens → one empty gram (concat_ws of none)
      (3L, None)                     // null array → no rows, like explode
    ).toDF("id", "toks")
    val out = df.selectExpr("id", "graft_shingle_explode(toks, 3) AS (pos, shingle)")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq
    assert(out == Seq((1L, 0, "a b"), (2L, 0, "")))
  }

  test("generator works from SQL via LATERAL VIEW") {
    import spark.implicits._
    Seq((1L, "one two three four")).toDF("id", "text")
      .createOrReplaceTempView("gen_docs")
    val out = spark.sql(
      """SELECT id, pos, shingle
        |FROM gen_docs
        |LATERAL VIEW graft_shingle_explode(split(text, ' '), 2) AS pos, shingle
        |ORDER BY pos""".stripMargin).collect()
      .map(r => (r.getInt(1), r.getString(2))).toSeq
    assert(out == Seq((0, "one two"), (1, "two three"), (2, "three four")))
  }

  test("shingle hashes mirror the string windows: same positions, hash-equality == string-equality") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c a b c a b"),  // repeated windows WITHIN a doc
      (2L, "a b c x y z"),      // shares the 'a b c' window with doc 1
      (3L, "short one"),        // shorter than n → single whole-doc window
      (4L, "short one")         // whole-doc duplicate of doc 3
    ).toDF("id", "text")
      .selectExpr("id", "split(text, ' ') AS toks")
    val strings = df.selectExpr("id", "graft_shingle_explode(toks, 3) AS (pos, g)")
      .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getString(2))).toMap
    val hashes = df.selectExpr("id", "posexplode(graft_shingle_hashes(toks, 3)) AS (pos, h)")
      .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getLong(2))).toMap
    // identical (id, pos) domains — window positions mirror exactly
    assert(strings.keySet == hashes.keySet)
    // equal strings → equal hashes; on this sample, distinct strings →
    // distinct hashes too (collisions are possible in general and are
    // handled by the callers' exact-string verify phase)
    for (ka <- strings.keys; kb <- strings.keys)
      if (strings(ka) == strings(kb)) assert(hashes(ka) == hashes(kb))
      else assert(hashes(ka) != hashes(kb), s"collision in test sample: $ka $kb")
  }
}
