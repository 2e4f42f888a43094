package graft

/** The SQL face of the engine: the reference's query-engine surface
  * (ldf_polars: polars plan → operators) corresponds to Catalyst; here we
  * prove the same queries run as raw SQL text against registered views,
  * including graft's custom functions.
  */
class SqlSurfaceSpec extends SparkSuite {

  private def registerViews(): Unit =
    Seq("lineitem", "orders", "customer", "nation", "region", "supplier",
      "documents", "embeddings").foreach { t =>
      Engine.table(spark, sfDir, t).createOrReplaceTempView(t)
    }

  test("TPC-H Q1 as SQL text matches the DataFrame form") {
    registerViews()
    val sql = spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)
    val df = SparkEntry.queries("q16_groupby_q1")(spark, sfDir)
      .select("l_returnflag", "l_linestatus", "sum_qty", "count_order")
    assert(rows(sql) == rows(df))
  }

  test("custom expressions are callable from SQL") {
    registerViews()
    val prod = spark.sql(
      "SELECT graft_product(1.0 + l_discount) AS p FROM lineitem WHERE l_orderkey = 1")
    assert(prod.collect()(0).getDouble(0) > 0.0)
    val dotted = spark.sql(
      "SELECT vec_id, graft_dot(embedding, embedding) AS sq FROM embeddings LIMIT 5")
    assert(dotted.collect().forall(_.getDouble(1) > 0.0))
    val sim = spark.sql(
      "SELECT graft_simhash64(split(lower(text), '\\\\s+')) AS sig FROM documents LIMIT 3")
    assert(sim.count() == 3)
    val mh = spark.sql(
      "SELECT graft_minhash(transform(split(lower(text), '\\\\s+'), t -> xxhash64(t)), 16) AS sig " +
        "FROM documents LIMIT 3")
    assert(mh.collect().forall(_.getSeq[Long](0).length == 16))
    val idot = spark.sql(
      "SELECT graft_dot_int(array(1, 2, 3), array(4, 5, 6)) AS d")
    assert(idot.collect().head.getLong(0) == 32L)
    val sh = spark.sql(
      "SELECT graft_word_shingles(split(lower(text), '\\\\s+'), 3) AS g " +
        "FROM documents LIMIT 3")
    assert(sh.collect().forall(_.getSeq[String](0).nonEmpty))
  }

  test("graft_dup_fracs is callable from SQL and rejects column specs") {
    registerViews()
    val fr = spark.sql(
      "SELECT graft_dup_fracs(split(lower(text), '\\\\s+'), array(2, 3), array(1, 1)) AS fr " +
        "FROM documents LIMIT 3")
    assert(fr.collect().forall { r =>
      val v = r.getSeq[Double](0); v.length == 2 && v.forall(x => x >= 0.0 && x <= 1.0)
    })
    val e = intercept[Exception] {
      spark.sql(
        "SELECT graft_dup_fracs(split(text, ' '), array(CAST(doc_id AS INT)), array(1)) " +
          "FROM documents LIMIT 1").collect()
    }
    assert(e.getMessage.contains("ns must be a literal"), s"unhelpful error: ${e.getMessage}")
  }

  test("literal-argument builders reject non-foldable arguments with a clear error") {
    registerViews()
    val e = intercept[Exception] {
      spark.sql(
        "SELECT graft_minhash(array(xxhash64(text)), doc_id) FROM documents LIMIT 1")
        .collect()
    }
    assert(e.getMessage.contains("num_hashes must be a literal"),
      s"unhelpful error: ${e.getMessage}")
  }
}
