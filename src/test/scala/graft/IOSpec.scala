package graft

import graft.sources.IO
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** I/O option surface per reference csv.hpp:96-101 / parquet.hpp:104-125:
  * explicit dtypes, delimiter, headerless + names, na_filter, multi-file
  * glob ordering, per-partition part files.
  */
class IOSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_iospec").toString

  private val schema = StructType(Seq(
    StructField("a", IntegerType), StructField("b", StringType),
    StructField("c", DoubleType)))

  test("csv roundtrip with delimiter option") {
    val df = Seq((1, "x", 1.5), (2, "y|z", -2.0)).toDF("a", "b", "c")
    val dir = tmp()
    IO.csvWrite(df, dir, delimiter = "|")
    val back = IO.csvRead(spark, Seq(dir), schema, delimiter = "|")
    assertSameRows(back, Seq(Seq(1, "x", 1.5), Seq(2, "y|z", -2.0)))
  }

  test("headerless csv with explicit names (usecols/names shape)") {
    val dir = tmp()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/data.csv"), "1,x,1.5\n2,y,2.5\n")
    val back = IO.csvRead(spark, Seq(s"$dir/data.csv"), schema, header = false)
    assert(back.count() == 2)
    assert(back.columns.toSeq == Seq("a", "b", "c"))
    // column projection after read = usecols
    assert(rows(back.select("b")).map(_(0)) == Seq("x", "y"))
  }

  test("csv usecols selects+reorders a subset and names renames it (csv.hpp:96-101)") {
    val dir = tmp()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/data.csv"), "1,x,1.5\n2,y,2.5\n")
    val back = IO.csvRead(spark, Seq(s"$dir/data.csv"), schema, header = false,
      usecols = Seq("c", "a"), names = Seq("score", "id"))
    assert(back.columns.toSeq == Seq("score", "id"))
    assertSameRows(back, Seq(Seq(1.5, 1), Seq(2.5, 2)))
    // names without usecols renames the full row
    val renamed = IO.csvRead(spark, Seq(s"$dir/data.csv"), schema, header = false,
      names = Seq("x1", "x2", "x3"))
    assert(renamed.columns.toSeq == Seq("x1", "x2", "x3"))
    // mismatched names length fails fast
    intercept[IllegalArgumentException](
      IO.csvRead(spark, Seq(s"$dir/data.csv"), schema, header = false,
        usecols = Seq("a"), names = Seq("p", "q")))
  }

  test("na_filter: empty fields become nulls (or not)") {
    val dir = tmp()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/data.csv"), "1,,1.5\n")
    val filtered = IO.csvRead(spark, Seq(s"$dir/data.csv"), schema, header = false)
    assert(filtered.collect()(0).isNullAt(1))
  }

  test("na_filter=false: empty strings survive, literal data never misread (csv.hpp:96-101)") {
    val dir = tmp()
    // row 2's string field is a literal NUL char, row 3's a lone space —
    // values an in-band null sentinel would corrupt
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/data.csv"),
      "1,,1.5\n2,\u0000,2.5\n3, ,3.5\n4,\"\",4.5\n")
    val raw = IO.csvRead(spark, Seq(s"$dir/data.csv"), schema,
      header = false, naFilter = false).orderBy("a").collect()
    assert(raw(0).getString(1) == "") // unquoted empty -> empty string
    assert(raw(1).getString(1) == "\u0000") // literal NUL intact
    assert(raw(2).getString(1) == " ") // literal space intact
    assert(raw(3).getString(1) == "") // quoted empty -> empty string
    // numeric columns still null on empty (no in-domain encoding exists)
    val dir2 = tmp()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir2/data.csv"), "1,x,\n")
    val num = IO.csvRead(spark, Seq(s"$dir2/data.csv"), schema,
      header = false, naFilter = false).collect()(0)
    assert(num.isNullAt(2))
  }

  test("malformed csv rows: PERMISSIVE captures, DROPMALFORMED drops, FAILFAST throws") {
    // the dirty-ingest contract a 100 TB CSV landing zone needs: a bad row
    // must never silently corrupt neighbors — it is quarantined
    // (_corrupt_record), dropped, or fails the job, by explicit choice
    import org.apache.spark.sql.types._
    val dir = tmp()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/data.csv"),
      "a,b,c\n1,x,1.5\nnot_an_int,y,oops\n3,z,3.5\n")
    val s = StructType(Seq(StructField("a", IntegerType), StructField("b", StringType),
      StructField("c", DoubleType), StructField("_corrupt_record", StringType)))
    val permissive = spark.read.schema(s).option("header", "true")
      .option("mode", "PERMISSIVE").csv(s"$dir/data.csv").cache()
    assert(permissive.count() == 3)
    assert(rows(permissive.filter(col("_corrupt_record").isNotNull)
      .select("_corrupt_record")).map(_(0)) == Seq("not_an_int,y,oops"))
    permissive.unpersist()
    val bare = StructType(s.dropRight(1))
    val dropped = spark.read.schema(bare)
      .option("header", "true").option("mode", "DROPMALFORMED").csv(s"$dir/data.csv")
    assert(rows(dropped.select("a")).map(_(0)) == Seq(1, 3))
    val failfast = spark.read.schema(bare)
      .option("header", "true").option("mode", "FAILFAST").csv(s"$dir/data.csv")
    intercept[org.apache.spark.SparkException] { failfast.collect() }
  }

  test("parquet writes one part file per partition; glob read is sorted") {
    val df = spark.range(100).repartition(4).toDF("id")
    val dir = tmp()
    IO.parquetWrite(df, dir)
    val parts = new java.io.File(dir).listFiles.filter(_.getName.startsWith("part-"))
    assert(parts.length == 4, s"expected 4 part files, got ${parts.length}")
    val back = IO.parquetRead(spark, Seq(dir))
    assert(back.count() == 100)
  }

  test("compact merges small files to the target size without losing rows") {
    val df = spark.range(2000).toDF("id")
    val in = tmp(); val out = tmp()
    df.repartition(32).write.mode("overwrite").parquet(in)
    val smallFiles = new java.io.File(in).listFiles
      .filter(_.getName.startsWith("part-"))
    assert(smallFiles.length == 32)
    val totalBytes = smallFiles.map(_.length).sum
    // target = half the input bytes → exactly 2 output files
    val nOut = IO.compact(spark, in, out, targetBytes = (totalBytes + 1) / 2)
    assert(nOut == 2, s"expected 2 output files, got $nOut")
    val back = spark.read.parquet(out)
    assert(back.count() == 2000)
    assert(rows(back.orderBy("id")).map(_(0)) == (0L until 2000L))
    // a huge target collapses to a single file; content still intact
    assert(IO.compact(spark, in, out, targetBytes = Long.MaxValue) == 1)
    assert(spark.read.parquet(out).count() == 2000)
    intercept[IllegalArgumentException](IO.compact(spark, in, out, 0))
  }

  test("parquet column projection prunes the scan") {
    val df = Engine.table(spark, sfDir, "lineitem")
    val dir = tmp()
    IO.parquetWrite(df.limit(100), dir)
    val pruned = IO.parquetRead(spark, Seq(dir), Seq("l_orderkey", "l_quantity"))
    assert(pruned.columns.toSeq == Seq("l_orderkey", "l_quantity"))
    val scan = pruned.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(scan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"))
  }

  test("partitioned parquet write: hive layout, pruned read, data intact") {
    import org.apache.spark.sql.functions.col
    val docs = Engine.table(spark, sfDir, "documents").select("doc_id", "lang", "n_chars")
    val dir = tmp()
    IO.parquetWritePartitioned(docs, dir, Seq("lang"))
    // hive directory layout: one lang=<value> subdir per distinct lang
    val subdirs = new java.io.File(dir).listFiles.filter(_.isDirectory).map(_.getName)
    val langs = rows(docs.select("lang").distinct()).map(_(0).toString)
    assert(subdirs.toSet == langs.map(l => s"lang=$l").toSet, subdirs.mkString(","))
    // roundtrip preserves every row (partition col comes back from the path)
    val back = IO.parquetRead(spark, Seq(dir))
    assert(rows(back.select("doc_id", "lang", "n_chars")).map(_.toString).sorted
      == rows(docs).map(_.toString).sorted)
    // a filter on the partition column prunes at planning time
    val pruned = back.filter(col("lang") === "en")
    val scan = pruned.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(scan.contains("PartitionFilters:") && scan.contains("lang"),
      s"no partition filter in scan:\n$scan")
    assert(!scan.replaceAll("""PushedFilters: \[\]""", "").contains("PushedFilters: ["),
      "lang filter should be a partition filter, not a data filter")
  }

  test("ndjson roundtrip preserves schema") {
    val df = Seq((1L, "alpha"), (2L, "beta")).toDF("k", "v")
    val dir = tmp()
    IO.ndjsonWrite(df, dir)
    val back = IO.ndjsonRead(spark, Seq(dir), Some(df.schema))
    assertSameRows(back, Seq(Seq(1L, "alpha"), Seq(2L, "beta")))
  }

  test("parquetReadArray packs numeric columns into a row-major array") {
    val arr = IO.parquetReadArray(spark,
      Seq(s"$sfDir/lineitem.parquet"),
      Seq("l_quantity", "l_discount", "l_tax"))
    assert(arr.columns.toSeq == Seq("vals"))
    val first = arr.limit(1).collect()(0).getSeq[Double](0)
    assert(first.length == 3)
  }

  test("text source round-trips lines (unicode, tabs, empty) with provenance") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_text_spec").toString
    val df = Seq("héllo wörld", "a\tb\tc", "").toDF("value")
    IO.textWrite(df, dir)
    val back = IO.textRead(spark, Seq(dir))
    assert(back.columns.toSeq == Seq("value"))
    assert(rows(back).map(_(0).asInstanceOf[String]).sorted ==
      Seq("", "a\tb\tc", "héllo wörld"))
    assert(back.select(input_file_name()).distinct().count() >= 1)
  }

  test("Arrow round-trip preserves schema, values, and nulls (column.hpp:200-219)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // the reference's scalar dtype surface, every column with a null
    val schema = StructType(Seq(
      StructField("b", BooleanType), StructField("i8", ByteType),
      StructField("i16", ShortType), StructField("i32", IntegerType),
      StructField("i64", LongType), StructField("f32", FloatType),
      StructField("f64", DoubleType), StructField("s", StringType),
      StructField("ts", TimestampType), StructField("tsntz", TimestampNTZType),
      StructField("d", DateType)))
    val ts = java.sql.Timestamp.valueOf("2024-05-17 12:34:56.789123")
    val ntz = java.time.LocalDateTime.parse("2024-05-17T12:34:56.789123")
    val dt = java.sql.Date.valueOf("2024-05-17")
    val data = Seq(
      Row(true, 1.toByte, 2.toShort, 3, 4L, 1.5f, 2.5, "héllo", ts, ntz, dt),
      Row(false, Byte.MinValue, Short.MaxValue, Int.MinValue, Long.MaxValue,
        -0.0f, Double.MinPositiveValue, "", ts, ntz, dt),
      Row(null, null, null, null, null, null, null, null, null, null, null))
    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(data.asJava, schema)
    val bytes = IO.toArrow(df)
    assert(bytes.length > 0)
    val back = IO.fromArrow(spark, bytes)
    assert(back.schema == df.schema,
      s"schema mismatch:\n${back.schema}\nvs\n${df.schema}")
    assert(rows(back).map(_.toString).sorted == rows(df).map(_.toString).sorted)
    // unsupported dtype fails loudly, not silently
    val bad = spark.createDataFrame(
      Seq(Row(Array(1.0))).asJava,
      StructType(Seq(StructField("v", ArrayType(DoubleType)))))
    val e = intercept[IllegalArgumentException](IO.toArrow(bad))
    assert(e.getMessage.contains("Arrow bridge"))
    // empty frame round-trips schema with zero rows
    val empty = IO.fromArrow(spark, IO.toArrow(df.limit(0)))
    assert(empty.schema == df.schema && empty.count() == 0)
  }

  test("mergeSchema read reconciles evolved files; pre-evolution rows read null") {
    import org.apache.spark.sql.functions._
    val base = java.nio.file.Files.createTempDirectory("graft_evo_spec").toString
    val o = Engine.table(spark, sfDir, "orders")
    val v1 = o.filter(col("o_orderkey") % 2 === 0)
      .select("o_orderkey", "o_totalprice")
    val v2 = o.filter(col("o_orderkey") % 2 =!= 0)
      .select("o_orderkey", "o_totalprice", "o_orderstatus")
    IO.parquetWrite(v1, s"$base/a"); IO.parquetWrite(v2, s"$base/b")
    val merged = IO.parquetReadMergedSchema(spark, Seq(s"$base/a", s"$base/b"))
    assert(merged.columns.toSet ==
      Set("o_orderkey", "o_totalprice", "o_orderstatus"))
    assert(merged.filter(col("o_orderstatus").isNull).count() == v1.count())
    assert(merged.count() == o.count())
    // a plain (single-footer-sample) read of the mixed directory set must
    // NOT silently widen: reading only v1's dir misses the evolved column
    val plain = spark.read.parquet(s"$base/a")
    assert(!plain.columns.contains("o_orderstatus"))
  }

  test("parquet read splits one file across row groups (parquet.cpp:507-606 shape)") {
    // The reference assigns row groups round-robin to ranks inside ONE file
    // (cpp/src/parquet.cpp:507-606). Spark's analogue: FileSourceScanExec
    // splits a single file into byte-range partitions of maxPartitionBytes,
    // and the parquet reader assigns each row group to the split holding its
    // midpoint. Write a single multi-row-group file (small parquet.block
    // .size), then prove (a) the footer really has >1 row group, (b) a read
    // capped at ~one-row-group maxPartitionBytes fans the ONE file out to as
    // many non-empty partitions as there are row groups — intra-file
    // parallelism, not one-task-per-file — and (c) content is intact.
    val dir = tmp()
    val n = 400000L
    spark.range(n).selectExpr("id", "id * 2 as v",
        "repeat(cast(id % 97 as string), 8) as pad")
      .coalesce(1)
      .write.option("parquet.block.size", 256 * 1024)
      .mode("overwrite").parquet(dir)
    val file = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val rowGroups = {
      val conf = spark.sparkContext.hadoopConfiguration
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(new org.apache.hadoop.fs.Path(file.getAbsolutePath), conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getFooter.getBlocks.size finally r.close()
    }
    assert(rowGroups > 1, s"test setup: expected multi-row-group file, got $rowGroups")
    val perSplit = (file.length() / rowGroups).max(1)
    withSQLConf(
      "spark.sql.files.maxPartitionBytes" -> perSplit.toString,
      "spark.sql.files.openCostInBytes" -> "0") {
      val back = spark.read.parquet(dir)
      val counts = back.rdd
        .mapPartitionsWithIndex((i, it) => Iterator((i, it.size))).collect()
      val nonEmpty = counts.count(_._2 > 0)
      assert(counts.length >= rowGroups,
        s"expected >= $rowGroups byte-range splits, got ${counts.length}")
      assert(nonEmpty == rowGroups,
        s"expected $rowGroups non-empty partitions (one per row group), got $nonEmpty")
      assert(back.count() == n)
      assert(back.agg(sum("id")).head.getLong(0) == n * (n - 1) / 2)
    }
  }

  test("skipping index prunes range-clustered files and stays conservative") {
    import graft.sources.Skipping
    val dir = tmp()
    val li = Engine.table(spark, sfDir, "lineitem")
    li.repartitionByRange(8, col("l_shipdate")).sortWithinPartitions("l_shipdate")
      .write.mode("overwrite").parquet(dir)
    val stats = Skipping.buildStats(spark, dir, Seq("l_shipdate", "l_returnflag")).cache()
    assert(stats.filter(col("column") === "l_shipdate").count() == 8)
    def us(sqlTs: String): Double =
      java.sql.Timestamp.valueOf(sqlTs).getTime * 1000.0
    val lo = "1996-06-01 00:00:00"; val hi = "1996-09-01 00:00:00"
    val cands = Skipping.candidateFiles(stats, "l_shipdate", us(lo), us(hi))
    // range-disjoint files + ~4% selectivity ⇒ strictly fewer than all files
    assert(cands.nonEmpty && cands.size < 8,
      s"expected a strict subset of 8 files, got ${cands.size}")
    val pred = (df: org.apache.spark.sql.DataFrame) => df.filter(
      col("l_shipdate") >= lit(java.sql.Timestamp.valueOf(lo)) &&
        col("l_shipdate") < lit(java.sql.Timestamp.valueOf(hi)))
    val pruned = Skipping.readPruned(spark, dir, stats, "l_shipdate",
      us(lo), us(hi), pred)
    assert(pruned.count() == pred(li).count())
    // string stats drive the string prune; 'A' rows exist in every file of
    // an unclustered-on-returnflag layout → conservative full candidate set
    val rf = Skipping.candidateFilesStr(stats, "l_returnflag", "A", "A")
    assert(rf.size == 8)
    // a range wholly outside the data prunes everything, and readPruned
    // still returns a well-formed empty frame
    assert(Skipping.candidateFiles(stats, "l_shipdate", 0.0, 1.0).isEmpty)
    assert(Skipping.readPruned(spark, dir, stats, "l_shipdate", 0.0, 1.0,
      df => df.filter(lit(false))).count() == 0)
    stats.unpersist()
  }

  test("parquet compression codec matrix round-trips byte-identically") {
    // zstd/snappy/gzip/lz4/none all ship in /opt/spark/jars — a 100 TB
    // deployment picks zstd for cold data and lz4/snappy for hot; the
    // engine must read any of them back exactly
    val src = Engine.table(spark, sfDir, "documents")
    val expected = rows(src.orderBy("doc_id")).map(_.toString)
    for (codec <- Seq("zstd", "snappy", "gzip", "lz4", "none")) {
      val dir = tmp()
      src.write.mode("overwrite").option("compression", codec).parquet(dir)
      val back = rows(spark.read.parquet(dir).orderBy("doc_id")).map(_.toString)
      assert(back == expected, s"codec $codec round-trip mismatch")
    }
  }

  test("operators tolerate empty inputs (no rows ≠ no plan)") {
    // filter-to-empty frames must flow through joins, aggs, windows, and
    // the custom operators without throwing — the every-shard-empty case a
    // partition-pruned 100 TB read hits routinely
    import org.apache.spark.sql.expressions.Window
    val li = Engine.table(spark, sfDir, "lineitem").filter(lit(false))
    val o = Engine.table(spark, sfDir, "orders")
    assert(li.groupBy("l_returnflag").agg(sum("l_quantity")).count() == 0)
    assert(li.join(o, li("l_orderkey") === o("o_orderkey")).count() == 0)
    assert(o.join(li, o("o_orderkey") === li("l_orderkey"), "left_semi").count() == 0)
    assert(li.select(row_number().over(
      Window.partitionBy("l_returnflag").orderBy("l_orderkey"))).count() == 0)
    assert(graft.operators.SetOps.distinct(li, Seq("l_orderkey")).count() == 0)
    val emptyDocs = Engine.table(spark, sfDir, "documents").filter(lit(false))
    assert(graft.llm.Dedup.exact(emptyDocs, Seq("text"), "doc_id").count() == 0)
    val emptyPts = Engine.table(spark, sfDir, "embeddings").filter(lit(false))
      .select(col("vec_id").as("id"), lit(0.0).as("x"), lit(0.0).as("y"))
    assert(graft.operators.Spatial.radiusJoin(emptyPts, 0.5).count() == 0)
    assert(graft.operators.RowOps.withRowIndex(li.select("l_orderkey"), "idx",
      Seq(col("l_orderkey"))).count() == 0)
  }

  private def withSQLConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val conf = spark.conf
    val saved = pairs.map { case (k, _) => k -> conf.getOption(k) }
    pairs.foreach { case (k, v) => conf.set(k, v) }
    try body finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}
