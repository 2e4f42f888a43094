package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Sources & sinks (SURVEY §2.1): parquet / csv / ndjson read+write with the
  * reference's option surface.
  *
  * Scale notes: Spark's parquet reader already does everything the reference's
  * hand-rolled reader does (row-group splitting across tasks, projection
  * pushdown) plus predicate pushdown into row-group stats and vectorized
  * decode. Writes produce one part file per partition, exactly the reference's
  * `part-<i>.parquet` layout (cpp/src/parquet.cpp:492-506).
  */
object IO {

  /** `parquet_read(glob, columns?)` (parquet.hpp:123-125). Globs are expanded
    * and string-sorted by Spark's InMemoryFileIndex like the reference's
    * glob-sort (parquet.hpp:116).
    */
  def parquetRead(spark: SparkSession, paths: Seq[String], columns: Seq[String] = Nil): DataFrame = {
    val df = spark.read.parquet(paths: _*)
    if (columns.isEmpty) df else df.select(columns.map(df.col): _*)
  }

  def parquetWrite(df: DataFrame, dir: String): Unit =
    df.write.mode("overwrite").parquet(dir)

  /** Hive-partitioned parquet write: one directory per distinct value of
    * `partitionCols` (`dir/col=value/part-*.parquet`). At 100 TB this is the
    * difference between scanning everything and scanning one partition:
    * filters on the partition columns prune to matching directories at
    * PLANNING time (PartitionFilters in the scan, zero I/O for pruned
    * partitions). Choose low-cardinality columns (date, lang, source);
    * `maxRecordsPerFile` caps file size for wide partitions.
    */
  def parquetWritePartitioned(
      df: DataFrame,
      dir: String,
      partitionCols: Seq[String],
      maxRecordsPerFile: Long = 0L): Unit = {
    val w = df.write.mode("overwrite").partitionBy(partitionCols: _*)
    (if (maxRecordsPerFile > 0) w.option("maxRecordsPerFile", maxRecordsPerFile) else w)
      .parquet(dir)
  }

  /** ORC read/write (beyond-reference; the reference is parquet/csv/json
    * only). ORC ships in Spark, keeps the same pushdown/pruning surface as
    * parquet (PushedFilters + ReadSchema reach the scan), and is the common
    * interchange format with Hive-era warehouses — a migration path for
    * corpora that are not parquet yet.
    */
  def orcRead(spark: SparkSession, paths: Seq[String], columns: Seq[String] = Nil): DataFrame = {
    val df = spark.read.orc(paths: _*)
    if (columns.isEmpty) df else df.select(columns.map(df.col): _*)
  }

  def orcWrite(df: DataFrame, dir: String): Unit =
    df.write.mode("overwrite").orc(dir)

  /** `parquet_read_array` (parquet.hpp:138-141): read numeric columns of a
    * parquet file as one array<double> column (row-major 2-D array view) —
    * the reference's zero-copy-to-cuPyNumeric path; on Spark the analogue is
    * a packed array column feeding ML-style consumers.
    */
  def parquetReadArray(spark: SparkSession, paths: Seq[String], columns: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.{array, col}
    spark.read.parquet(paths: _*)
      .select(array(columns.map(c => col(c).cast("double")): _*).as("vals"))
  }

  /** `csv_read(glob, dtypes, delimiter, usecols, names, na_filter)`
    * (csv.hpp:96-101). Explicit schema required, as in the reference.
    * `usecols` keeps only the named schema columns (in the given order) —
    * the projection reaches the CSV scan, so unused columns are never
    * fully parsed; `names` renames the kept columns positionally.
    */
  def csvRead(
      spark: SparkSession,
      paths: Seq[String],
      schema: StructType,
      delimiter: String = ",",
      header: Boolean = true,
      naFilter: Boolean = true,
      usecols: Seq[String] = Nil,
      names: Seq[String] = Nil): DataFrame = {
    require(
      names.isEmpty ||
        names.length == (if (usecols.isEmpty) schema.length else usecols.length),
      s"names (${names.length}) must match the selected column count")
    val r = spark.read
      .schema(schema)
      .option("sep", delimiter)
      .option("header", header.toString)
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")
    val r2 = if (naFilter) r.option("nullValue", "") else r.option("nullValue", "\u0000")
    val df = r2.csv(paths: _*)
    val selected = if (usecols.isEmpty) df else df.select(usecols.map(df.col): _*)
    if (names.isEmpty) selected else selected.toDF(names: _*)
  }

  def csvWrite(df: DataFrame, dir: String, delimiter: String = ",", header: Boolean = true): Unit =
    df.write.mode("overwrite")
      .option("sep", delimiter)
      .option("header", header.toString)
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")
      .csv(dir)

  /** ndjson scan (dsl/ir.py:393-398): newline-delimited JSON. */
  def ndjsonRead(spark: SparkSession, paths: Seq[String], schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
    schema.fold(r)(s => r.schema(s)).json(paths: _*)
  }

  def ndjsonWrite(df: DataFrame, dir: String): Unit =
    df.write.mode("overwrite").json(dir)
}
