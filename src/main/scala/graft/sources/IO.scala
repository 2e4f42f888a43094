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

  /** Schema-evolution read: merge the footers of EVERY file instead of
    * sampling one, so files written before a column existed read as null in
    * the evolved schema — the lakehouse "add a column without rewriting
    * history" path. Spark does the reconciliation per file at scan time
    * (by-name matching); only the footer of each file is extra I/O, the
    * data pages still prune to the requested columns.
    */
  def parquetReadMergedSchema(spark: SparkSession, paths: Seq[String]): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(paths: _*)

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

  /** Bucketed parquet table write (beyond-reference; Spark-native
    * co-location): rows are hash-partitioned into `buckets` files per
    * partition BY CONTENT, and the catalog records the bucketing, so a later
    * join or aggregation on the bucket columns needs NO shuffle at all —
    * at 100 TB this turns every recurring fact-fact join on the same key
    * into a zero-exchange sort-merge join (the co-location the reference
    * gets implicitly from its fixed rank partitioning). `sortCols` adds
    * within-bucket sort order, letting the SMJ skip its sort too.
    */
  /** `maxRecordsPerFile > 0` caps each written file, so a wide bucket splits
    * into several files — the 100 TB shape (executors bound file sizes).
    * The catalog bucketing still co-locates downstream joins/aggregates
    * (zero exchanges); with >1 file per bucket Spark drops the within-bucket
    * sorted property, so a sort-merge join re-sorts inside tasks but still
    * never shuffles (PlanSpec asserts both).
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      buckets: Int,
      bucketCols: Seq[String],
      sortCols: Seq[String] = Nil,
      maxRecordsPerFile: Long = 0L): Unit = {
    require(buckets > 0 && bucketCols.nonEmpty, "need buckets > 0 and >= 1 bucket column")
    // the stale-location cleanup below derives a filesystem path from the
    // table name and recursively deletes it — restrict the name to a plain
    // identifier so a qualified ("db.tbl") or path-like name can never
    // resolve to (and delete) an unintended location
    require(table.matches("[A-Za-z0-9_]+"),
      s"writeBucketed table name must match [A-Za-z0-9_]+, got: $table")
    val spark = df.sparkSession
    // a fresh session's catalog doesn't know tables left by a previous JVM,
    // so DROP alone can't clear a stale warehouse location — remove it too
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    val w0 = df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    val w = if (maxRecordsPerFile > 0) w0.option("maxRecordsPerFile", maxRecordsPerFile) else w0
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** Part-file count of a saved table's warehouse location (gate plumbing for
    * the size-capped-write probe — a driver-side directory listing).
    */
  def tableFileCount(spark: SparkSession, table: String): Int = {
    require(table.matches("[A-Za-z0-9_]+"), s"plain identifier required: $table")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(loc).count(_.getPath.getName.startsWith("part-"))
  }

  /** Small-file compaction: rewrite a parquet directory into files of
    * ~`targetBytes` each (beyond-reference; a 100 TB pipeline necessity —
    * streaming sinks, per-partition writers, and incremental ingest all
    * leave thousands of KB-sized part files whose open/seek overhead then
    * dominates every downstream scan; the NameNode/listing cost alone
    * degrades planning).
    *
    * The output file count is sized from the INPUT's actual on-disk bytes
    * (a driver-side listing — metadata only, no data read), and the rewrite
    * uses `coalesce`, which merges partitions scan-side WITHOUT a shuffle:
    * the whole compaction is one read + one write pass, no exchange. A
    * `repartition` would round-robin every row through a full shuffle for
    * no benefit — content, not placement, is what compaction preserves.
    * Returns the output file count.
    */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetBytes: Long = 128L << 20): Int = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val in = new org.apache.hadoop.fs.Path(inDir)
    val fs = in.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.listStatus(in)
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
      .map(_.getLen).sum
    val nOut = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(inDir).coalesce(nOut).write.mode("overwrite").parquet(outDir)
    val out = new org.apache.hadoop.fs.Path(outDir)
    fs.listStatus(out).count(_.getPath.getName.startsWith("part-"))
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
    *
    * `naFilter=false` (reference: no missing-value detection — an empty
    * string field IS the empty string): string columns are coalesced to ""
    * above the scan. This is exact, not a sentinel trick: with the default
    * `nullValue` the ONLY parse that yields null in a string column is the
    * empty field itself, so `coalesce(c, "")` maps precisely the empty
    * fields and can never misread literal data (an earlier version used a
    * NUL `nullValue` sentinel, which a literal NUL field would collide
    * with). Non-string columns keep null for empty fields — there is no
    * non-lossy in-domain encoding of "empty" for a numeric type.
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
    val df0 = r.csv(paths: _*)
    val df =
      if (naFilter) df0
      else {
        import org.apache.spark.sql.functions.{coalesce, col, lit}
        df0.select(df0.schema.fields.map { f =>
          if (f.dataType == org.apache.spark.sql.types.StringType)
            coalesce(col(f.name), lit("")).as(f.name)
          else col(f.name)
        }.toSeq: _*)
      }
    val selected = if (usecols.isEmpty) df else df.select(usecols.map(df.col): _*)
    if (names.isEmpty) selected else selected.toDF(names: _*)
  }

  def csvWrite(df: DataFrame, dir: String, delimiter: String = ",", header: Boolean = true): Unit =
    df.write.mode("overwrite")
      .option("sep", delimiter)
      .option("header", header.toString)
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")
      .csv(dir)

  /** Plain-text source, one record per line (beyond-reference; the
    * reference is parquet/csv/json only): the common raw-corpus ingestion
    * format for LLM pipelines — one document per line, fields TSV-packed.
    * Returns a single string column `value`; pair with `input_file_name()`
    * for provenance. The scan splits files at newline boundaries like CSV,
    * so a 100 TB line-corpus reads with full parallelism and column-free
    * pruning (there is only one column to read).
    */
  def textRead(spark: SparkSession, paths: Seq[String]): DataFrame =
    spark.read.text(paths: _*)

  /** One line per row; `df` must be a single string column. */
  def textWrite(df: DataFrame, dir: String): Unit =
    df.write.mode("overwrite").text(dir)

  /** ndjson scan (dsl/ir.py:393-398): newline-delimited JSON. */
  def ndjsonRead(spark: SparkSession, paths: Seq[String], schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
    schema.fold(r)(s => r.schema(s)).json(paths: _*)
  }

  def ndjsonWrite(df: DataFrame, dir: String): Unit =
    df.write.mode("overwrite").json(dir)

  // ───────────────────────── Arrow interop ─────────────────────────
  // The reference's to/from-Arrow surface (core/column.hpp:200-219,320-328,
  // core/table.hpp:328-336) is a BLOCKING gather/scatter between client and
  // cluster — it exists for interop with client-side Arrow tooling, not as a
  // distributed data path. The Spark analogue is the same shape: toArrow
  // collects to the driver and serializes one Arrow IPC stream; fromArrow
  // parses a stream and parallelizes it back out. Use parquet for anything
  // that shouldn't fit on the driver.

  /** Supported dtype surface of the Arrow bridge: the reference's scalar
    * types (utils.cpp:30-94) that Spark has natively.
    */
  private def arrowField(f: org.apache.spark.sql.types.StructField): org.apache.arrow.vector.types.pojo.Field = {
    import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType}
    import org.apache.arrow.vector.types.{FloatingPointPrecision, TimeUnit}
    import org.apache.spark.sql.types._
    val t: ArrowType = f.dataType match {
      case BooleanType => ArrowType.Bool.INSTANCE
      case ByteType => new ArrowType.Int(8, true)
      case ShortType => new ArrowType.Int(16, true)
      case IntegerType => new ArrowType.Int(32, true)
      case LongType => new ArrowType.Int(64, true)
      case FloatType => new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE)
      case DoubleType => new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
      case StringType => ArrowType.Utf8.INSTANCE
      case TimestampType => new ArrowType.Timestamp(TimeUnit.MICROSECOND, "UTC")
      // tz-naive micros — the reference's stored temporal physical
      // (utils.cpp:72-89); Arrow encodes "no timezone" as a null tz
      case TimestampNTZType => new ArrowType.Timestamp(TimeUnit.MICROSECOND, null)
      case DateType => new ArrowType.Date(org.apache.arrow.vector.types.DateUnit.DAY)
      case other => throw new IllegalArgumentException(
        s"Arrow bridge does not support $other (column ${f.name})")
    }
    new Field(f.name, new FieldType(f.nullable, t, null), java.util.Collections.emptyList())
  }

  /** Gather a DataFrame to the client as ONE Arrow IPC stream (schema +
    * record batch), like the reference's `to_arrow`. Blocking and
    * driver-sized by design.
    */
  def toArrow(df: DataFrame): Array[Byte] = {
    import org.apache.arrow.memory.RootAllocator
    import org.apache.arrow.vector._
    import org.apache.arrow.vector.ipc.ArrowStreamWriter
    import org.apache.arrow.vector.types.pojo.Schema
    import org.apache.spark.sql.types._
    import scala.jdk.CollectionConverters._
    val rows = df.collect()
    val schema = df.schema
    val arrowSchema = new Schema(schema.fields.map(arrowField).toSeq.asJava)
    val allocator = new RootAllocator()
    try {
      val root = VectorSchemaRoot.create(arrowSchema, allocator)
      try {
        root.setRowCount(rows.length)
        schema.fields.zipWithIndex.foreach { case (f, i) =>
          val v = root.getVector(i)
          v.setInitialCapacity(rows.length)
          // allocate before set: fixed-width setSafe grows as needed, but an
          // explicit allocate keeps the loop allocation-free
          v.asInstanceOf[ValueVector].allocateNew()
          rows.zipWithIndex.foreach { case (r, j) =>
            if (r.isNullAt(i)) () // vectors default to null
            else f.dataType match {
              case BooleanType => v.asInstanceOf[BitVector].setSafe(j, if (r.getBoolean(i)) 1 else 0)
              case ByteType => v.asInstanceOf[TinyIntVector].setSafe(j, r.getByte(i))
              case ShortType => v.asInstanceOf[SmallIntVector].setSafe(j, r.getShort(i))
              case IntegerType => v.asInstanceOf[IntVector].setSafe(j, r.getInt(i))
              case LongType => v.asInstanceOf[BigIntVector].setSafe(j, r.getLong(i))
              case FloatType => v.asInstanceOf[Float4Vector].setSafe(j, r.getFloat(i))
              case DoubleType => v.asInstanceOf[Float8Vector].setSafe(j, r.getDouble(i))
              case StringType => v.asInstanceOf[VarCharVector]
                .setSafe(j, r.getString(i).getBytes("UTF-8"))
              case TimestampType => v.asInstanceOf[TimeStampMicroTZVector]
                .setSafe(j, org.apache.spark.sql.catalyst.util.DateTimeUtils
                  .instantToMicros(r.getTimestamp(i).toInstant))
              case TimestampNTZType => v.asInstanceOf[TimeStampMicroVector]
                .setSafe(j, org.apache.spark.sql.catalyst.util.DateTimeUtils
                  .localDateTimeToMicros(r.getAs[java.time.LocalDateTime](i)))
              case DateType => v.asInstanceOf[DateDayVector]
                .setSafe(j, r.getDate(i).toLocalDate.toEpochDay.toInt)
              case other => throw new IllegalArgumentException(s"unreachable: $other")
            }
          }
          v.setValueCount(rows.length)
        }
        val out = new java.io.ByteArrayOutputStream()
        val writer = new ArrowStreamWriter(root, null, out)
        writer.start(); writer.writeBatch(); writer.end(); writer.close()
        out.toByteArray
      } finally root.close()
    } finally allocator.close()
  }

  /** Scatter an Arrow IPC stream back into a DataFrame (the reference's
    * `from_arrow`): parse on the client, `createDataFrame` distributes.
    */
  def fromArrow(spark: SparkSession, bytes: Array[Byte]): DataFrame = {
    import org.apache.arrow.memory.RootAllocator
    import org.apache.arrow.vector._
    import org.apache.arrow.vector.ipc.ArrowStreamReader
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    import scala.jdk.CollectionConverters._
    val allocator = new RootAllocator()
    try {
      val reader = new ArrowStreamReader(new java.io.ByteArrayInputStream(bytes), allocator)
      try {
        val root = reader.getVectorSchemaRoot
        val fields = root.getSchema.getFields.asScala.toSeq
        val sparkSchema = StructType(fields.map { f =>
          import org.apache.arrow.vector.types.pojo.ArrowType
          val dt = f.getType match {
            case _: ArrowType.Bool => BooleanType
            case i: ArrowType.Int if i.getIsSigned => i.getBitWidth match {
              case 8 => ByteType; case 16 => ShortType
              case 32 => IntegerType; case 64 => LongType
              case w => throw new IllegalArgumentException(s"int width $w")
            }
            case fp: ArrowType.FloatingPoint =>
              if (fp.getPrecision == org.apache.arrow.vector.types.FloatingPointPrecision.SINGLE)
                FloatType else DoubleType
            case _: ArrowType.Utf8 => StringType
            case t: ArrowType.Timestamp =>
              if (t.getTimezone == null) TimestampNTZType else TimestampType
            case _: ArrowType.Date => DateType
            case other => throw new IllegalArgumentException(
              s"Arrow bridge does not support $other (column ${f.getName})")
          }
          StructField(f.getName, dt, f.isNullable)
        })
        val rows = scala.collection.mutable.ArrayBuffer.empty[Row]
        while (reader.loadNextBatch()) {
          (0 until root.getRowCount).foreach { j =>
            rows += Row.fromSeq(fields.indices.map { i =>
              val v = root.getVector(i)
              if (v.isNull(j)) null
              else v match {
                case b: BitVector => b.get(j) == 1
                case b: TinyIntVector => b.get(j)
                case b: SmallIntVector => b.get(j)
                case b: IntVector => b.get(j)
                case b: BigIntVector => b.get(j)
                case b: Float4Vector => b.get(j)
                case b: Float8Vector => b.get(j)
                case b: VarCharVector => new String(b.get(j), "UTF-8")
                case b: TimeStampMicroTZVector => java.sql.Timestamp.from(
                  org.apache.spark.sql.catalyst.util.DateTimeUtils.microsToInstant(b.get(j)))
                case b: TimeStampMicroVector =>
                  org.apache.spark.sql.catalyst.util.DateTimeUtils.microsToLocalDateTime(b.get(j))
                case b: DateDayVector => java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(b.get(j)))
                case other => throw new IllegalArgumentException(
                  s"Arrow bridge does not support vector ${other.getClass}")
              }
            })
          }
        }
        spark.createDataFrame(rows.asJava, sparkSchema)
      } finally reader.close()
    } finally allocator.close()
  }
}
