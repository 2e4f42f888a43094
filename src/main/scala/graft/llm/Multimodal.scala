package graft.llm

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: images/audio/video as opaque `binary` payloads
  * with a typed metadata struct, plus a decode / feature-extract stage.
  *
  * The Spark-side plumbing (schema, partition-wise batched processing,
  * deterministic output shape) is real; the actual media decode is STUBBED
  * behind [[Decoder]] — the container has no image/audio codecs, so the
  * default decoder derives deterministic fake features from the raw bytes.
  * Swapping in a real decoder (JNI/ffmpeg/javacv) changes no plan shape: the
  * stage stays a row-local `mapPartitions` with no shuffle, which is exactly
  * how a 100 TB media pipeline wants decode parallelized.
  */
object Multimodal {

  /** Canonical multimodal schema: id + opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType, nullable = true),
      StructField("source", StringType, nullable = true),
      StructField("n_bytes", LongType, nullable = true))), nullable = true)))

  /** Pluggable decode step. Implementations must be deterministic per payload. */
  trait Decoder extends Serializable {
    /** (width, height, channels, features) — features fixed-length. */
    def decode(payload: Array[Byte]): (Int, Int, Int, Array[Double])
  }

  /** STUB decoder: no codecs in this environment. Emits deterministic
    * pseudo-features from byte statistics so the pipeline shape is testable;
    * a real implementation would decode pixels/samples here.
    */
  object FakeImageDecoder extends Decoder {
    def decode(payload: Array[Byte]): (Int, Int, Int, Array[Double]) = {
      val n = if (payload == null) 0 else payload.length
      val side = math.max(1, math.sqrt(n.toDouble).toInt)
      val sum = if (n == 0) 0L else payload.foldLeft(0L)((a, b) => a + (b & 0xFF))
      val mean = if (n == 0) 0.0 else sum.toDouble / n
      val feats = Array.tabulate(8) { i =>
        if (n == 0) 0.0
        else payload.iterator.zipWithIndex.filter(_._2 % 8 == i)
          .map(x => (x._1 & 0xFF).toDouble).sum / math.max(1, (n + 7 - i) / 8)
      }
      (side, side, 3, feats :+ mean take 8)
    }
  }

  /** Wrap a text table as a multimodal table (payload = utf-8 bytes). Used by
    * tests/queries since the testdata has no real media; real pipelines read
    * payloads from parquet binary columns directly.
    */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("text/plain").as("mime"),
        col("source").as("source"),
        length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes")).as("meta"))

  private val decodedSchema = StructType(mediaSchema.fields ++ Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("features", ArrayType(DoubleType))))

  /** Decode / feature-extract stage: row-local mapPartitions, batched per
    * partition, schema known up front. No shuffle; scales with input splits.
    */
  def decodeStage(media: DataFrame, decoder: Decoder = FakeImageDecoder): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(decodedSchema)
    media.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val (w, h, c, feats) = decoder.decode(payload)
        Row.fromSeq(r.toSeq ++ Seq(w, h, c, feats.toSeq))
      }
    }(enc)
  }

  /** Pluggable resize step (stub: no codecs in this container). */
  trait Resizer extends Serializable {
    def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte]
  }

  /** STUB resizer: deterministic byte subsampling to w*h bytes — a real
    * implementation would decode, scale, re-encode. The plan shape (row-local
    * map, payload size change, meta update) is what downstream code sees.
    */
  object FakeResizer extends Resizer {
    def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val n = if (payload == null) 0 else payload.length
      val target = math.max(1, w * h)
      if (n == 0) new Array[Byte](0)
      else Array.tabulate(math.min(target, n))(i => payload((i.toLong * n / target).toInt))
    }
  }

  /** Resize stage: row-local mapPartitions, payload replaced, meta.n_bytes
    * updated. No shuffle; scales with input splits.
    */
  def resizeStage(media: DataFrame, w: Int, h: Int, resizer: Resizer = FakeResizer): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(mediaSchema)
    media.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val out = resizer.resize(payload, w, h)
        val meta = r.getAs[Row]("meta")
        Row(r.getAs[Long]("media_id"), out,
          Row(meta.getAs[String]("mime"), meta.getAs[String]("source"), out.length.toLong))
      }
    }(enc)
  }

  private val frameSchema = StructType(Seq(
    StructField("media_id", LongType),
    StructField("frame_idx", IntegerType),
    StructField("frame", BinaryType)))

  /** Frame-sampling stage: one input row (video payload) → N frame rows —
    * the cardinality-changing flatMap of a video pipeline. STUB: frames are
    * fixed-size payload chunks; a real decoder would demux + decode. Emits
    * every `everyN`-th frame up to `maxFrames`.
    */
  def frameSampleStage(
      media: DataFrame,
      frameBytes: Int = 64,
      everyN: Int = 2,
      maxFrames: Int = 8): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(frameSchema)
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getAs[Long]("media_id")
        val payload = r.getAs[Array[Byte]]("payload")
        val n = if (payload == null) 0 else payload.length
        val total = (n + frameBytes - 1) / frameBytes
        (0 until total by everyN).take(maxFrames).map { f =>
          val from = f * frameBytes
          Row(id, f, java.util.Arrays.copyOfRange(payload, from, math.min(from + frameBytes, n)))
        }
      }
    }(enc)
  }

  /** Cheap columnar metadata pass (no decode): sizes + content digest —
    * the kind of stats pass a media pipeline runs before heavy decode.
    */
  def payloadStats(media: DataFrame): DataFrame =
    media.select(
      col("media_id"),
      col("meta.mime").as("mime"),
      length(col("payload")).cast("long").as("byte_len"),
      sha2(col("payload"), 256).as("digest"),
      crc32(col("payload")).as("crc"))
}
