package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads modeled as
  * opaque `binary` columns with a typed metadata struct, plus
  * feature-extraction / frame-sampling operators whose Spark-side
  * shape (schema, partitioning, batch iteration) is real while the
  * actual codec call is STUBBED — the image/audio libraries are not in
  * this container, so decode is a clearly-marked deterministic fake.
  *
  * Scale notes: payloads stay as parquet binary (no base64 inflation);
  * per-item work is map-only; [[decodeBatch]] shows the
  * mapPartitions batch pattern (the Scala analog of mapInPandas) so a
  * real codec would amortize model/codec init per partition, not per
  * row.
  */
object Multimodal {

  val MetadataSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  /** Wrap a string column as a binary payload + metadata struct — the
    * ingestion boundary where real pipelines read image bytes. */
  def asMedia(df: DataFrame, payloadCol: String, mediaType: String): DataFrame =
    df.withColumn("content", col(payloadCol).cast("binary"))
      .withColumn("media_meta", struct(
        lit(mediaType).as("media_type"),
        pmod(xxhash64(col(payloadCol)), lit(1920)).cast("int").as("width"),
        pmod(xxhash64(lit(1), col(payloadCol)), lit(1080)).cast("int").as("height"),
        (length(col(payloadCol)) * 40L).cast("bigint").as("duration_ms")))

  /** STUB decode — deterministic fake features in place of a codec.
    * A real deployment replaces the body with e.g. a JNI/FFI image
    * decode; the signature (binary → fixed-width float vector) and the
    * column-level contract are what the engine guarantees. */
  def decodeFeaturesStub(content: Column, dim: Int = 8): Column =
    transform(sequence(lit(0), lit(dim - 1)), i =>
      (pmod(xxhash64(i, content), lit(1000)).cast("double") / lit(1000.0)))

  /** STUB resize: deterministic stride-downsample of the payload to at
    * most `targetBytes` (a real deployment decodes, resamples pixels,
    * re-encodes — the contract here is binary → smaller binary with a
    * bounded size, which is what downstream batching relies on). */
  def resizeStub(targetBytes: Int) =
    org.apache.spark.sql.functions.udf { (bytes: Array[Byte]) =>
      if (bytes == null) null
      else if (bytes.length <= targetBytes) bytes
      else {
        val stride = bytes.length.toDouble / targetBytes
        Array.tabulate(targetBytes)(i => bytes((i * stride).toInt))
      }
    }

  /** Frame sampling: every `stride` bytes, cut a `frameLen`-byte slice —
    * the video-keyframe access pattern over an opaque payload. */
  def sampleFrames(content: Column, stride: Int, frameLen: Int): Column =
    transform(
      sequence(lit(0),
        greatest(floor((length(content) - lit(frameLen)).cast("double") / lit(stride))
          .cast("int"), lit(0))),
      i => substring(content, (i * stride + 1).cast("int"), lit(frameLen)))

  /** Partition sizing for decode stages: media payloads are wildly
    * variable-width, so row-count partitioning leaves some tasks with
    * 10× the bytes. Total bytes come from file-level metadata
    * (filesystem status of the scan's input files — no content pass,
    * no job), then a round-robin repartition targets `targetBytes` per
    * task — the knob that keeps codec stages balanced and spill-free.
    * Media payloads are already-compressed codec bytes, so compressed
    * file size ≈ payload bytes; for non-file-backed inputs (tests,
    * derived frames) the fallback is one scalar aggregate over the
    * content column. */
  def repartitionByPayloadBytes(df: DataFrame, contentCol: String,
      targetBytes: Long = 128L << 20): DataFrame = {
    val (nFiles, fileBytes) = graft.Tables.scanFileBytes(df)
    val total =
      if (nFiles > 0) fileBytes
      else df.agg(sum(length(col(contentCol)).cast("bigint")))
        .head().getLong(0)
    val parts = math.max(1, math.ceil(total.toDouble / targetBytes).toInt)
    df.repartition(parts)
  }

  /** Batch decode via mapPartitions — the Scala analog of a Pandas UDF
    * over mapInPandas: codec/model state would be initialized once per
    * partition (`???` marks where the real library call goes; the
    * deterministic fallback keeps the plumbing testable). */
  def decodeBatch(df: DataFrame, contentCol: String, useRealCodec: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    import org.apache.spark.sql.Row
    val outSchema = StructType(df.schema.fields :+
      StructField("decoded_len", LongType))
    val rdd = df.rdd.mapPartitions { rows =>
      // per-partition init happens here (codec handle, model weights…)
      if (useRealCodec) ??? // real image/audio decoder: not in container
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](contentCol)
        Row.fromSeq(r.toSeq :+ (if (bytes == null) 0L else bytes.length.toLong))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
