package graft.ext

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata,
  * decoded/feature-extracted per partition (builder prompt: multimodal
  * columns; image/audio libs aren't in this container so the codec is a
  * STUB — the Spark-side plumbing (schema, batch iteration, partition
  * streaming) is real and tested).
  *
  * Scale notes: payloads stay columnar until the decode projection;
  * `mapPartitions` streams row batches (no per-group materialization),
  * so executor memory is bounded by one payload at a time. At 100 TB the
  * decode stage parallelizes per input split; feature rows are narrow so
  * the downstream shuffle carries features, never raw media bytes.
  */
object Multimodal {

  /** documents → a media table: payload = utf-8 bytes standing in for an
    * encoded image/audio blob, with typed metadata alongside.
    *
    * The DuckDB oracles for the media queries (mm_decode, mm_phash, …)
    * read per-CHARACTER codepoints while this side reads per-BYTE
    * payload values; the two agree only while the corpus is pure ASCII
    * (1 byte = 1 codepoint). Rather than letting a future non-ASCII
    * fixture surface as an inscrutable oracle hash mismatch, the stub
    * fails loudly on the first multi-byte document: octet_length ==
    * char length iff ASCII, and `when` evaluates raise_error only on
    * the violating rows (a codegen'd per-row comparison, ~free).
    */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      lit("text/plain").as("kind"),
      when(octet_length(col("text")) =!= length(col("text")),
        raise_error(concat(
          lit("mediaTable stub requires an ASCII corpus (byte-hash " +
            "oracles assume 1 byte per char); non-ASCII doc_id="),
          col("doc_id").cast("string"))).cast("binary"))
        .otherwise(expr("encode(text, 'utf-8')")).as("payload"),
      struct(
        expr("octet_length(encode(text, 'utf-8'))").as("n_bytes"),
        col("lang").as("tag")).as("meta"))

  /** Real filesystem ingestion for media blobs: Spark's `binaryFile`
    * source reads whole files as (path, modificationTime, length,
    * content), parallelized per file across executors — the actual
    * landing path for an image/audio corpus at 100 TB (the synthetic
    * [[mediaTable]] stands in for it in the oracle-gated queries).
    * doc_id contract: the digits in the file NAME when present (stable
    * across re-runs and listings — the caller owns uniqueness under
    * its naming scheme), else a 64-bit hash of the full file name, so
    * a digit-less file never lands a null id (a null would NPE every
    * downstream decode stub). kind comes from the extension; the
    * payload stays columnar until a decode projection
    * ([[decodeFeatures]]/[[resize]]/[[frameSample]]) consumes it.
    * `glob` pushes the file filter into the listing (pathGlobFilter),
    * so non-matching files are never opened.
    */
  def readMediaDir(spark: SparkSession, dir: String,
      glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        // try_cast, not cast: no digits → '' and >19-digit runs both
        // yield null here (ANSI cast would throw) and fall through to
        // the name hash.
        coalesce(
          expr("try_cast(regexp_extract(path, '(\\\\d+)[^/]*$', 1) AS BIGINT)"),
          abs(xxhash64(regexp_extract(col("path"), "([^/]+)$", 1))))
          .as("doc_id"),
        regexp_extract(col("path"), "\\.([A-Za-z0-9]+)$", 1).as("kind"),
        col("content").as("payload"),
        struct(col("length").as("n_bytes"),
          lit("file").as("tag")).as("meta"))

  private val featSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", LongType),
    StructField("first_byte", LongType),
    StructField("last_byte", LongType),
    StructField("n_spaces", LongType)))

  private val thumbSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("thumb", BinaryType),
    StructField("thumb_bytes", LongType),
    StructField("first_byte", LongType)))

  /** "Resize": downsample the payload by keeping every `stride`-th byte
    * (STUB for image resize — the 1:1 binary→binary transform shape,
    * streamed per partition). */
  def resize(media: DataFrame, stride: Int): DataFrame = {
    val idIdx = media.schema.fieldIndex("doc_id")
    val plIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { it: Iterator[Row] =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](plIdx)
        val out = new Array[Byte]((bytes.length + stride - 1) / stride)
        var i = 0
        while (i < out.length) { out(i) = bytes(i * stride); i += 1 }
        Row(r.getAs[Number](idIdx).longValue, out, out.length.toLong,
          if (out.nonEmpty) (out(0) & 0xff).toLong else 0L)
      }
    }(Encoders.row(thumbSchema))
  }

  private val frameSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("frame_idx", LongType),
    StructField("frame_bytes", LongType),
    StructField("frame_first", LongType)))

  /** "Frame-sample": split the payload into fixed-size frames and emit
    * one row per frame (STUB for video frame extraction — the 1:N
    * binary→rows generator shape). */
  def frameSample(media: DataFrame, frameSize: Int): DataFrame = {
    val idIdx = media.schema.fieldIndex("doc_id")
    val plIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { it: Iterator[Row] =>
      it.flatMap { r =>
        val id = r.getAs[Number](idIdx).longValue
        val bytes = r.getAs[Array[Byte]](plIdx)
        val n = (bytes.length + frameSize - 1) / frameSize
        (0 until n).iterator.map { f =>
          val start = f * frameSize
          val len = math.min(frameSize, bytes.length - start)
          Row(id, f.toLong, len.toLong, (bytes(start) & 0xff).toLong)
        }
      }
    }(Encoders.row(frameSchema))
  }

  private val rmsSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("frame_idx", LongType),
    StructField("n_samples", LongType),
    StructField("energy", LongType)))

  /** "Audio RMS": per-frame energy over the payload treated as 8-bit
    * PCM samples (STUB for audio decode — the real pipeline would
    * decompress first; the frame/energy plumbing is the real shape).
    * Energy folds as EXACT long sums inside the scan task; only
    * (doc_id, frame_idx, two longs) ever leave it. */
  def audioRms(media: DataFrame, frameSize: Int): DataFrame = {
    val idIdx = media.schema.fieldIndex("doc_id")
    val plIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { it: Iterator[Row] =>
      it.flatMap { r =>
        val id = r.getAs[Number](idIdx).longValue
        val raw = r.getAs[Array[Byte]](plIdx)
        val bytes = if (raw == null) Array.emptyByteArray else raw
        val n = (bytes.length + frameSize - 1) / frameSize
        (0 until n).iterator.map { f =>
          val start = f * frameSize
          val len = math.min(frameSize, bytes.length - start)
          var e = 0L
          var i = start
          while (i < start + len) {
            val v = (bytes(i) & 0xff).toLong; e += v * v; i += 1
          }
          Row(id, f.toLong, len.toLong, e)
        }
      }
    }(Encoders.row(rmsSchema))
  }

  private val phashSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("phash", LongType)))

  /** Average-hash perceptual fingerprint (STUB for image pHash — the
    * real pipeline would decode + grayscale + 8×8 downsample first):
    * sample `maxPixels` evenly-strided bytes, set bit i when pixel i is
    * at or above the sample mean. Near-identical payloads land on the
    * same 32-bit key, so media-level near-dup detection becomes a
    * groupBy on an 8-byte hash — the bytes themselves never shuffle.
    * 32 pixels keeps the distinct-powers sum positive in an int64 on
    * both engines (bit 63 would flip the sign and invite cross-engine
    * overflow drift).
    */
  def avgHash(media: DataFrame, maxPixels: Int = 32): DataFrame = {
    val idIdx = media.schema.fieldIndex("doc_id")
    val plIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { it: Iterator[Row] =>
      it.map { r =>
        val id = r.getAs[Number](idIdx).longValue
        // null payload (null text upstream) hashes like an empty one —
        // the oracle mirrors via coalesce(text, '')
        val raw = r.getAs[Array[Byte]](plIdx)
        val bytes = if (raw == null) Array.emptyByteArray else raw
        val n = bytes.length
        val k = math.min(maxPixels, n)
        var hash = 0L
        if (k > 0) {
          val stride = math.max(1, n / maxPixels)
          var sum = 0L
          var i = 0
          while (i < k) { sum += (bytes(i * stride) & 0xff).toLong; i += 1 }
          val mean = sum.toDouble / k.toDouble
          i = 0
          while (i < k) {
            if ((bytes(i * stride) & 0xff).toDouble >= mean) hash |= 1L << i
            i += 1
          }
        }
        Row(id, hash)
      }
    }(Encoders.row(phashSchema))
  }

  /** "Decode" each payload into fixed-width features.
    *
    * STUB decoder: a real implementation would hand `payload` to an
    * image/audio codec here (e.g. JPEG decode → resize → embed); this
    * deterministic byte-level fake keeps the contract — bytes in,
    * fixed-schema feature row out — testable without native codecs.
    */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val idIdx = media.schema.fieldIndex("doc_id")
    val plIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { it: Iterator[Row] =>
      it.map { r =>
        val id = r.getAs[Number](idIdx).longValue
        val bytes = r.getAs[Array[Byte]](plIdx)
        var spaces = 0L
        var i = 0
        while (i < bytes.length) { if (bytes(i) == 0x20) spaces += 1; i += 1 }
        Row(id, bytes.length.toLong,
          if (bytes.nonEmpty) (bytes(0) & 0xff).toLong else 0L,
          if (bytes.nonEmpty) (bytes(bytes.length - 1) & 0xff).toLong else 0L,
          spaces)
      }
    }(Encoders.row(featSchema))
  }
}
