package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads as opaque `binary`
  * columns with typed metadata, processed per-partition in bounded
  * batches (SURVEY.md §2.C multimodal row).
  *
  * The container has no image/audio codecs, so `decodeStub` is a
  * clearly-marked deterministic fake — but everything Spark-side is
  * real and is exactly what a production decode needs: a binary
  * payload column, a metadata struct, `mapPartitions` execution (one
  * decoder init per partition, not per row — the Scala analog of a
  * pandas-batch UDF), and partition sizing controlled upstream by
  * `spark.sql.files.maxPartitionBytes` so a partition of blobs fits in
  * executor memory.
  */
object Multimodal {

  /** A decoded frame/feature record produced by the stub decoder. */
  final case class MediaFeature(
      doc_id: Long, format: String, byte_len: Long,
      frame_idx: Int, feature: Double)

  /** Documents' text re-cast as the binary payload fixture: (doc_id,
    * payload BINARY, meta struct).  In production this column comes
    * from the media store; shape and pruning behavior are identical.
    */
  def payloads(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      struct(
        col("source").as("origin"),
        col("n_chars").as("declared_len"),
        col("lang").as("tag")).as("meta"))

  /** Cheap metadata pass: length + content hash + format sniff, all
    * codegen'd builtins over the binary column (no decode needed) —
    * the "is this payload what its metadata claims" validation query.
    */
  def metadata(spark: SparkSession, dir: String): DataFrame =
    payloads(spark, dir).select(
      col("doc_id"),
      octet_length(col("payload")).cast("long").as("byte_len"),
      md5(col("payload")).as("content_md5"),
      // format sniff: first byte class stands in for magic-number checks
      when(substring(col("payload").cast("string"), 1, 1).rlike("[a-m]"), "typeA")
        .otherwise("typeB").as("sniffed_format"))

  /** STUB DECODER — deterministic fake in place of a real codec.
    * Real implementation would init a codec per partition and emit
    * decoded frames/features; the fake derives "frames" from byte
    * content so tests exercise the full iterator contract, schema, and
    * batch shape.  Frame count = byte_len / 100 (capped 4), feature =
    * mean byte value of the frame's slice.
    */
  def decodeFeatures(spark: SparkSession, dir: String, framesCap: Int = 4): Dataset[MediaFeature] = {
    import spark.implicits._
    payloads(spark, dir)
      .select(col("doc_id"), col("payload"), col("meta.tag").as("tag"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { rows =>
        // per-partition decoder init happens HERE in production (??? -> codec)
        rows.flatMap { case (id, bytes, _) =>
          val nFrames = math.min(math.max(bytes.length / 100, 1), framesCap)
          (0 until nFrames).iterator.map { f =>
            val slice = bytes.slice(f * 100, math.min((f + 1) * 100, bytes.length))
            val mean = if (slice.isEmpty) 0.0 else slice.map(_.toInt & 0xff).sum.toDouble / slice.length
            MediaFeature(id, "stub/v1", bytes.length.toLong, f, math.round(mean * 1e6) / 1e6)
          }
        }
      }
  }

  /** Frame-sample aggregate over the decoded features (the downstream
    * consumer shape: per-payload feature summary).
    *
    * The 1e-6 rounding replicates the stub's own `math.round(x·1e6)/1e6`
    * (floor(x+0.5), exact in both engines) instead of `round(col, 6)`,
    * whose HALF_UP-on-decimal-string semantics DuckDB doesn't share —
    * that ONE substitution is what upgrades q34 from rows-only to
    * hash-exact oracle-checked.  The double avg is deterministic: a
    * payload's frames are consecutive rows of one mapPartitions output
    * partition, so the partial sum folds in frame order, which the
    * oracle replays with an ORDER BY frame_idx fold.
    */
  def featureSummary(spark: SparkSession, dir: String): DataFrame =
    decodeFeatures(spark, dir).groupBy("doc_id")
      .agg(count(lit(1)).as("n_frames"),
        (floor(avg(col("feature")) * lit(1e6) + lit(0.5)) / lit(1e6)).as("mean_feature"))

  /** STUB RESIZE — the binary→binary transform shape (image downscale,
    * audio resample).  The deterministic fake keeps every 2nd byte; a
    * real impl swaps the loop body for a codec call, everything else
    * (mapPartitions batching, binary schema in/out, metadata update)
    * is the production shape.  Output carries the new payload plus
    * before/after sizes and a content hash so the transform is
    * oracle-checkable end to end.
    */
  def resizePayloads(spark: SparkSession, dir: String, factor: Int = 2): DataFrame = {
    import spark.implicits._
    val resized = payloads(spark, dir)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition codec init in production
        rows.map { case (id, bytes) =>
          val out = new Array[Byte]((bytes.length + factor - 1) / factor)
          var i = 0
          while (i < out.length) { out(i) = bytes(i * factor); i += 1 }
          (id, bytes.length.toLong, out.length.toLong, out)
        }
      }
      .toDF("doc_id", "orig_len", "resized_len", "resized")
    resized.select(
      col("doc_id"), col("orig_len"), col("resized_len"),
      md5(col("resized")).as("resized_md5"))
  }
}
