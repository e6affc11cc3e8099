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

  /** One chunk emitted by the content-defined chunker. `start` is
    * 1-based so the oracle's `substr(text, start, len)` replays the
    * slice verbatim.
    */
  final case class Chunk(doc_id: Long, source: String, start: Int, len: Int,
                         h: String)

  /** The shared 60-bit hash computed driver/executor-side — the exact
    * Scala twin of `TextAnalysis.hv60` / `plans.Hv60` (md5 hex digits
    * 1-15 as a base-16 integer), used to derive the gear table below
    * so the oracle's `hv60Sql('gear:' ∥ byte)` replays it.
    */
  private def hv60OfString(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.take(8).map(b => f"${b & 0xff}%02x").mkString.substring(0, 15), 16)
  }

  /** Content-defined chunking dedup (q313): the STORAGE-class dedup
    * primitive the token-level family (q19/q21/q296) doesn't cover —
    * split every binary payload at content-determined boundaries
    * (FastCDC/LBFS family: gear rolling hash
    * h ← (2h + gear[byte]) mod 2³², boundary when h ≡ 0 mod 64,
    * expected 64-byte chunks) and content-address the chunks, so a
    * byte INSERTION shifts boundaries only locally and identical
    * regions across payloads still chunk identically — the property
    * fixed-offset blocking lacks.  The report prices chunk-store
    * dedup per source: instances beyond the global first occurrence
    * of each chunk content (first = min (doc_id, start)) are
    * redundant bytes a content-addressable store would not write.
    *
    * Determinism: the rolling state is pure 32-bit integer algebra
    * with a gear table derived from the shared 60-bit hash, so the
    * oracle replays h WITHOUT sequential state via the closed form
    * h_i = Σ_{j≤i} gear_j·2^(i−j) mod 2³² (only the last 32 terms
    * survive the modulus — a 32-wide windowed join); chunk identity
    * is md5 of the byte slice (payloads are ASCII, so SQL's
    * char-based substr replays byte slices exactly); counts/bytes
    * are exact BIGINTs with one terminal divide.
    *
    * 100 TB shape: the chunker is ONE linear mapPartitions pass
    * (O(bytes), per-partition hasher init — the production CDC
    * shape; the oracle's quadratic closed form exists only on the
    * DuckDB side); the first-instance rule is a chunk-hash-keyed
    * window — the same shuffle a content-addressable store performs
    * to write each chunk once; the rollup is a |sources|-key
    * aggregate.
    */
  def contentChunks(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val gear: Array[Long] =
      Array.tabulate(256)(b => hv60OfString("gear:" + b) % 4294967296L)
    val chunks = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)]
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.flatMap { case (id, src, text) =>
          val bytes = text.getBytes("UTF-8")
          val out = scala.collection.mutable.ArrayBuffer.empty[Chunk]
          var h = 0L
          var start = 0
          var i = 0
          while (i < bytes.length) {
            h = ((h << 1) + gear(bytes(i) & 0xff)) % 4294967296L
            if (h % 64L == 0L || i == bytes.length - 1) {
              val len = i - start + 1
              val hex = md.digest(java.util.Arrays.copyOfRange(bytes, start, i + 1))
                .map(b => f"${b & 0xff}%02x").mkString
              out += Chunk(id, src, start + 1, len, hex)
              start = i + 1
            }
            i += 1
          }
          out.iterator
        }
      }.toDF()
    val w = Window.partitionBy("h").orderBy(col("doc_id").asc, col("start").asc)
    chunks.withColumn("rn", row_number().over(w))
      .groupBy("source")
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_chunks"),
        sum(col("len").cast("long")).as("bytes_total"),
        sum(when(col("rn") > 1, 1L).otherwise(0L)).as("n_redundant"),
        sum(when(col("rn") > 1, col("len").cast("long")).otherwise(0L))
          .as("bytes_redundant"))
      .select(col("source"), col("n_docs"), col("n_chunks"), col("bytes_total"),
        col("n_redundant"), col("bytes_redundant"),
        (col("bytes_redundant").cast("double") / col("bytes_total").cast("double"))
          .as("dedup_ratio"))
      .orderBy("source")
  }

  final case class PayloadHash(doc_id: Long, byte_len: Long, ph: Long)

  /** Perceptual-hash near-dup detection over the media payloads
    * (q317): the MEDIA twin of the token-level near-dup family — a
    * re-encoded / slightly-edited image hashes to a phash within a
    * few bits of the original, so media dedup keys on Hamming
    * proximity of a compact signature, not byte equality (q313's CDC
    * catches shared byte runs, not globally-shifted re-encodes).
    * dHash discipline on the decode stub's 1-D signal: the payload's
    * bytes are divided into 33 equal buckets (floor(i·33/L) — every
    * bucket non-empty for L ≥ 33), bit j compares neighbor bucket
    * MEANS via the cross-multiplied exact-integer test
    * s_j·n_{j+1} > s_{j+1}·n_j — a 32-bit gradient signature that is
    * invariant to global brightness/gain, the property that makes
    * dHash robust.  Candidate pairs via 4-band 8-bit LSH on the hash
    * (pigeonhole: Hamming ≤ 3 ⇒ at least one of 4 bands identical —
    * recall 1.0 for the confirm threshold, no full self-join);
    * confirm = bit_count(xor) ≤ 3.  Exact-equal groups are priced by
    * the min-doc_id survivor rule (q305's discipline).
    *
    * Determinism: the hash is pure integer algebra (payloads are the
    * ASCII fixture, so SQL's per-char ascii() replays byte values);
    * pair and byte counts are exact BIGINTs, one terminal divide.
    *
    * 100 TB shape: the hash is ONE linear mapPartitions pass at
    * decode time (production computes it from decoded luma in the
    * same codec batch — the stub swaps the codec, keeps the shape);
    * downstream never touches payload bytes again: a 4-way band
    * explode over 8-byte rows, an equi-join on (band, 8-bit key),
    * and two keyed aggregates — the same sub-quadratic scaling
    * argument as MinHash-LSH, on rows 10⁶× smaller than the media.
    */
  def phashDedup(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val ph = payloads(spark, dir)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition decoder init in production; phash over luma
        rows.flatMap { case (id, bytes) =>
          val L = bytes.length
          if (L < 33) Iterator.empty
          else {
            val s = new Array[Long](33); val n = new Array[Long](33)
            var i = 0
            while (i < L) {
              val b = (i.toLong * 33L / L).toInt
              s(b) += (bytes(i) & 0xff).toLong; n(b) += 1L; i += 1
            }
            var h = 0L; var j = 0
            while (j < 32) {
              if (s(j) * n(j + 1) > s(j + 1) * n(j)) h |= (1L << j)
              j += 1
            }
            Iterator.single(PayloadHash(id, L.toLong, h))
          }
        }
      }.toDF()
    val phc = graft.util.Pins.eager(
      ph.join(Tables.documents(spark, dir).select(col("doc_id"), col("source")),
        "doc_id"))
    // exact-equal groups: min-doc survivor, redundancy priced per source
    val survivor = Window.partitionBy("ph").orderBy(col("doc_id").asc)
    val exact = phc.withColumn("rn", row_number().over(survivor))
      .groupBy("source")
      .agg(count(lit(1)).as("n_payloads"),
        countDistinct(col("ph")).as("n_phash_distinct"),
        sum(when(col("rn") > 1, 1L).otherwise(0L)).as("n_exact_dup"),
        sum(when(col("rn") > 1, col("byte_len")).otherwise(0L))
          .as("bytes_redundant"))
    // banded candidates -> Hamming-confirmed near-dup pairs
    val bands = phc.select(col("doc_id"), col("ph"), col("source"),
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("band"),
            shiftright(col("ph"), 8 * b).bitwiseAND(lit(255L)).as("key"))): _*))
          .as("bk"))
      .select(col("doc_id"), col("ph"), col("source"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.ph").as("ph_a"), col("b.ph").as("ph_b"),
        col("a.source").as("src_a"), col("b.source").as("src_b"))
      .distinct()
      .filter(bit_count(col("ph_a").bitwiseXOR(col("ph_b"))) <= 3)
    val ends = cand.select(explode(array(
        struct(col("src_a").as("s"), (col("src_a") === col("src_b")).as("intra")),
        struct(col("src_b").as("s"), (col("src_a") === col("src_b")).as("intra"))))
        .as("p"))
      .groupBy(col("p.s").as("source"))
      // an intra pair has both endpoints here: exact integer halving
      .agg(shiftright(sum(when(col("p.intra"), 1L).otherwise(0L)), 1)
          .as("n_intra_pairs"),
        sum(when(col("p.intra"), 0L).otherwise(1L)).as("n_cross_pairs"))
    exact.join(ends, Seq("source"), "left")
      .select(col("source"), col("n_payloads"), col("n_phash_distinct"),
        col("n_exact_dup"), col("bytes_redundant"),
        coalesce(col("n_intra_pairs"), lit(0L)).as("n_intra_pairs"),
        coalesce(col("n_cross_pairs"), lit(0L)).as("n_cross_pairs"))
      .orderBy("source")
  }
}
