package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.TableIO.table

/** Multimodal-column plumbing: media payloads are opaque `binary` columns
  * with typed metadata travelling alongside. The container has no image/
  * audio codecs, so the DECODE step is a clearly-marked deterministic stub —
  * but everything Spark-side (schema, batching, partition-preserving
  * mapPartitions, typed output) is real and tested. Swapping the stub for a
  * real codec changes one function, not the plan shape.
  *
  * The `documents.text` column stands in for the payload (UTF-8 bytes);
  * at 100 TB real payloads live in the same parquet layout (binary column +
  * metadata), and decode runs partition-parallel with zero shuffle.
  */
object MultimodalQueries {

  /** Binary metadata extraction: byte length, SHA-256 content address,
    * magic-byte sniff — the catalog/integrity pass every media pipeline
    * runs before decode. Pure built-ins, fully pushdown/codegen friendly. */
  def mmBinaryMeta(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "documents")
      .withColumn("payload", col("text").cast(BinaryType))
      .select(
        col("doc_id"),
        octet_length(col("payload")).as("n_bytes"),
        sha2(col("payload"), 256).as("sha256"),
        substring(base64(col("payload")), 1, 12).as("head_b64"))

  /** Content-addressed media dedup: group payloads by their SHA-256,
    * elect the minimum doc_id as the canonical copy, and report the bytes
    * the duplicate copies waste — media corpora routinely shrink double-
    * digit percent from this pass alone (mirrored thumbnails, reposts).
    * Same single-shuffle map-side-combining shape as text dedupExact, on
    * a 256-bit key. */
  def mmDedup(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "documents")
      .withColumn("payload", col("text").cast(BinaryType))
      .select(col("doc_id"), sha2(col("payload"), 256).as("sha256"),
        octet_length(col("payload")).cast(LongType).as("n_bytes"))
      .groupBy(col("sha256"))
      .agg(count(lit(1)).as("n_copies"),
        min(col("doc_id")).as("canonical_doc_id"),
        max(col("n_bytes")).as("n_bytes"))
      .withColumn("dup_bytes", (col("n_copies") - 1) * col("n_bytes"))

  /** STUB DECODE (`???`-equivalent): a real implementation would parse the
    * container format (JPEG/WAV/MP4) here. The stub derives deterministic
    * pseudo-features from the payload's SHA-256 content address and byte
    * length — primitives DuckDB also computes, so the decode leg gets a
    * full hash-checked oracle instead of a rows-only check — while the
    * Spark plumbing (binary in, fixed-schema feature struct out, per-
    * partition batch iteration) stays exactly what a real codec needs. */
  private def stubDecode(payload: Array[Byte]): (Int, Int, Int, Int, Double) = {
    // ??? real codec goes here — deterministic fake below.
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val hex = md.digest(payload).map("%02x".format(_)).mkString
    def hexInt(from: Int, until: Int): Long =
      java.lang.Long.parseLong(hex.substring(from, until), 16)
    val width = 64 + (hexInt(0, 4) % 1024).toInt
    val height = 64 + (hexInt(4, 8) % 1024).toInt
    val channels = 1 + (hexInt(8, 9) % 4).toInt
    val luma = hexInt(10, 16).toDouble / 1e6
    (payload.length, width, height, channels, luma)
  }

  private val featureSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("luma", DoubleType)))

  /** Partition-parallel decode/feature-extract over the binary payload —
    * the reference's mapPartitions shape (mls_listings_transform.py:419-481,
    * 534-543: RDD mapPartitions + createDataFrame with explicit schema),
    * minus the network call. No shuffle: decode runs where the bytes are. */
  def mmDecodeFeatures(s: SparkSession, dir: String): DataFrame = {
    val src = table(s, dir, "documents")
      .select(col("doc_id"), col("text").cast(BinaryType).as("payload"))
    val rows = src.rdd.mapPartitions { it =>
      it.map { r =>
        val (n, w, h, c, m) = stubDecode(r.getAs[Array[Byte]]("payload"))
        Row(r.getAs[Long]("doc_id"), n, w, h, c, m)
      }
    }
    s.createDataFrame(rows, featureSchema)
  }

  /** Frame sampling over a binary payload: N frames at evenly-strided byte
    * offsets, each a fixed-size window content-addressed by SHA-256 — the
    * sampling pass a video/audio pipeline runs to thumbnail or fingerprint
    * media without full decode. A real sampler seeks container keyframes
    * at these offsets; the byte-window stand-in keeps the plan exactly
    * what that needs: posexplode fans each payload into frame rows IN
    * PLACE (zero shuffle, codegen'd `substring` on binary — composition of
    * built-ins, no mapPartitions required), and frames carry
    * (doc_id, frame_idx) identity for downstream per-frame operators. */
  def mmFrameSample(s: SparkSession, dir: String, nFrames: Int = 4,
                    window: Int = 16): DataFrame =
    table(s, dir, "documents")
      .select(col("doc_id"), col("text").cast(BinaryType).as("payload"))
      .withColumn("n_bytes", octet_length(col("payload")))
      .select(col("doc_id"), col("n_bytes"), col("payload"),
        posexplode(expr(s"sequence(0, ${nFrames - 1})")).as(Seq("_p", "frame_idx")))
      .withColumn("offset", expr(s"(frame_idx * n_bytes) div $nFrames"))
      .withColumn("frame", expr(s"substring(payload, offset + 1, $window)"))
      .select(col("doc_id"), col("frame_idx").cast(IntegerType).as("frame_idx"),
        col("offset").cast(IntegerType).as("offset"),
        octet_length(col("frame")).as("frame_bytes"),
        sha2(col("frame"), 256).as("frame_sha"))

  /** Resize planning over decoded dimensions: fit every image inside a
    * `box`×`box` bounding box preserving aspect ratio (integer floor
    * arithmetic — the exact dims a thumbnailer must produce), pass
    * through images already inside the box, and content-address the
    * would-be resized payload deterministically (STUB: a real resizer
    * would emit actual pixels here; the address is a pure function of the
    * source address and target dims, so the oracle replays it). Chains on
    * the decode stub the way a real pipeline chains resize after decode —
    * scan-side projection, zero shuffle. */
  def mmResize(s: SparkSession, dir: String, box: Int = 256): DataFrame = {
    val d = mmDecodeFeatures(s, dir)
    val scaleNeeded = col("width") > box || col("height") > box
    // floor(dim * box / longest side) with exact integer arithmetic
    // (`div`, not `/` — Spark's `/` on integers is true division)
    val w2 = when(col("width") >= col("height"), lit(box))
      .otherwise(expr(s"CAST((CAST(width AS BIGINT) * $box) div height AS INT)"))
    val h2 = when(col("width") >= col("height"),
      expr(s"CAST((CAST(height AS BIGINT) * $box) div width AS INT)"))
      .otherwise(lit(box))
    d.select(col("doc_id"), col("width"), col("height"),
        when(scaleNeeded, w2).otherwise(col("width")).as("out_width"),
        when(scaleNeeded, h2).otherwise(col("height")).as("out_height"),
        scaleNeeded.cast(StringType).as("resized"))
      // concat (null-propagating) rather than concat_ws (null-skipping):
      // pins the same semantics as the oracle's `||` chain should a dim
      // ever become nullable.
      .withColumn("out_sha", sha2(concat(
        col("doc_id").cast(StringType), lit("x"),
        col("out_width").cast(StringType), lit("x"),
        col("out_height").cast(StringType)).cast(BinaryType), 256))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_mm_binary_meta" -> (mmBinaryMeta _),
    "q_mm_decode_features" -> (mmDecodeFeatures _),
    "q_mm_frame_sample" -> ((s: SparkSession, d: String) => mmFrameSample(s, d)),
    "q_mm_resize" -> ((s: SparkSession, d: String) => mmResize(s, d)),
    "q_mm_dedup" -> (mmDedup _))

  val oracles: Map[String, String] = Map(
    "q_mm_dedup" ->
      """WITH h AS (SELECT doc_id, sha256(text) AS sha256,
        |    CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes
        |  FROM documents),
        |a AS (SELECT sha256, COUNT(*) AS n_copies,
        |    MIN(doc_id) AS canonical_doc_id,
        |    CAST(MAX(n_bytes) AS BIGINT) AS n_bytes
        |  FROM h GROUP BY sha256)
        |SELECT sha256, n_copies, canonical_doc_id, n_bytes,
        |  (n_copies - 1) * n_bytes AS dup_bytes
        |FROM a""".stripMargin,
    "q_mm_binary_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(CAST(text AS BLOB)) AS INTEGER) AS n_bytes,
        |  sha256(text) AS sha256,
        |  substring(to_base64(CAST(text AS BLOB)), 1, 12) AS head_b64
        |FROM documents""".stripMargin,
    // Mirrors stubDecode exactly: features are pure functions of the
    // payload's sha256 hex and octet length, both engine-portable.
    "q_mm_decode_features" ->
      """WITH h AS (SELECT doc_id,
        |    CAST(octet_length(CAST(text AS BLOB)) AS INTEGER) AS n_bytes,
        |    sha256(text) AS hex
        |  FROM documents)
        |SELECT doc_id, n_bytes,
        |  CAST(64 + ('0x' || substr(hex, 1, 4))::BIGINT % 1024 AS INTEGER) AS width,
        |  CAST(64 + ('0x' || substr(hex, 5, 4))::BIGINT % 1024 AS INTEGER) AS height,
        |  CAST(1 + ('0x' || substr(hex, 9, 1))::BIGINT % 4 AS INTEGER) AS channels,
        |  CAST(('0x' || substr(hex, 11, 6))::BIGINT AS DOUBLE) / 1e6 AS luma
        |FROM h""".stripMargin,
    // Byte-window sampling replayed on VARCHAR: the corpus is ASCII, so
    // DuckDB's character substr equals the byte slice and sha256(VARCHAR)
    // hashes the same bytes Spark's sha2(BINARY) does.
    "q_mm_frame_sample" ->
      """WITH d AS (SELECT doc_id, text,
        |    CAST(octet_length(CAST(text AS BLOB)) AS INTEGER) AS n_bytes
        |  FROM documents),
        |f AS (SELECT d.*, i.range AS frame_idx FROM d CROSS JOIN range(0, 4) i),
        |w AS (SELECT doc_id, frame_idx, (frame_idx * n_bytes) // 4 AS off,
        |    substr(text, CAST((frame_idx * n_bytes) // 4 + 1 AS BIGINT), 16) AS frame
        |  FROM f)
        |SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
        |  CAST(off AS INTEGER) AS offset,
        |  CAST(octet_length(CAST(frame AS BLOB)) AS INTEGER) AS frame_bytes,
        |  sha256(frame) AS frame_sha
        |FROM w""".stripMargin,
    // Chains on the decode-stub oracle: same md5/sha-derived dims, then
    // the aspect-fit integer arithmetic and the deterministic address.
    "q_mm_resize" ->
      """WITH h AS (SELECT doc_id, sha256(text) AS hex FROM documents),
        |d AS (SELECT doc_id,
        |    CAST(64 + ('0x' || substr(hex, 1, 4))::BIGINT % 1024 AS INTEGER) AS width,
        |    CAST(64 + ('0x' || substr(hex, 5, 4))::BIGINT % 1024 AS INTEGER) AS height
        |  FROM h),
        |r AS (SELECT doc_id, width, height,
        |    (width > 256 OR height > 256) AS scale_needed,
        |    CASE WHEN width >= height THEN 256
        |         ELSE CAST((CAST(width AS BIGINT) * 256) // height AS INTEGER) END AS w2,
        |    CASE WHEN width >= height
        |         THEN CAST((CAST(height AS BIGINT) * 256) // width AS INTEGER)
        |         ELSE 256 END AS h2
        |  FROM d)
        |SELECT doc_id, width, height,
        |  CASE WHEN scale_needed THEN w2 ELSE width END AS out_width,
        |  CASE WHEN scale_needed THEN h2 ELSE height END AS out_height,
        |  CAST(scale_needed AS STRING) AS resized,
        |  sha256(CAST(doc_id AS STRING) || 'x'
        |    || CAST(CASE WHEN scale_needed THEN w2 ELSE width END AS STRING) || 'x'
        |    || CAST(CASE WHEN scale_needed THEN h2 ELSE height END AS STRING)) AS out_sha
        |FROM r""".stripMargin)
}
