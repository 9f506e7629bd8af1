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

  /** STUB DECODE (`???`-equivalent): a real implementation would parse the
    * container format (JPEG/WAV/MP4) here. The stub derives deterministic
    * pseudo-features from the bytes so the full Spark plumbing — binary in,
    * fixed-schema feature struct out, batch iteration per partition — is
    * exercised end-to-end. */
  private def stubDecode(payload: Array[Byte]): (Int, Int, Int, Double) = {
    // ??? real codec goes here — deterministic fake below.
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
    val width = 64 + math.floorMod(h, 1024).toInt
    val height = 64 + math.floorMod(h >> 10, 1024).toInt
    val channels = 1 + math.floorMod(h >> 20, 4).toInt
    val meanByte = if (payload.isEmpty) 0.0
      else payload.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / payload.length
    (width, height, channels, meanByte)
  }

  private val featureSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("mean_byte", DoubleType)))

  /** Partition-parallel decode/feature-extract over the binary payload —
    * the reference's mapPartitions shape (mls_listings_transform.py:419-481,
    * 534-543: RDD mapPartitions + createDataFrame with explicit schema),
    * minus the network call. No shuffle: decode runs where the bytes are. */
  def mmDecodeFeatures(s: SparkSession, dir: String): DataFrame = {
    val src = table(s, dir, "documents")
      .select(col("doc_id"), col("text").cast(BinaryType).as("payload"))
    val rows = src.rdd.mapPartitions { it =>
      it.map { r =>
        val (w, h, c, m) = stubDecode(r.getAs[Array[Byte]]("payload"))
        Row(r.getAs[Long]("doc_id"), w, h, c, m)
      }
    }
    s.createDataFrame(rows, featureSchema)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_mm_binary_meta" -> (mmBinaryMeta _),
    "q_mm_decode_features" -> (mmDecodeFeatures _))

  // q_mm_decode_features: stubbed codec → no SQL oracle (rows-only check).
  val oracles: Map[String, String] = Map(
    "q_mm_binary_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(CAST(text AS BLOB)) AS INTEGER) AS n_bytes,
        |  sha256(text) AS sha256,
        |  substring(to_base64(CAST(text AS BLOB)), 1, 12) AS head_b64
        |FROM documents""".stripMargin)
}
