package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType}
import graft.operators.Sketches

/** Streaming corpus-intake operators — the continuous forms of the batch
  * curation path (TextQueries.dedupIncremental et al.): documents arrive
  * as a stream and are screened against the EXISTING corpus, which is a
  * static frame (in production: a bucketed table of precomputed shingle
  * prefixes, rebuilt by the batch pipeline on its own cadence).
  *
  * The load-bearing design point is that stream-static equi-joins are
  * STATELESS in Structured Streaming: each micro-batch joins against the
  * static side and emits; no state store, no watermark, no eviction
  * policy — the failure modes that dominate stateful streaming at
  * 100 TB/day simply don't exist on this path. The cost of that shape is
  * that every pair-dedup trick must be per-row computable, which is why
  * candidate de-duplication below is BY CONSTRUCTION (keep the one join
  * row whose matched shingle is the minimum of the two prefixes'
  * intersection) instead of a stateful `dropDuplicates`.
  */
object CorpusStream {

  private def prefLen(n: org.apache.spark.sql.Column, threshold: Double) =
    (n - ceil(n * threshold) + 1).cast(IntegerType)

  /** COMPACT static-side index: ONE row per corpus document — its sorted
    * hashed shingle set, size, and PPJoin prefix (hash order — same
    * lossless argument as the batch operator). This is the form to
    * persist as a table at scale: the shingle/tokenize/sort compute
    * happens once per corpus version, and the stored rows carry each
    * array exactly once (the exploded join view below would multiply
    * every array by its prefix length on disk). */
  def corpusPrefixCompact(corpus: DataFrame, threshold: Double = 0.5): DataFrame =
    corpus
      .withColumn("toks", split(col("text"), " "))
      .withColumn("sh_b", array_sort(Sketches.hashedShingles(col("toks"))))
      .withColumn("nb", size(col("sh_b")))
      .withColumn("pref_b", slice(col("sh_b"), lit(1), prefLen(col("nb"), threshold)))
      .select(col("doc_id").as("doc_existing"), col("sh_b"), col("nb"),
        col("pref_b"))

  /** The JOIN VIEW of the compact index: one row per prefix shingle —
    * what [[nearDupScreen]] probes. A pure codegen'd explode, derived
    * from the stored compact form at stream start. */
  def explodePrefixIndex(compact: DataFrame): DataFrame =
    compact.select(col("doc_existing"), col("sh_b"), col("nb"),
      col("pref_b"), explode(col("pref_b")).as("sh"))

  /** Build the exploded index straight from a corpus (compact + explode). */
  def corpusPrefixIndex(corpus: DataFrame, threshold: Double = 0.5): DataFrame =
    explodePrefixIndex(corpusPrefixCompact(corpus, threshold))

  /** Streaming near-dup screen: every arriving document is checked against
    * the static corpus index; emits (doc_new, doc_existing, jaccard) for
    * each pair at or above `threshold`, exactly once per pair per batch.
    *
    * Works identically on a batch frame (the spec cross-checks it against
    * TextQueries.dedupIncremental). Two docs with J ≥ t must share a
    * shingle within both hash-order prefixes; of those shared prefix
    * shingles exactly ONE is the minimum of the prefix intersection, and
    * only that join row survives — a stateless replacement for
    * `distinct()` on candidate pairs. */
  def nearDupScreen(newDocs: DataFrame, corpusIndex: DataFrame,
                    threshold: Double = 0.5): DataFrame = {
    val a = newDocs
      .withColumn("toks", split(col("text"), " "))
      .withColumn("sh_a", array_sort(Sketches.hashedShingles(col("toks"))))
      .withColumn("na", size(col("sh_a")))
      .withColumn("pref_a", slice(col("sh_a"), lit(1), prefLen(col("na"), threshold)))
      .select(col("doc_id").as("doc_new"), col("sh_a"), col("na"),
        col("pref_a"), explode(col("pref_a")).as("sh"))
    a.join(corpusIndex,
        a("sh") === corpusIndex("sh") &&
          col("doc_new") =!= col("doc_existing") &&
          col("na") >= col("nb") * threshold &&
          col("nb") >= col("na") * threshold &&
          a("sh") === array_min(array_intersect(col("pref_a"), col("pref_b"))))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard", col("inter").cast(DoubleType) /
        (col("na") + col("nb") - col("inter")).cast(DoubleType))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_new"), col("doc_existing"), col("jaccard"))
  }

  /** Static-side EMBEDDING index for the streaming near-dup screen: per
    * corpus vector its banded sign-signature
    * ([[graft.operators.SimilarityQueries.bandSignature]]), norm, and one
    * row per (band, bucket) to join on. Build once per corpus version and
    * persist at scale — the embedding twin of [[corpusPrefixIndex]]. */
  def embBandCompact(corpus: DataFrame, nBands: Int = 16,
                     rowsPerBand: Int = 4): DataFrame = {
    import graft.operators.SimilarityQueries
    corpus
      .withColumn("n_b", SimilarityQueries.l2Norm(col("embedding")))
      .withColumn("sig_b",
        SimilarityQueries.bandSignature(col("embedding"), nBands, rowsPerBand))
      .select(col("vec_id").as("vec_existing"), col("embedding").as("e_b"),
        col("n_b"), col("sig_b"))
  }

  /** The (band, bucket) JOIN VIEW of the compact embedding index —
    * derived by posexplode at stream start from the stored compact form
    * (which carries each embedding/signature exactly once). */
  def explodeBandIndex(compact: DataFrame): DataFrame =
    compact.select(col("vec_existing"), col("e_b"), col("n_b"), col("sig_b"),
      posexplode(col("sig_b")).as(Seq("band", "bucket")))

  def embBandIndex(corpus: DataFrame, nBands: Int = 16,
                   rowsPerBand: Int = 4): DataFrame =
    explodeBandIndex(embBandCompact(corpus, nBands, rowsPerBand))

  /** Streaming EMBEDDING near-dup screen — the continuous form of the
    * batch LSH dedup (SimilarityQueries.dedupEmbeddingLsh): arriving
    * vectors are bucketed by the same banded sign-LSH, candidates come
    * from the static index's matching (band, bucket) rows, and every
    * candidate is EXACT-cosine verified, so the stream emits no false
    * positives. Stream-static join → STATELESS (no state store, no
    * watermark, the 100 TB/day intake shape).
    *
    * A pair colliding in several bands must still emit once per batch:
    * both sides carry their full signatures, and only the join row whose
    * band is the MINIMUM matching band survives — the same stateless
    * by-construction dedup [[nearDupScreen]] uses (min of the prefix
    * intersection), re-expressed for bands. */
  def embNearDupScreen(newVecs: DataFrame, bandIndex: DataFrame,
                       threshold: Double = 0.35, nBands: Int = 16,
                       rowsPerBand: Int = 4): DataFrame = {
    import graft.operators.SimilarityQueries
    val a = newVecs
      .withColumn("n_a", SimilarityQueries.l2Norm(col("embedding")))
      .withColumn("sig_a",
        SimilarityQueries.bandSignature(col("embedding"), nBands, rowsPerBand))
      .select(col("vec_id").as("vec_new"), col("embedding").as("e_a"),
        col("n_a"), col("sig_a"),
        posexplode(col("sig_a")).as(Seq("band_a", "bucket_a")))
    val firstMatch = array_min(filter(
      sequence(lit(0), lit(nBands - 1)),
      b => element_at(col("sig_a"), b + 1) === element_at(col("sig_b"), b + 1)))
    a.join(bandIndex,
        col("band_a") === col("band") && col("bucket_a") === col("bucket") &&
          col("vec_new") =!= col("vec_existing"))
      .filter(col("band_a") === firstMatch)
      .withColumn("cos_sim",
        SimilarityQueries.dotProduct(col("e_a"), col("e_b")) /
          (col("n_a") * col("n_b")))
      .filter(col("cos_sim") >= threshold)
      .select(col("vec_new"), col("vec_existing"), col("cos_sim"))
  }
}
