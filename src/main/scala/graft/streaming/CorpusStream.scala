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

  /** Static-side index: per corpus document its sorted hashed shingle set,
    * size, PPJoin prefix (hash order — same lossless argument as the
    * batch operator), and one row per prefix shingle to join on. Build
    * once per corpus version and persist as a table at scale. */
  def corpusPrefixIndex(corpus: DataFrame, threshold: Double = 0.5): DataFrame =
    corpus
      .withColumn("toks", split(col("text"), " "))
      .withColumn("sh_b", array_sort(Sketches.hashedShingles(col("toks"))))
      .withColumn("nb", size(col("sh_b")))
      .withColumn("pref_b", slice(col("sh_b"), lit(1), prefLen(col("nb"), threshold)))
      .select(col("doc_id").as("doc_existing"), col("sh_b"), col("nb"),
        col("pref_b"), explode(col("pref_b")).as("sh"))

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
}
