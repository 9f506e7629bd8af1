package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}
import graft.sources.TableIO.table

/** Distributed Lloyd k-means over the embedding corpus — the clustering
  * leg of a training-data curation pipeline (cluster-balanced mixing,
  * domain discovery, per-cluster quality cuts all consume an assignment
  * like this one).
  *
  * DETERMINISM is the design constraint: a float centroid accumulated in
  * shuffle order is not reproducible (double addition is not associative),
  * which is exactly why the IVF codebook (`SimilarityQueries`) stays
  * seeded rather than trained. This operator closes that gap by
  * accumulating centroids in FIXED POINT: each component is quantized
  * once per update as `floor(x * 1e6)` (exact — a float mantissa times
  * 2^20-scale is ≤ 44 significant bits, inside a double's 53, and the
  * long sum is associative), so the per-cluster sums are identical under
  * any partitioning/merge order, and the next round's centroid
  * `sum / (count * 1e6)` is one exact cast-multiply-divide chain that any
  * engine reproduces bit-for-bit. Distances fold left-to-right over the
  * 64 dims in doubles (`aggregate` here, `list_reduce` in the oracle) —
  * per-row arrays have a fixed element order, so the fold is
  * deterministic, ties are identical on both sides, and the argmin
  * tie-breaks on the smaller centroid id via lexicographic struct min.
  *
  * Scale shape (the reference has no clustering; extension operator):
  *  - centroids ride the PLAN as literals — k·dim = 512 doubles, the
  *    same broadcast-not-shuffled shape as the IVF codebook;
  *  - one Lloyd round = one narrow scan + posexplode + hash aggregation
  *    on (cluster, pos): partial aggregation combines map-side, so the
  *    shuffle carries ≤ k·dim rows per map partition regardless of input
  *    rows — at 100 TB the round is scan-bound, which is the floor;
  *  - the driver holds k·dim longs per round (bounded artifact, like the
  *    IVF codebook / pack prefix sums — NOT a data-sized collect);
  *  - the long accumulator is safe to ~1.5e13 rows at |x| ≤ 0.6
  *    (0.6e6 · 1.5e13 ≈ 9e18 = Long.MaxValue); beyond that, widen the
  *    quantized sum to DECIMAL(38,0) — same associativity argument.
  */
object Clustering {

  /** Squared-L2 argmin over the centroid literals: lexicographic min of
    * (distance, cid) structs — smallest distance, ties to smallest cid. */
  private def assignCluster(v: Column, centroids: Seq[Array[Double]]): Column = {
    val entries = centroids.zipWithIndex.map { case (c, i) =>
      val cLit = array(c.map(lit(_)): _*)
      struct(
        aggregate(zip_with(v, cLit, (x, cc) => (x - cc) * (x - cc)),
          lit(0d), (acc, y) => acc + y).as("d"),
        lit(i).as("c"))
    }
    array_min(array(entries: _*)).getField("c")
  }

  /** Full Lloyd run: deterministic init (the k smallest vec_ids), `iters`
    * assignment/update rounds, returns (vec_id, cluster). */
  def kmeansAssign(s: SparkSession, dir: String, k: Int = 8,
                   iters: Int = 2): DataFrame = {
    val emb = table(s, dir, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"), _.cast(DoubleType)).as("v"))
    // Init = the embeddings of the k smallest vec_ids (float→double is
    // exact). k rows through the driver: bounded artifact.
    var centroids: Seq[Array[Double]] = emb.orderBy("vec_id").limit(k)
      .select("v").collect()
      .map(_.getSeq[Double](0).toArray).toSeq
    (1 to iters).foreach { _ =>
      // One round: quantized per-(cluster, dim) sums + cluster sizes.
      // posexplode multiplies rows by dim BEFORE the partial aggregation
      // combines them map-side — the shuffle itself stays ≤ k·dim rows
      // per map partition.
      val sums = emb
        .withColumn("cluster", assignCluster(col("v"), centroids))
        .select(col("cluster"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cluster"), col("pos"))
        .agg(sum(floor(col("x") * lit(1e6)).cast(LongType)).as("s"),
          count(lit(1)).as("n"))
        .collect()                                  // k·dim rows, bounded
      val byCluster = sums.groupBy(_.getInt(0))
      centroids = centroids.zipWithIndex.map { case (prev, cid) =>
        byCluster.get(cid) match {
          case None => prev                         // empty cluster: carry
          case Some(rows) =>
            val c = prev.clone()
            rows.foreach { r =>
              // One exact op chain: cast(s), cast(n)·1e6, divide.
              c(r.getInt(1)) = r.getLong(2).toDouble / (r.getLong(3).toDouble * 1e6)
            }
            c
        }
      }
    }
    emb.select(col("vec_id"),
      assignCluster(col("v"), centroids).as("cluster"))
  }

  /** Cluster-balanced sampling — the curation op the assignment exists
    * for: cap each k-means cluster at `cap` members so no dense region
    * dominates the training mix (the cluster-level analogue of the
    * per-stratum cap in `q_sample_stratified`). Selection within a
    * cluster is by md5(vec_id) — a deterministic portable shuffle, same
    * device the mixing suite uses — so the sample is reproducible and
    * engine-independent. One window over the assignment: at scale this
    * shuffles once on cluster id; k is small but each cluster's rows
    * spread across the cluster's whole hash range, so no single-partition
    * hotspot beyond the per-cluster sort the cap requires. */
  def clusterBalancedSample(s: SparkSession, dir: String, k: Int = 8,
                            iters: Int = 2, cap: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("cluster"))
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
    kmeansAssign(s, dir, k, iters)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= cap)
      .select(col("vec_id"), col("cluster"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_cluster_kmeans" -> ((s: SparkSession, d: String) => kmeansAssign(s, d)),
    "q_cluster_sample" -> ((s: SparkSession, d: String) =>
      clusterBalancedSample(s, d)))

  /** The oracle unrolls both Lloyd rounds as CTEs: same init, same
    * quantization, same op-for-op centroid division, same
    * (distance, cid) tie-break via row_number. Shared by the assignment
    * gate and the balanced-sample gate built on top of it. */
  private val kmeansOracle =
      """WITH emb AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |c0 AS (
        |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid, v AS c
        |  FROM emb ORDER BY vec_id LIMIT 8),
        |d1 AS (
        |  SELECT e.vec_id, e.v, i.cid,
        |    list_reduce(list_transform(range(1, 65),
        |      j -> (e.v[j] - i.c[j]) * (e.v[j] - i.c[j])), (a, b) -> a + b) AS dist
        |  FROM emb e CROSS JOIN c0 i),
        |a1 AS (
        |  SELECT vec_id, v, cid FROM (
        |    SELECT vec_id, v, cid,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        |    FROM d1) WHERE rn = 1),
        |s1 AS (
        |  SELECT cid, j AS pos,
        |    SUM(CAST(floor(v[j] * 1000000.0) AS BIGINT)) AS s, COUNT(*) AS n
        |  FROM a1, UNNEST(range(1, 65)) AS t(j)
        |  GROUP BY cid, j),
        |c1 AS (
        |  SELECT i.cid, CASE WHEN m.cid IS NULL THEN i.c ELSE m.c END AS c
        |  FROM c0 i LEFT JOIN (
        |    SELECT cid,
        |      list(CAST(s AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0)
        |           ORDER BY pos) AS c
        |    FROM s1 GROUP BY cid) m USING (cid)),
        |d2 AS (
        |  SELECT e.vec_id, e.v, i.cid,
        |    list_reduce(list_transform(range(1, 65),
        |      j -> (e.v[j] - i.c[j]) * (e.v[j] - i.c[j])), (a, b) -> a + b) AS dist
        |  FROM emb e CROSS JOIN c1 i),
        |a2 AS (
        |  SELECT vec_id, v, cid FROM (
        |    SELECT vec_id, v, cid,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        |    FROM d2) WHERE rn = 1),
        |s2 AS (
        |  SELECT cid, j AS pos,
        |    SUM(CAST(floor(v[j] * 1000000.0) AS BIGINT)) AS s, COUNT(*) AS n
        |  FROM a2, UNNEST(range(1, 65)) AS t(j)
        |  GROUP BY cid, j),
        |c2 AS (
        |  SELECT i.cid, CASE WHEN m.cid IS NULL THEN i.c ELSE m.c END AS c
        |  FROM c1 i LEFT JOIN (
        |    SELECT cid,
        |      list(CAST(s AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0)
        |           ORDER BY pos) AS c
        |    FROM s2 GROUP BY cid) m USING (cid)),
        |df AS (
        |  SELECT e.vec_id, i.cid,
        |    list_reduce(list_transform(range(1, 65),
        |      j -> (e.v[j] - i.c[j]) * (e.v[j] - i.c[j])), (a, b) -> a + b) AS dist
        |  FROM emb e CROSS JOIN c2 i),
        |asg AS (
        |  SELECT vec_id, cid AS cluster FROM (
        |    SELECT vec_id, cid,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        |    FROM df) WHERE rn = 1)
        |""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_cluster_kmeans" -> (kmeansOracle + "SELECT vec_id, cluster FROM asg"),
    "q_cluster_sample" -> (kmeansOracle +
      """SELECT vec_id, cluster FROM (
        |  SELECT vec_id, cluster, row_number() OVER (PARTITION BY cluster
        |    ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
        |  FROM asg) WHERE rn <= 20""".stripMargin))
}
