package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Clustering

class ClusteringSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("kmeans assigns every vector exactly once, clusters within [0, k)") {
    val got = Clustering.kmeansAssign(spark, dir, k = 8, iters = 2)
      .as[(Long, Int)].collect()
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(got.length == n)
    assert(got.map(_._1).distinct.length == got.length)
    assert(got.forall { case (_, c) => c >= 0 && c < 8 })
    // Deterministic init + data means no cluster starves on this corpus.
    assert(got.map(_._2).distinct.sorted.toSeq == (0 until 8))
  }

  test("assignment is invariant to input partitioning (fixed-point sums)") {
    // The determinism claim is shuffle-order independence: quantized long
    // centroid sums are associative, so re-running under a different
    // parallelism must reproduce the assignment bit-for-bit.
    val base = Clustering.kmeansAssign(spark, dir, k = 8, iters = 2)
      .as[(Long, Int)].collect().toMap
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "1")
    try {
      val single = Clustering.kmeansAssign(spark, dir, k = 8, iters = 2)
        .as[(Long, Int)].collect().toMap
      assert(single == base)
    } finally spark.conf.set(key, prev)
  }

  test("more Lloyd rounds do not increase within-cluster SSE") {
    // Monotone SSE is Lloyd's invariant; quantization perturbs centroids
    // by <1e-6 per component, far below the assignment margins here.
    def sse(iters: Int): Double = {
      val assigned = Clustering.kmeansAssign(spark, dir, k = 8, iters = iters)
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      import org.apache.spark.sql.functions._
      val joined = assigned.join(emb, "vec_id")
        .select(col("cluster"),
          transform(col("embedding"), _.cast("double")).as("v"))
      val centroids = joined.select(col("cluster"),
          posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cluster", "pos").agg(avg(col("x")).as("c"))
      joined.select(col("cluster"), posexplode(col("v")).as(Seq("pos", "x")))
        .join(centroids, Seq("cluster", "pos"))
        .agg(sum((col("x") - col("c")) * (col("x") - col("c"))))
        .as[Double].head()
    }
    assert(sse(2) <= sse(1) + 1e-9)
  }
}
