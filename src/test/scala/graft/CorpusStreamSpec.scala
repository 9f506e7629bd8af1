package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.CorpusStream

class CorpusStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def docs = graft.sources.TableIO.table(spark, dir, "documents")
    .select(col("doc_id"), col("text"))

  test("streaming near-dup screen equals the batch incremental dedup") {
    implicit val sqlCtx = spark.sqlContext
    val index = CorpusStream.corpusPrefixIndex(
      docs.filter(col("doc_id") % 10 =!= 0))

    val stream = MemoryStream[(Long, String)]
    val named = stream.toDF().toDF("doc_id", "text")
    val q = CorpusStream.nearDupScreen(named, index)
      .writeStream.format("memory").queryName("neardup_out")
      .outputMode("append").start()
    // deliver the delta docs across two micro-batches
    val delta = docs.filter(col("doc_id") % 10 === 0)
      .as[(Long, String)].collect().toSeq
    val (b1, b2) = delta.splitAt(delta.length / 2)
    stream.addData(b1: _*); q.processAllAvailable()
    stream.addData(b2: _*); q.processAllAvailable(); q.stop()

    val got = spark.table("neardup_out")
      .select("doc_new", "doc_existing").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val expected = graft.operators.TextQueries.dedupIncremental(spark, dir)
      .select("doc_new", "doc_existing").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.sorted == expected.sorted, "streaming != batch pair set")
    // exactly once per pair: no duplicate emissions across shared shingles
    assert(got.distinct.length == got.length)
    assert(got.nonEmpty)
  }

  test("the screen emits nothing for documents unlike the corpus") {
    implicit val sqlCtx = spark.sqlContext
    val index = CorpusStream.corpusPrefixIndex(
      docs.filter(col("doc_id") % 10 =!= 0))
    val stream = MemoryStream[(Long, String)]
    val named = stream.toDF().toDF("doc_id", "text")
    val q = CorpusStream.nearDupScreen(named, index)
      .writeStream.format("memory").queryName("neardup_none")
      .outputMode("append").start()
    stream.addData((900001L, "zq xv wk pj mn bt ghe yud rwo cza lkm pqa"))
    q.processAllAvailable(); q.stop()
    assert(spark.table("neardup_none").isEmpty)
  }

  test("streaming embedding screen: once per pair, verified, batch-cut-invariant") {
    val vecs = graft.sources.TableIO.table(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val index = CorpusStream.embBandIndex(vecs.filter(col("vec_id") % 10 =!= 0))
    // batch form: the screen run on a batch frame
    val batchPairs = CorpusStream.embNearDupScreen(
        vecs.filter(col("vec_id") % 10 === 0), index)
      .select("vec_new", "vec_existing").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(batchPairs.nonEmpty)
    assert(batchPairs.distinct.length == batchPairs.length,
      "a multi-band collision emitted a pair twice")
    // every emitted pair truly clears the threshold: it must appear in the
    // exact all-pairs set (no false positives from bucketing)
    val exact = graft.operators.SimilarityQueries.dedupEmbedding(spark, dir)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    batchPairs.foreach { case (n, e) =>
      assert(exact(math.min(n, e) -> math.max(n, e)),
        s"pair ($n,$e) not in the exact set")
    }
    // streamed in two batch cuts: same set (stateless, per-pair independent)
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Seq[Float])]
    val named = stream.toDF().toDF("vec_id", "embedding")
    val q = CorpusStream.embNearDupScreen(named, index)
      .writeStream.format("memory").queryName("emb_neardup_out")
      .outputMode("append").start()
    val delta = vecs.filter(col("vec_id") % 10 === 0)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    val (b1, b2) = delta.splitAt(delta.length / 2)
    stream.addData(b1: _*); q.processAllAvailable()
    stream.addData(b2: _*); q.processAllAvailable(); q.stop()
    val streamed = spark.table("emb_neardup_out")
      .select("vec_new", "vec_existing").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(streamed.sorted == batchPairs.sorted)
  }
}
