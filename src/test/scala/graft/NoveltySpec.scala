package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextQueries

/** q_txt_novelty semantics: cross-checked against a plain-Scala
  * re-derivation of first-writer-wins 5-gram attribution on the whole
  * sf0.001 corpus (500 docs — small enough to brute-force exactly). */
class NoveltySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("novelty equals the brute-force first-writer-wins ratio on every doc") {
    val k = 5
    val texts = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val firstDoc = scala.collection.mutable.Map.empty[String, Long]
    val expected = texts.flatMap { case (id, text) =>
      val toks = text.split(" ", -1)
      if (toks.length < k) None
      else {
        val grams = toks.sliding(k).map(_.mkString(" ")).toSeq
        grams.foreach(g => if (!firstDoc.contains(g)) firstDoc(g) = id)
        Some(id -> grams)
      }
    }.toMap
    // second pass: novel iff this doc IS the global first writer
    val want = expected.map { case (id, grams) =>
      val novel = grams.count(g => firstDoc(g) == id)
      id -> ((grams.size.toLong, novel.toLong))
    }
    val got = TextQueries.txtNovelty(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_grams"), r.getAs[Long]("n_novel"),
          r.getAs[Double]("novelty")))).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (id, (ng, nn, ratio)) =>
      assert((ng, nn) == want(id), s"doc $id gram/novel counts differ")
      assert(ratio == nn.toDouble / ng.toDouble)
      assert(ratio >= 0.0 && ratio <= 1.0)
    }
    // the earliest document by id is all-novel by construction
    val minId = want.keys.min
    assert(got(minId)._3 == 1.0)
  }

  test("two-batch incremental replay equals the one-shot leg exactly") {
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_grams"), r.getAs[Long]("n_novel"),
          r.getAs[Double]("novelty")))).toMap
    val oneShot = canon(TextQueries.txtNovelty(spark, dir))
    val incr = canon(TextQueries.txtNoveltyIncremental(spark, dir))
    assert(incr == oneShot)
    // the ingestion cut genuinely splits the corpus (both batches score)
    val ids = oneShot.keySet
    val mid = (ids.min + ids.max) / 2
    assert(ids.exists(_ <= mid) && ids.exists(_ > mid))
  }
}
