package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.CurationDemo

class CurationDemoSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("curation pipeline runs end-to-end and splits partition the corpus") {
    val out = Files.createTempDirectory("graft_curation").toString
    CurationDemo.run(spark, "/root/testdata/sf0.001", out)
    val corpus = spark.read.parquet(s"$out/corpus")
    assert(corpus.count() > 0)
    // every surviving doc has exactly one split, and all splits appear
    val bySplit = corpus.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.keySet.subsetOf(Set("train", "validation", "test")))
    assert(bySplit.values.sum == corpus.count())
    assert(bySplit.getOrElse("train", 0L) > bySplit.getOrElse("test", 0L))
    // summary json exists and is one line per split
    val summary = spark.read.text(s"$out/summary").collect()
    assert(summary.length == bySplit.size)
    // quality floor held
    assert(corpus.filter("quality_score < 2").isEmpty)
  }
}
