package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.PackQueries

class PackQueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pack(docs: Seq[(Long, String)], budget: Long,
                   parts: Int = 1): Map[Long, (Long, Long, Long)] = {
    val dir = java.nio.file.Files.createTempDirectory("packspec").toString
    docs.toDF("doc_id", "text").repartition(parts)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    PackQueries.packSequences(spark, dir, budget)
      .as[(Long, Long, Long, Long)].collect()
      .map { case (id, nt, bin, off) => id -> ((nt, bin, off)) }.toMap
  }

  test("documents chunk into budget-sized bins by first-token position") {
    // tokens: 3, 4, 2, 5 -> cum_before: 0, 3, 7, 9; budget 4
    val got = pack(Seq(1L -> "a b c", 2L -> "a b c d", 3L -> "a b",
      4L -> "a b c d e"), budget = 4)
    assert(got(1L) == ((3L, 0L, 0L))) // starts at 0 -> bin 0
    assert(got(2L) == ((4L, 0L, 3L))) // starts at 3, spans into bin 1
    assert(got(3L) == ((2L, 1L, 3L))) // starts at 7
    assert(got(4L) == ((5L, 2L, 1L))) // starts at 9
  }

  test("pack stats count boundary-straddling documents") {
    val dir = java.nio.file.Files.createTempDirectory("packspec").toString
    Seq(1L -> "a b c", 2L -> "a b c d", 3L -> "a b", 4L -> "a b c d e")
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // starts: 0,3,7,9 at budget 4 -> docs 2,3,4 cross a bin boundary;
    // 14 tokens chunk into ceil(14/4) = 4 bins (doc 4's tail occupies a
    // bin no document starts in — n_bins must count it)
    val got = PackQueries.packStats(spark, dir, budget = 4)
      .as[(Long, Long, Long, Long, Double)].head()
    assert(got == ((4L, 14L, 4L, 3L, 0.75)))
  }

  test("assignment is independent of input partitioning") {
    val docs = (1L to 200L).map(i => i -> ("tok " * (i % 7 + 1).toInt).trim)
    assert(pack(docs, budget = 16, parts = 1) == pack(docs, budget = 16, parts = 13))
  }

  test("bin ids are dense from 0 and offsets stay inside the budget") {
    val docs = (1L to 100L).map(i => i -> ("x " * (i % 5 + 1).toInt).trim)
    val got = pack(docs, budget = 10)
    val bins = got.values.map(_._2).toSet
    // docs are shorter than the budget, so no bin can be skipped entirely
    assert(bins == (0L to bins.max).toSet)
    assert(got.values.forall { case (_, _, off) => off >= 0 && off < 10 })
    // stream-consistency: each doc's start == previous doc's start + tokens
    val byId = got.toSeq.sortBy(_._1)
    val starts = byId.map { case (_, (_, bin, off)) => bin * 10 + off }
    val expect = byId.map(_._2._1).scanLeft(0L)(_ + _).init
    assert(starts == expect)
  }
}
