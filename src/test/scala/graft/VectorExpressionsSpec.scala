package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.VectorExpressions

/** Equivalence of the native WordNgramHashes expression with the SQL
  * higher-order forms it replaced — the sketch queries' correctness rests
  * on these being byte-identical. */
class VectorExpressionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a b",                          // fewer tokens than the window
    "x y z",                        // exactly one shingle
    "dup dup dup dup dup",          // repeated shingles → distinct matters
    "unicode héllo wörld tokens αβγ δεζ ηθι",
    "").map(Tuple1(_)).toDF("text").withColumn("toks", split(col("text"), " "))

  test("3-gram xxhash64 shingles equal the transform/concat_ws HOF chain") {
    val hof = expr(
      "array_distinct(transform(sequence(0, size(toks)-3), " +
        "i -> xxhash64(concat_ws(' ', toks[i], toks[i+1], toks[i+2]))))")
    val rows = docs
      .select(
        VectorExpressions.wordNgramHashes(col("toks"), 3, "xxhash64", distinct = true)
          .as("native"),
        when(size(col("toks")) >= 3, hof).otherwise(array().cast("array<bigint>"))
          .as("hofv"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
  }

  test("1-gram murmur3 hashes equal transform(toks, hash)") {
    val rows = docs.filter(size(col("toks")) > 0)
      .select(
        VectorExpressions.wordNgramHashes(col("toks"), 1, "murmur3", distinct = false)
          .as("native"),
        transform(col("toks"), t => hash(t).cast(LongType)).as("hofv"))
      .collect()
    rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("md5_60 equals conv(substring(md5(t), 1, 15), 16, 10)") {
    val rows = docs.filter(size(col("toks")) > 0)
      .select(
        VectorExpressions.wordNgramHashes(col("toks"), 1, "md5_60", distinct = false)
          .as("native"),
        transform(col("toks"),
          t => conv(substring(md5(t), 1, 15), 16, 10).cast(LongType)).as("hofv"))
      .collect()
    rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
  }
}
