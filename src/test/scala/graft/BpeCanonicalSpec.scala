package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextQueries

/** BPE canonicality: the double-delimited literal-`replace` merge (what
  * txtBpeTrain/txtBpeApply execute in Spark and the DuckDB oracle
  * replays) must equal canonical greedy left-to-right merge-and-skip on
  * EVERY symbol sequence — including runs of a repeated pair, where a
  * single-delimiter encoding under-merges ('aaaa' + (a,a) → [aa,a,a]
  * instead of [aa,aa]). Plus: the driver-finish train is bit-identical
  * to the distributed vocab-resident train. */
class BpeCanonicalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  private val d = ""

  /** The Spark/DuckDB string path in plain Scala: double-boundary
    * delimiting, one literal left-to-right replace, parse back. */
  private def replacePath(syms: Seq[String], l: String, r: String): Seq[String] = {
    val s = d + d + syms.map(_ + d + d).mkString
    val merged = s.replace(d + l + d + d + r + d, d + l + r + d)
    merged.split(d).filter(_.nonEmpty).toSeq
  }

  test("replace path merges runs canonically (the 'aaaa' counterexample)") {
    assert(replacePath(Seq("a", "a", "a", "a"), "a", "a") == Seq("aa", "aa"))
    assert(replacePath(Seq("a", "a", "a", "a", "a"), "a", "a") ==
      Seq("aa", "aa", "a"))
    assert(replacePath(Seq.fill(8)("a"), "a", "a") == Seq.fill(4)("aa"))
  }

  test("replace path == canonical merge-and-skip on random sequences") {
    val rnd = new scala.util.Random(42)
    val alphabet = Vector("a", "b", "ab", "ba", "c")
    for (_ <- 1 to 2000) {
      val syms = Vector.fill(1 + rnd.nextInt(12))(
        alphabet(rnd.nextInt(alphabet.size)))
      val l = alphabet(rnd.nextInt(alphabet.size))
      val r = alphabet(rnd.nextInt(alphabet.size))
      val expect = TextQueries.mergePairOnce(syms.toArray, l, r).toSeq
      assert(replacePath(syms, l, r) == expect,
        s"syms=$syms rule=($l,$r)")
    }
  }

  test("driver-finish train is bit-identical to the distributed train") {
    for (n <- Seq(8, 16)) {
      val dist = TextQueries.txtBpeTrain(spark, dir, n).collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
        .sortBy(_._1).toSeq
      val drv = TextQueries.txtBpeTrainDriver(spark, dir, n).collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
        .sortBy(_._1).toSeq
      assert(dist == drv, s"merge tables diverge at nMerges=$n")
      assert(dist.size == n)
    }
  }
}
