package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The distributed manifest-prune path of readWhere (VERDICT r11 #8):
  * past the size threshold the span verdicts run as a Catalyst plan —
  * text scan → verdict project → per-file aggregate — so a 10^6-file
  * manifest never serializes through one driver thread; only the
  * prunable file NAMES are collected. These tests pin (a) the plan
  * shape, (b) verdict-for-verdict agreement with the streamed path on
  * numeric, string (URL-encoded), all-null, partial-null, and legacy
  * 4-field manifest lines, and (c) end-to-end readWhere equivalence
  * with the threshold forced to zero. */
class SkippingPruneSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def withThreshold[A](bytes: Long)(body: => A): A = {
    val key = "spark.graft.skipping.distributedPruneBytes"
    spark.conf.set(key, bytes.toString)
    try body finally spark.conf.unset(key)
  }

  test("pruneVerdicts is a distributed aggregate over a text scan") {
    val dir = Files.createTempDirectory("graft_prune_plan")
    Files.writeString(dir.resolve("stats.tsv"),
      "f1.parquet\ta\tnum\t0\t9\nf2.parquet\ta\tnum\t10\t19\n")
    val v = ManagedTable.pruneVerdicts(spark,
      dir.resolve("stats.tsv").toString, Seq(("a", 0, 5)))
    val plan = v.queryExecution.optimizedPlan.toString
    assert(plan.contains("Aggregate"), s"no aggregate in plan:\n$plan")
    assert(plan.toLowerCase.contains("relation"),
      s"no file relation in plan:\n$plan")
    assert(v.collect().map(_.getString(0)).toSeq == Seq("f2.parquet"))
  }

  test("distributed verdicts agree with the streamed path on every " +
      "manifest line shape") {
    val dir = Files.createTempDirectory("graft_prune_agree")
    // one manifest exercising: numeric overlap/no-overlap, URL-encoded
    // string spans (space → +), all-null spans, partial-null spans,
    // unknown kinds, legacy 4-field numeric lines, and a column no range
    // mentions.
    val manifest = Seq(
      "keep_num.parquet\ta\tnum\t5\t15",          // overlaps [0,10]
      "prune_num.parquet\ta\tnum\t11\t20",        // disjoint from [0,10]
      "legacy_keep.parquet\ta\t8\t9",             // 4-field, overlaps
      "legacy_prune.parquet\ta\t30\t40",          // 4-field, disjoint
      "prune_allnull.parquet\ta\tnull\tnull",     // all-null: prune
      "keep_partial.parquet\ta\tnum\tnull\t5",    // partial stats: stay
      "keep_unknown.parquet\ta\tgeo\t0\t1",       // unknown kind: stay
      "keep_str.parquet\ts\tstr\tAA+AA\tAB",      // "AA AA".."AB" vs [AA,AZ]
      "prune_str.parquet\ts\tstr\tBA\tBZ",        // past the hi bound
      "other_col.parquet\tz\tnum\t999\t999"       // unmentioned column: stay
    ).mkString("", "\n", "\n")
    Files.writeString(dir.resolve("stats.tsv"), manifest)
    val ranges = Seq(("a", 0, 10), ("s", "AA", "AZ"))
    val got = ManagedTable.pruneVerdicts(spark,
        dir.resolve("stats.tsv").toString, ranges)
      .collect().map(_.getString(0)).toSet
    assert(got == Set("prune_num.parquet", "legacy_prune.parquet",
      "prune_allnull.parquet", "prune_str.parquet"))
  }

  test("readWhere on the distributed path returns exactly the streamed " +
      "path's rows and file set") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_prune_e2e").toString
    val df = spark.range(10000L)
      .select((col("id") / 100).cast("int").as("a"),
        (col("id") % 100).cast("int").as("b"), col("id").as("payload"))
    ManagedTable.overwrite(root, df.repartition(16))
    ManagedTable.optimize(spark, root, targetFileBytes = 8L << 10,
      zorderBy = Seq("a", "b"))
    val full = ManagedTable.read(spark, root)
    val streamed = ManagedTable.readWhere(spark, root,
      Seq(("a", 10, 20), ("b", 30, 40)))
    val distributed = withThreshold(0L) {
      val d = ManagedTable.readWhere(spark, root,
        Seq(("a", 10, 20), ("b", 30, 40)))
      // materialize file list + rows inside the conf scope
      (d.inputFiles.toSet, d.collect().toSet)
    }
    assert(distributed._1 == streamed.inputFiles.toSet,
      "distributed prune opened a different file set than the streamed prune")
    assert(distributed._2 == streamed.collect().toSet)
    assert(distributed._1.size < full.inputFiles.length)
    // all-pruned box still answers cleanly on the distributed path
    val none = withThreshold(0L) {
      ManagedTable.readWhere(spark, root, Seq(("a", 500, 600))).count()
    }
    assert(none == 0)
  }
}
