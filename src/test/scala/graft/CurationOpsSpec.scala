package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{MixQueries, PackQueries, TextQueries}

/** Behavioral invariants for the corpus-curation operators added in round
  * 7, on the sf0.001 fixtures — properties the oracle hash-compare can't
  * express directly (coverage, monotonicity, cross-operator consistency). */
class CurationOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("chunk windows cover every document exactly to its end") {
    val docs = graft.sources.TableIO.table(spark, dir, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
    val cov = PackQueries.chunkWindows(spark, dir)
      .groupBy("doc_id")
      .agg(min(col("start_tok")).as("first_start"),
        max(col("start_tok") + col("chunk_tokens")).as("cover_end"),
        max(col("chunk_idx")).as("last_idx"),
        count(lit(1)).as("n_chunks"))
      .join(docs, "doc_id")
    assert(cov.filter(col("first_start") =!= 0).isEmpty, "first chunk not at 0")
    assert(cov.filter(col("cover_end") =!= col("n")).isEmpty,
      "a document tail is uncovered or overshot")
    assert(cov.filter(col("last_idx") =!= col("n_chunks") - 1).isEmpty,
      "chunk indexes not dense")
    val bad = PackQueries.chunkWindows(spark, dir)
      .filter(col("chunk_tokens") < 1 || col("chunk_tokens") > 64)
    assert(bad.isEmpty, "chunk size out of [1, window]")
  }

  test("stratified sample takes min(nPer, stratum size) and nests by nPer") {
    val sizes = graft.sources.TableIO.table(spark, dir, "documents")
      .groupBy("source").agg(count(lit(1)).as("sz"))
    val got = MixQueries.sampleStratified(spark, dir, nPer = 20)
      .groupBy("source").agg(count(lit(1)).as("n"), max("stratum_rank").as("mx"))
      .join(sizes, "source")
    assert(got.filter(col("n") =!= least(lit(20), col("sz"))).isEmpty)
    assert(got.filter(col("mx") =!= col("n")).isEmpty, "ranks not dense from 1")
    // Determinism gives the prefix property: a smaller draw is a subset.
    val small = MixQueries.sampleStratified(spark, dir, nPer = 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val large = MixQueries.sampleStratified(spark, dir, nPer = 20)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(large))
  }

  test("boilerplate counts are bounded and monotone in minDocs") {
    val b5 = TextQueries.txtBoilerplate(spark, dir, minDocs = 5)
    assert(b5.filter(col("n_boiler") > col("n_grams")).isEmpty)
    // minDocs=1 marks every gram boilerplate (df >= 1 always)
    val b1 = TextQueries.txtBoilerplate(spark, dir, minDocs = 1)
    assert(b1.filter(col("boiler_frac") =!= 1.0).isEmpty)
    // raising the threshold can only shrink each doc's boilerplate count
    val joined = b5.select(col("doc_id"), col("n_boiler").as("hi"))
      .join(TextQueries.txtBoilerplate(spark, dir, minDocs = 2)
        .select(col("doc_id"), col("n_boiler").as("lo")), "doc_id")
    assert(joined.filter(col("hi") > col("lo")).isEmpty)
  }

  test("incremental dedup equals the self-join restricted to the delta") {
    val inc = TextQueries.dedupIncremental(spark, dir)
      .select("doc_new", "doc_existing").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = TextQueries.dedupJaccardShingle(spark, dir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) } // both orientations
      .filter { case (n, e) => n % 10 == 0 && e % 10 != 0 }
      .toSet
    assert(inc == full)
  }

  test("stop-shingle df-cap bounds candidate fan-out on a hot shingle") {
    import spark.implicits._
    // 40 docs that share ONE hot shingle (999) and are otherwise unique —
    // with only 2 shingles each, the PPJoin prefix is the whole set, so the
    // hot shingle alone fans out into ~N²/2 candidates. Docs 100/101 are a
    // genuine near-dup pair sharing rare shingles 77/78.
    val docs = (1 to 40).map(i => (i.toLong, Array(999L, 1000L + i))) ++
      Seq((100L, Array(999L, 77L, 78L)), (101L, Array(999L, 77L, 78L)))
    val sh = docs.toDF("doc_id", "shingles")
      .withColumn("n_sh", size(col("shingles")))
    def pairs(cap: Option[Double]): Set[(Long, Long)] =
      TextQueries.jaccardCandidates(sh, 0.5, cap)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val unguarded = pairs(None)
    assert(unguarded.size >= 40 * 39 / 2, s"expected hot fan-out, got ${unguarded.size}")
    // cap at 20% of 42 docs ≈ 9 → the df-42 hot shingle is excluded from
    // candidate generation; the rare-shingle pair must survive
    val capped = pairs(Some(0.2))
    assert(capped == Set((100L, 101L)), s"got $capped")
  }

  test("substring spans are maximal, disjoint, k-bounded, and in-range") {
    val k = 5
    val spans = TextQueries.dedupSubstringSpans(spark, dir, k)
    assert(spans.filter(col("span_tokens") < k).isEmpty,
      "a span shorter than the gram length cannot be certified duplicated")
    val docs = graft.sources.TableIO.table(spark, dir, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
    assert(spans.join(docs, "doc_id")
      .filter(col("span_start") < 1 || col("span_end") > col("n")).isEmpty,
      "span outside the document's token range")
    // Maximality/disjointness: consecutive spans per doc must be separated
    // by ≥ 2 positions — a gap of 1 would have merged in the islands pass.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("span_start")
    val gaps = spans
      .withColumn("prev_end", lag(col("span_end"), 1).over(w))
      .filter(col("prev_end").isNotNull &&
        col("span_start") <= col("prev_end") + 1)
    assert(gaps.isEmpty, "adjacent or overlapping spans were not merged")
    // Certification: every selected gram really is corpus-duplicated — spot
    // check that each doc's FIRST span's leading k-gram occurs ≥ 2 times.
    val grams = graft.sources.TableIO.table(spark, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= k) // sequence(1, 0) would DESCEND
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(1, size(toks) - ${k - 1}), " +
          s"i -> array_join(slice(toks, i, $k), ' '))")).as("gram"))
    val firstSpanGram = spans.withColumn(
        "rk", row_number().over(w)).filter(col("rk") === 1)
      .join(graft.sources.TableIO.table(spark, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("toks")), "doc_id")
      .select(col("doc_id"), expr(
        s"array_join(slice(toks, span_start, $k), ' ')").as("gram"))
    val freq = grams.groupBy("gram").agg(count(lit(1)).as("occ"))
    assert(firstSpanGram.join(freq, "gram").filter(col("occ") < 2).isEmpty,
      "a span starts with a gram that is not corpus-duplicated")
  }

  test("domain-budget mixture equals the per-domain quality-ranked prefix") {
    // Re-derive the selection with a plain per-domain window (fine at
    // sf0.001) and demand set equality with the distributed prefix-sum
    // path — the skew-safe plan must not change WHAT is selected.
    val got = MixQueries.mixDomainBudget(spark, dir)
    val scored = TextQueries.txtQuality(spark, dir)
      .select(col("doc_id"), col("quality_score"),
        col("n_tokens").cast("long").as("n_tokens"))
      .join(graft.sources.TableIO.table(spark, dir, "documents")
        .select("doc_id", "source"), "doc_id")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("source")
      .orderBy(col("quality_score").desc, col("doc_id").asc)
    val budgets = got.select("source").distinct()
      .join(got.groupBy("source").agg(lit(1)).select("source"), "source")
    val naive = scored
      .withColumn("cum", coalesce(sum(col("n_tokens"))
        .over(w.rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, -1)), lit(0L)))
      .withColumn("budget",
        (((col("source").substr(lit(4), lit(9)).cast("int")) % 4) + 1) * 400L)
      .filter(col("cum") < col("budget"))
      .select(col("doc_id"), col("cum"))
    val a = got.select(col("doc_id"), col("domain_cum_before")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = naive.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b, s"distributed selection diverges: only-got=${a -- b} only-naive=${b -- a}")
    assert(budgets.count() > 1, "fixture should exercise multiple domains")
  }

  test("temperature mix repeats are dense and within one of the domain rate") {
    val mix = MixQueries.mixTemperature(spark, dir)
    // copy_idx is dense 1..reps per doc
    val perDoc = mix.groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n"), max("copy_idx").as("mx"), min("copy_idx").as("mn"))
    assert(perDoc.filter(col("mn") =!= 1 || col("mx") =!= col("n")).isEmpty)
    // every doc's repeat count is floor(rate) or floor(rate)+1 for its
    // domain's sqrt-temperature rate
    val rates = graft.sources.TableIO.table(spark, dir, "documents")
      .groupBy("source").agg(count(lit(1)).as("cnt"))
      .withColumn("rate",
        (floor(sqrt(col("cnt").cast("double"))) * 8).cast("double") / col("cnt"))
    val bad = perDoc.join(rates, "source")
      .filter(col("n") < floor(col("rate")) || col("n") > floor(col("rate")) + 1)
    assert(bad.isEmpty, "a repeat count outside {floor(rate), floor(rate)+1}")
  }

  test("leakage-safe split assigns every cluster to exactly one split") {
    val sl = MixQueries.splitLeakage(spark, dir)
    val perGroup = sl.groupBy("group_id")
      .agg(countDistinct(col("split")).as("n_splits"))
    assert(perGroup.filter(col("n_splits") =!= 1).isEmpty)
    val nDocs = graft.sources.TableIO.table(spark, dir, "documents").count()
    assert(sl.count() == nDocs && sl.select("doc_id").distinct().count() == nDocs)
  }
}
