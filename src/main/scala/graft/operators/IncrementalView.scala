package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance from MERGE change feeds —
  * the 100 TB answer to "keep a grouped aggregate fresh under daily
  * deltas without recomputing the fact table". A change feed recorded
  * with pre-images ([[Merge.mergeFramesTagged]] `preImage = true`) carries
  * everything a self-maintainable aggregate needs:
  *
  *  - `insert` row  → add its contribution to its group;
  *  - `delete` row  → retract its contribution (the row IS the pre-image);
  *  - `update` row  → add the post-image contribution AND retract the
  *    [[Merge.PreCol]] pre-image contribution — two group deltas when the
  *    update moved the row between groups.
  *
  * [[applyChanges]] maintains the algebraic aggregates (COUNT, SUM, and
  * AVG = SUM/COUNT) exactly: cost is one shuffle of the DELTA-sized feed
  * plus one key join against the view — never a fact-table scan. SUM
  * nullability is preserved via a per-column non-null contribution count
  * (`nn_<c>`), so a group whose values are all null reports SQL's NULL
  * sum, not 0 (classic view-maintenance trap: Griffin & Libkin,
  * "Incremental Maintenance of Views with Duplicates", SIGMOD 1995 —
  * counting algebra over bag semantics).
  *
  * MIN/MAX are not self-maintainable under retraction (deleting the
  * current minimum needs the runner-up, which the view no longer has);
  * [[refreshGroups]] implements the standard fallback — recompute ONLY
  * the groups the feed touched from the post-merge fact table, carry
  * every untouched group forward by anti-join. Cost is delta-proportional
  * in groups; with the fact in a [[graft.sources.BucketedTable]] (or
  * behind `readWhere` file skipping) the recompute scan prunes to the
  * touched groups' buckets instead of the full table.
  *
  * Exactness contract: maintain sums over exact types (integral /
  * DecimalType). Float/double sums drift from a recompute because
  * addition order differs — cast to decimal at the fact projection,
  * to double only at the output edge.
  */
object IncrementalView {

  /** `groupKeys` — view grain; `sumCols` — exact-typed measure columns,
    * each maintained as `sum_<c>` + its non-null count `nn_<c>`;
    * `countName` — the COUNT(*) column. */
  final case class Spec(groupKeys: Seq[String], sumCols: Seq[String] = Nil,
                        countName: String = "n")

  private def sumAggs(spec: Spec): Seq[Column] =
    spec.sumCols.flatMap(c => Seq(
      sum(col(c)).as(s"sum_$c"), count(col(c)).as(s"nn_$c")))

  /** Build the view's initial state from the base fact — one grouped
    * aggregation, the only full-table pass the view ever takes. */
  def initialize(base: DataFrame, spec: Spec): DataFrame = {
    val aggs = count(lit(1)).as(spec.countName) +: sumAggs(spec)
    base.groupBy(spec.groupKeys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Advance the view by one recorded change feed. Groups whose row
    * count reaches zero leave the view (their sums are exactly retracted
    * first, so no residue survives). */
  def applyChanges(view: DataFrame, feed: DataFrame, spec: Spec): DataFrame = {
    val hasPre = feed.columns.contains(Merge.PreCol)
    val keys = spec.groupKeys
    val a = col(Merge.ActionCol)
    def rowSide(sign: Int, filter: Column)(df: DataFrame): DataFrame =
      df.filter(filter).select(
        (keys ++ spec.sumCols).map(col) :+ lit(sign.toLong).as("_sign"): _*)
    // Update retractions need the pre-image struct; a feed recorded
    // without it cannot say which group the OLD row belonged to. The
    // guard rides both row filters lazily (assert_true returns null on
    // pass, so it never changes the predicate) — no extra driver action.
    val guard =
      if (hasPre) lit(true)
      else coalesce(assert_true(a =!= lit("update"),
        lit(s"feed has update rows but no ${Merge.PreCol} pre-image " +
          "column; record the merge with preImageFeed = true"))
        .cast("boolean"), lit(true))
    val post = rowSide(1, guard && a.isin("insert", "update"))(feed)
    val del = rowSide(-1, guard && a === "delete")(feed)
    val contrib =
      if (hasPre) {
        val preU = feed.filter(a === "update").select(
          (keys ++ spec.sumCols).map(c => col(s"${Merge.PreCol}.$c").as(c)) :+
            lit(-1L).as("_sign"): _*)
        post.unionByName(preU).unionByName(del)
      } else post.unionByName(del)
    val dAggs = sum(col("_sign")).as("_dn") +: spec.sumCols.flatMap(c => Seq(
      sum(col(c) * col("_sign")).as(s"_dsum_$c"),
      sum(when(col(c).isNotNull, col("_sign")).otherwise(lit(0L)))
        .as(s"_dnn_$c")))
    val delta = contrib.groupBy(keys.map(col): _*).agg(dAggs.head, dAggs.tail: _*)
    val cond = keys.map(k => col(s"v.$k") <=> col(s"d.$k")).reduce(_ && _)
    view.alias("v").join(delta.alias("d"), cond, "full_outer").select(
      keys.map(k => coalesce(col(s"v.$k"), col(s"d.$k")).as(k)) ++
        Seq((coalesce(col(s"v.${spec.countName}"), lit(0L)) +
          coalesce(col("d._dn"), lit(0L))).as(spec.countName)) ++
        spec.sumCols.flatMap { c =>
          val nn = coalesce(col(s"v.nn_$c"), lit(0L)) +
            coalesce(col(s"d._dnn_$c"), lit(0L))
          val sm = coalesce(col(s"v.sum_$c"), lit(0)) +
            coalesce(col(s"d._dsum_$c"), lit(0))
          Seq(when(nn > lit(0L), sm).as(s"sum_$c"), nn.as(s"nn_$c"))
        }: _*)
      .filter(col(spec.countName) > 0)
  }

  /** Build a view of ARBITRARY aggregates (min/max/collect/…) with the
    * same grain contract as [[initialize]]; pair with [[refreshGroups]]. */
  def initializeWith(base: DataFrame, groupKeys: Seq[String],
                     aggs: Seq[Column]): DataFrame =
    base.groupBy(groupKeys.map(col): _*).agg(aggs.head, aggs.tail: _*)

  /** Delta-proportional refresh for aggregates that are NOT algebraic
    * under retraction (MIN/MAX after a delete of the extremum): recompute
    * exactly the groups the feed touched — post-image keys, update
    * pre-image keys (a moved row dirties BOTH groups), delete keys — from
    * the post-merge fact, and carry every untouched group forward
    * unread. Two delta-keyed joins; the fact scan is semi-join-pruned to
    * touched groups (bucket/file pruning applies when `postMergeFact`
    * supports it). */
  def refreshGroups(view: DataFrame, feed: DataFrame, postMergeFact: DataFrame,
                    groupKeys: Seq[String], aggs: Seq[Column]): DataFrame = {
    val keyCols = groupKeys.map(col)
    val postKeys = feed.select(keyCols: _*)
    val touched =
      (if (feed.columns.contains(Merge.PreCol))
        postKeys.unionByName(feed.filter(col(Merge.ActionCol) === "update")
          .select(groupKeys.map(k => col(s"${Merge.PreCol}.$k").as(k)): _*))
      else postKeys).distinct()
    val joinKeys = groupKeys.toIndexedSeq
    val untouched = view.join(touched, joinKeys, "left_anti")
    val recomputed = postMergeFact.join(touched, joinKeys, "left_semi")
      .groupBy(keyCols: _*).agg(aggs.head, aggs.tail: _*)
    untouched.unionByName(recomputed)
  }
}
