package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type 2 MERGE — the standard warehouse pattern
  * (Kimball) for keeping full attribute history of a dimension: instead of
  * overwriting a changed row, the current version is CLOSED (`valid_to` =
  * effective date, `is_current` = false) and a new open-ended version is
  * inserted. The reference ecosystem drives this through chained Delta
  * MERGE statements; here it is one operator with the same single-shuffle
  * shape as [[Merge]]:
  *
  *  - one full-outer join of the CURRENT slice against the incoming
  *    snapshot on the dimension keys (history rows never join — they are
  *    unioned back untouched, a metadata-only pass-through);
  *  - per joined row, the outcome set is emitted through `inline(array(
  *    ...))` — a changed match yields its closed old version AND its new
  *    open version from the SAME joined row, so no second join or
  *    self-union of the dimension is needed. Generate is codegen'd; the
  *    whole merge stays one shuffle + one pass.
  *
  * Change detection is null-safe (`<=>` per tracked column), so a
  * null→value or value→null transition versions the row, while null→null
  * does not. A source key absent from the snapshot leaves its current
  * version open — feed-style partial snapshots only assert about the keys
  * they carry (close-missing semantics, when wanted, are one DELETE-style
  * pass the caller can express with [[ManagedTable.update]]).
  *
  * At 100 TB the current slice is a small fraction of the dimension
  * (history dominates), and the snapshot is delta-sized — the join
  * shuffles only those two; history bytes move zero times.
  */
object Scd2 {

  val FromCol = "valid_from"
  val ToCol = "valid_to"
  val CurCol = "is_current"

  private def metaCols = Seq(FromCol, ToCol, CurCol)

  /** Open a first-version dimension from an initial snapshot. */
  def initialize(snapshot: DataFrame, effective: Column): DataFrame =
    snapshot
      .withColumn(FromCol, effective.cast("string"))
      .withColumn(ToCol, lit(null).cast("string"))
      .withColumn(CurCol, lit(true))

  /** Advance the dimension by one snapshot with effect date `effective`.
    * Target carries keys ++ attributes ++ (valid_from, valid_to,
    * is_current); the snapshot carries keys ++ the same attributes. */
  def merge(target: DataFrame, snapshot: DataFrame, keys: Seq[String],
            tracked: Seq[String], effective: Column): DataFrame = {
    val attrs = target.columns.filterNot(c =>
      keys.contains(c) || metaCols.contains(c)).toIndexedSeq
    val missing = (keys ++ attrs).filterNot(snapshot.columns.contains)
    require(missing.isEmpty,
      s"SCD2 snapshot lacks dimension column(s): ${missing.mkString(", ")}")
    val badTracked = tracked.filterNot(attrs.contains)
    require(badTracked.isEmpty,
      s"tracked column(s) not dimension attributes: ${badTracked.mkString(", ")}")
    require(tracked.nonEmpty, "SCD2 merge needs at least one tracked column")

    val outCols = (keys ++ attrs ++ metaCols).toIndexedSeq
    val hist = target.filter(!col(CurCol)).select(outCols.map(col): _*)
    val t = target.filter(col(CurCol))
      .withColumn("__t_present", lit(true)).alias("t")
    // Two source rows for one key would open two concurrent versions —
    // reject like Delta MERGE's multiple-matches error. The count rides
    // the key shuffle the join needs anyway.
    val keyN = count(lit(1)).over(
      org.apache.spark.sql.expressions.Window.partitionBy(keys.map(col): _*))
    val s = snapshot.withColumn("__key_n", keyN)
      .withColumn("__s_present", lit(true)).alias("s")
    val keyCond = keys.map(k => col(s"t.$k") <=> col(s"s.$k")).reduce(_ && _)
    val joined = t.join(s, keyCond, "full_outer")

    val tPresent = col("t.__t_present").isNotNull
    val sPresent = col("s.__s_present").isNotNull
    val matched = tPresent && sPresent
    val changed = tracked.map(c => !(col(s"t.$c") <=> col(s"s.$c")))
      .reduce(_ || _)
    val dupGuard = coalesce(
      assert_true(!sPresent || col("s.__key_n") <= 1,
        lit(s"SCD2 snapshot has duplicate rows for key (${keys.mkString(", ")})"))
        .cast("boolean"), lit(true))

    def row(fields: Seq[(String, Column)]): Column =
      struct(fields.map { case (n, c) => c.as(n) }: _*)
    val eff = effective.cast("string")
    val keep = row(
      (keys ++ attrs).map(c => c -> col(s"t.$c")) ++ Seq(
        FromCol -> col(s"t.$FromCol"), ToCol -> col(s"t.$ToCol"),
        CurCol -> col(s"t.$CurCol")))
    val closed = row(
      (keys ++ attrs).map(c => c -> col(s"t.$c")) ++ Seq(
        FromCol -> col(s"t.$FromCol"), ToCol -> eff, CurCol -> lit(false)))
    val opened = row(
      (keys ++ attrs).map(c => c -> col(s"s.$c")) ++ Seq(
        FromCol -> eff, ToCol -> lit(null).cast("string"),
        CurCol -> lit(true)))

    val outcomes =
      when(matched && changed, array(closed, opened))
        .when(matched && !changed, array(keep))
        .when(tPresent && !sPresent, array(keep))
        .otherwise(array(opened)) // snapshot-only key: first version
    joined.filter(dupGuard).select(inline(outcomes))
      .unionByName(hist)
  }

  /** Point-in-time read: the version of each key live at `asOf` —
    * `valid_from <= asOf < valid_to` with an open upper bound. Plain
    * filter; combine with a time-traveled snapshot read for full
    * bitemporal access. */
  def asOf(dim: DataFrame, asOfDate: Column): DataFrame = {
    val d = asOfDate.cast("string")
    dim.filter(col(FromCol) <= d &&
      (col(ToCol).isNull || col(ToCol) > d))
  }

  /** TEMPORAL JOIN: attach to each fact row the dimension version valid
    * at the fact's own time (`valid_from <= t < valid_to`, open upper
    * bound) — the per-row generalization of [[asOf]], and the standard
    * fact-to-SCD2 lookup. LEFT join: facts predating a key's first
    * version carry nulls rather than vanishing.
    *
    * Plan shape: an EQUI join on the dimension keys with the validity
    * range as a residual predicate — hash/broadcast join territory, never
    * a broadcast-nested-loop, because the equality is extractable. Each
    * fact matches at most one version (validity windows are
    * non-overlapping per key by [[merge]] construction), so the join
    * never amplifies. At 100 TB the dimension (history included) is
    * still dim-sized — broadcast when small; shuffle both sides on the
    * key when not, with the fact side's natural key distribution doing
    * the work. */
  def temporalJoin(facts: DataFrame, dim: DataFrame, keys: Seq[String],
                   factTime: Column): DataFrame = {
    val t = factTime.cast("string")
    val f = facts.alias("f")
    val d = dim.alias("d")
    val keyCond = keys.map(k => col(s"f.$k") === col(s"d.$k")).reduce(_ && _)
    val validCond = col(s"d.$FromCol") <= t &&
      (col(s"d.$ToCol").isNull || col(s"d.$ToCol") > t)
    f.join(d, keyCond && validCond, "left")
      .select(facts.columns.map(c => col(s"f.$c")) ++
        dim.columns.filterNot(keys.contains).map(c => col(s"d.$c")): _*)
  }
}
