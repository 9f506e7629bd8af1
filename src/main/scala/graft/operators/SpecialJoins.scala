package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, StructField, StructType}
import graft.sources.TableIO.table

/** The two join shapes Spark SQL has no native operator for — as-of and
  * range — implemented as the plans that survive scale rather than the
  * theta joins a naive translation produces.
  *
  * Why not `l.key = r.key AND r.t <= l.t` + latest-wins: Catalyst plans
  * the inequality as a residual on the key equi-join, so every left row
  * meets EVERY earlier right row of its key before ranking throws all but
  * one away — quadratic in events-per-key (the exact blowup
  * EventQueries.attribution documents and avoids). The operators here do
  * the union-window / bucket-explode rewrites once, generically.
  */
object SpecialJoins {

  /** Generic as-of join: for each `left` row, the single nearest `right`
    * row of the same `key` — BACKWARD (default): the latest with
    * `rightTime` ≤ `leftTime`; FORWARD: the earliest with
    * `rightTime` ≥ `leftTime`. Ties on time resolve toward the greatest
    * `rightTieBreak` in both directions, so results are deterministic for
    * any input. `payload` names the right columns to carry; left rows
    * with no matching right row get nulls — LEFT as-of semantics, like
    * every time-series engine's asof join.
    *
    * Plan: tag and union both inputs, ONE shuffle on the key, and a
    * running `last(_, ignoreNulls)` per payload column over (time,
    * right-first, tiebreak) order — linear in rows, never pairwise; the
    * forward direction is the same traversal with time descending, so a
    * left row's carried value is the smallest right time at-or-after it.
    * The same rewrite attribution uses, exposed as an operator. */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               rightTieBreak: String, payload: Seq[String],
               direction: String = "backward"): DataFrame = {
    require(Seq("backward", "forward").contains(direction),
      s"asOfJoin: direction must be backward|forward, got '$direction'")
    val pay = payload.distinct
    val reserved = Seq("_t", "_r", "_tb", "_p")
    require(pay.forall(!left.columns.contains(_)),
      s"payload columns ${pay.mkString(",")} must not collide with left columns")
    require(reserved.forall(c =>
        !left.columns.contains(c) && !right.columns.contains(c)),
      s"columns ${reserved.mkString(",")} are reserved by asOfJoin")
    // The payload travels as ONE struct, not as independent columns: a
    // per-column last(ignoreNulls) would skip a null FIELD of the latest
    // right row and stitch in that field from an older row — a "torn"
    // combination existing in no input row. The struct itself is
    // non-null on every right row, so last(ignoreNulls) carries the
    // whole matched row or nothing.
    val payloadType = StructType(pay.map(c =>
      StructField(c, right.schema(c).dataType, nullable = true)))
    val l = left
      .withColumn("_t", col(leftTime)).withColumn("_r", lit(0))
      .withColumn("_tb", lit(null).cast(right.schema(rightTieBreak).dataType))
      .withColumn("_p", lit(null).cast(payloadType))
    val r = right.select((key +: rightTime +: rightTieBreak +: pay).distinct
        .map(col): _*)
      .withColumn("_t", col(rightTime)).withColumn("_r", lit(1))
      .withColumn("_tb", col(rightTieBreak))
      .withColumn("_p", struct(pay.map(col): _*))
      .drop((Seq(rightTime, rightTieBreak) diff pay): _*)
      .drop(pay: _*)
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // right rows sort BEFORE left rows at equal time (_r desc) → the
    // carried value at a left row includes same-timestamp right rows
    // (inclusive <=); among right ties the greatest _tb lands last, and
    // rows fully tied on (time, tiebreak) fall back to a hash of the
    // payload itself — the pick among true duplicates stays deterministic
    // across shuffles instead of depending on physical arrival order.
    val timeOrd = if (direction == "forward") col("_t").desc else col("_t").asc
    val w = Window.partitionBy(col(key))
      .orderBy(timeOrd, col("_r").desc, col("_tb").asc_nulls_first,
        hash(col("_p")).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("_p", last(col("_p"), ignoreNulls = true).over(w))
    val unpacked = pay.foldLeft(carried)((df, c) =>
      df.withColumn(c, col("_p").getField(c)))
    unpacked.filter(col("_r") === 0).drop("_t", "_r", "_tb", "_p")
  }

  /** Generic range (band) join: attach to each fact row the band whose
    * [lo, hi) interval contains `valueCol`. Bands may have wildly varying
    * widths (the interesting case); they are exploded into fixed-width
    * buckets of `bucketWidth`, facts compute their bucket scan-side, and
    * the join is a plain EQUI-join on bucket plus the residual interval
    * check — never a BroadcastNestedLoop/Cartesian, which is what
    * Catalyst plans for a raw BETWEEN join and what dies first at scale
    * (every fact × every band). Replication = bands' width/bucketWidth;
    * pick bucketWidth near the median band width. */
  def bandJoin(facts: DataFrame, bands: DataFrame, valueCol: String,
               loCol: String, hiCol: String, bucketWidth: Double,
               maxBucketsPerBand: Long = 100000L): DataFrame = {
    require(bucketWidth > 0, s"bandJoin: bucketWidth must be > 0, got $bucketWidth")
    require(maxBucketsPerBand > 0,
      s"bandJoin: maxBucketsPerBand must be > 0, got $maxBucketsPerBand")
    // upper bucket from hi itself, NOT hi-ε: a bucket boundary falling
    // inside (hi-ε, hi) would otherwise lose the band's last bucket and
    // silently drop facts in it — a spurious extra bucket is harmless
    // (the residual interval filter removes it), a missing one is an
    // unrecoverable false negative.
    //
    // A band much wider than bucketWidth explodes into width/bucketWidth
    // rows; a mis-sized bucketWidth would OOM one task with no diagnostic,
    // so the explode fails loudly past `maxBucketsPerBand` instead.
    val lastBucket = floor(col(hiCol) / bucketWidth).cast("long")
    val firstBucket = floor(col(loCol) / bucketWidth).cast("long")
    // Null lo/hi keeps the pre-guard drop semantics (sequence(null) is
    // null, explode drops the row) instead of falling into the error
    // branch; the message coalesces each bound so a one-sided null can
    // never null the diagnostic itself away.
    val guardedLast = when(firstBucket.isNull || lastBucket.isNull,
        lit(null).cast("long"))
      .when(lastBucket - firstBucket < lit(maxBucketsPerBand), lastBucket)
      .otherwise(raise_error(concat(
        lit(s"bandJoin: band ["),
        coalesce(col(loCol).cast("string"), lit("null")), lit(", "),
        coalesce(col(hiCol).cast("string"), lit("null")),
        lit(s") explodes into > $maxBucketsPerBand buckets of width " +
          s"$bucketWidth; raise bucketWidth or maxBucketsPerBand"))
        .cast("string")).cast("long"))
    val exploded = bands.withColumn("_bucket",
      explode(sequence(firstBucket, guardedLast)))
    facts.withColumn("_bucket", floor(col(valueCol) / bucketWidth).cast("long"))
      .join(exploded, "_bucket")
      .filter(col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
      .drop("_bucket")
  }

  /** Shared band-table literals (exponential widths — exactly the shape a
    * single-bucket-per-band scheme cannot handle), used by both the Spark
    * dim and the oracle CTE. */
  private val bandsSql = (0 until 10).map { i =>
    val lo = if (i == 0) 0 else 1000 << (i - 1)
    val hi = 1000 << i
    s"('band$i', CAST($lo AS DOUBLE), CAST($hi AS DOUBLE))"
  }.mkString(", ")

  /** q_asof_join: for every click, the user's most recent error event at
    * or before it — the generic operator on a pair distinct from the
    * attribution gate's (purchase ← view). Timestamps emitted as epoch
    * micros (bigint) per the cross-engine timestamp discipline. */
  def asofClicksErrors(s: SparkSession, dir: String): DataFrame = {
    val e = graft.sources.TableIO.events(s, dir)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts_us"))
    val errors = e.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts_us").as("err_ts_us"),
        col("event_id").as("err_event_id"))
    asOfJoin(clicks, errors, key = "user_id",
      leftTime = "ts_us", rightTime = "err_ts_us",
      rightTieBreak = "err_event_id",
      payload = Seq("err_event_id", "err_ts_us"))
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("err_event_id"), col("err_ts_us"))
  }

  /** q_asof_forward: for every click, the user's NEXT error event at or
    * after it — the forward direction of the same single-shuffle as-of
    * operator (failure-impact analysis: "did an error follow this
    * click?"). */
  def asofForwardClicksErrors(s: SparkSession, dir: String): DataFrame = {
    val e = graft.sources.TableIO.events(s, dir)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts_us"))
    val errors = e.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts_us").as("err_ts_us"),
        col("event_id").as("err_event_id"))
    asOfJoin(clicks, errors, key = "user_id",
      leftTime = "ts_us", rightTime = "err_ts_us",
      rightTieBreak = "err_event_id",
      payload = Seq("err_event_id", "err_ts_us"),
      direction = "forward")
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("err_event_id"), col("err_ts_us"))
  }

  /** q_range_join: orders priced into exponential bands via the bucketed
    * range join, aggregated per band with exact decimal sums. */
  def ordersPriceBands(s: SparkSession, dir: String): DataFrame = {
    val bands = s.sql(s"SELECT * FROM VALUES $bandsSql AS t(band, lo, hi)")
    bandJoin(table(s, dir, "orders"), bands,
        valueCol = "o_totalprice", loCol = "lo", hiCol = "hi",
        bucketWidth = 4000.0)
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(DecimalType(28, 6))).cast(DoubleType)
          .as("total_price"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_asof_join" -> (asofClicksErrors _),
    "q_asof_forward" -> (asofForwardClicksErrors _),
    "q_range_join" -> (ordersPriceBands _))

  val oracles: Map[String, String] = Map(
    "q_asof_join" ->
      """WITH e AS (SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type
        |           FROM events),
        |c AS (SELECT event_id, user_id, ts_us FROM e WHERE event_type = 'click'),
        |r AS (SELECT user_id, ts_us AS err_ts_us, event_id AS err_event_id
        |      FROM e WHERE event_type = 'error')
        |SELECT c.event_id, c.user_id, c.ts_us, r.err_event_id, r.err_ts_us
        |FROM c LEFT JOIN r
        |  ON c.user_id = r.user_id AND r.err_ts_us <= c.ts_us
        |QUALIFY row_number() OVER (PARTITION BY c.event_id
        |  ORDER BY r.err_ts_us DESC NULLS LAST, r.err_event_id DESC) = 1""".stripMargin,
    "q_asof_forward" ->
      """WITH e AS (SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type
        |           FROM events),
        |c AS (SELECT event_id, user_id, ts_us FROM e WHERE event_type = 'click'),
        |r AS (SELECT user_id, ts_us AS err_ts_us, event_id AS err_event_id
        |      FROM e WHERE event_type = 'error')
        |SELECT c.event_id, c.user_id, c.ts_us, r.err_event_id, r.err_ts_us
        |FROM c LEFT JOIN r
        |  ON c.user_id = r.user_id AND r.err_ts_us >= c.ts_us
        |QUALIFY row_number() OVER (PARTITION BY c.event_id
        |  ORDER BY r.err_ts_us ASC NULLS LAST, r.err_event_id DESC) = 1""".stripMargin,
    "q_range_join" ->
      s"""WITH bands(band, lo, hi) AS (VALUES $bandsSql)
         |SELECT band, COUNT(*) AS n_orders,
         |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28, 6))) AS DOUBLE) AS total_price
         |FROM orders JOIN bands
         |  ON o_totalprice >= lo AND o_totalprice < hi
         |GROUP BY band""".stripMargin)
}
