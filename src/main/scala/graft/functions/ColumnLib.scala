package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column-helper library: the reference's composed-built-in "UDF library"
  * (reference: listings/mls_listings_transform.py:16-51) re-expressed as pure
  * `Column => Column` Scala functions. Everything here stays inside Catalyst
  * whole-stage codegen — no Scala UDFs, no serialization boundary — so the
  * helpers cost the same as hand-written SQL at any scale.
  */
object ColumnLib {

  /** Horizontal (row-wise) sum of numeric flag columns.
    * Reference: mls_listings_transform.py:16-18 (`sum_columns`). */
  def sumColumns(cols: Seq[Column]): Column = cols.reduce(_ + _)

  /** Validity check with an explicit null-allowed switch; never returns null
    * (three-valued logic collapsed to boolean).
    * Reference: mls_listings_transform.py:20-25 (`check_valid_value`). */
  def checkValidValue(c: Column, valid: Seq[String], nullAllowed: Boolean): Column =
    when(c.isNull, lit(nullAllowed)).otherwise(c.isin(valid: _*))

  /** Empty-or-blank string to typed null.
    * Reference: mls_listings_transform.py:36-37 (`change_blank_to_null`). */
  def changeBlankToNull(c: Column): Column =
    when(trim(c) === lit(""), lit(null).cast(StringType)).otherwise(c)

  /** Full-string regex match. The reference's `regexp_like_with_expr`
    * (mls_listings_transform.py:49-51) is a FULL match (replace-whole-string
    * trick), while Spark's `rlike` is a contains-test — so the pattern is
    * anchored in a non-capturing group to preserve exact semantics. */
  def regexpLike(c: Column, pattern: String): Column =
    c.rlike("^(?:" + pattern + ")$")

  /** OR-chain of substring containment tests.
    * Reference: mls_listings_transform.py:31-34 (`instr_with_expr` usage). */
  def containsAny(c: Column, values: Seq[String]): Column =
    values.map(v => instr(c, v) > 0).reduce(_ || _)

  /** Phone cleaner — exact reference semantics (transform.py:39-47):
    * strip `-`, `(`, `)` and spaces; reject fake prefixes 000/111/999/123
    * (checked on the RAW value's first 3 chars); keep a clean 10-digit
    * number, or the first 10 digits when an extension marker ('x') follows
    * a longer value; null otherwise. */
  def cleanPhoneNumber(c: Column): Column = {
    val t1 = translate(c, "-() ", "")
    val t2 = substring(t1, 1, 10)
    when(substring(c, 1, 3).isin("000", "111", "999", "123"), lit(null).cast(StringType))
      .otherwise(when((length(t1) === 10) && !lower(t1).contains("x"), t1)
        .otherwise(when((length(t1) > 10) && lower(t1).contains("x"), t2)
          .otherwise(lit(null).cast(StringType))))
  }

  /** Collapse runs of spaces to a single space — equivalent of the
    * reference's `replace(' ','<>')/replace('><','')/replace('<>',' ')`
    * squeeze trick (mls_listings_transform.py:313-314). */
  def squeezeSpaces(c: Column): Column = regexp_replace(c, " +", " ")

  // --------------------------------------------------------------------------
  // Projection machinery (SURVEY §2.2 P1-P5) — column-name-driven generic
  // transforms over a dynamic 133-col schema; all resolve to a single `select`
  // so Catalyst prunes/pushes through them freely.
  // --------------------------------------------------------------------------

  /** Alias every column with a prefix (join disambiguation).
    * Reference: mls_listings_transform.py:58-62. */
  def prefixColumns(df: DataFrame, prefix: String): DataFrame =
    df.select(df.columns.map(c => col(c).as(prefix + c)).toIndexedSeq: _*)

  /** Bulk-strip a prefix from all column names.
    * Reference: mls_listings_transform.py:124,395 (`toDF` rename). */
  def stripPrefix(df: DataFrame, prefix: String): DataFrame =
    df.toDF(df.columns.map(c => if (c.startsWith(prefix)) c.drop(prefix.length) else c).toIndexedSeq: _*)

  /** Keep only columns whose name satisfies a predicate.
    * Reference: mls_listings_transform.py:122-123. */
  def keepColumns(df: DataFrame, p: String => Boolean): DataFrame =
    df.select(df.columns.filter(p).map(col).toIndexedSeq: _*)

  /** `_x` replaces `x`; `_tmp_*` columns are discarded. One `select`.
    * Reference: mls_listings_transform.py:403-409. */
  def applyUnderscoreReplacements(df: DataFrame): DataFrame = {
    val cols = df.columns
    val replacements = cols.filter(c => c.startsWith("_") && !c.startsWith("_tmp_")).map(c => c.drop(1) -> c).toMap
    val keep = cols.filter(c => !c.startsWith("_")).map { c =>
      replacements.get(c) match {
        case Some(underscored) => col(underscored).as(c)
        case None              => col(c)
      }
    }
    df.select(keep.toIndexedSeq: _*)
  }

  /** Final schema projection — order + pruning enforcement.
    * Reference: mls_listings_transform.py:412. */
  def projectToSchema(df: DataFrame, schema: StructType): DataFrame =
    df.select(schema.fieldNames.map(col).toIndexedSeq: _*)

  /** Names of columns with a given data type — the reference's `dtypes`
    * introspection picking string/date/timestamp columns dynamically
    * (mls_listings_transform.py:141-143). */
  def columnsOfType(df: DataFrame, dt: DataType): Seq[String] =
    df.schema.fields.filter(_.dataType == dt).map(_.name).toIndexedSeq
}
