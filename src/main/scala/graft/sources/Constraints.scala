package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CHECK-constraint surface for the versioned table layer (Delta
  * `ALTER TABLE ADD CONSTRAINT` / CheckConstraint semantics — the
  * reference ecosystem's write-time data contracts). A check is a SQL
  * boolean expression over the row; SQL CHECK semantics apply: a row
  * VIOLATES only when the expression evaluates to exactly FALSE — a null
  * (unknown) result passes, same as ANSI CHECK and Delta.
  *
  * Two enforcement modes, both single-pass and whole-stage-codegen:
  *
  *  - [[enforce]] (fail-the-write): the check rides the write projection
  *    as an `assert_true` folded into a row filter, so the first violating
  *    row aborts the job with the constraint name and the row's JSON —
  *    no separate validation scan of the data (at 100 TB a count-first
  *    pre-pass would double the write's read cost).
  *  - [[split]] (quarantine): route rows violating ANY check to a
  *    quarantine frame and the rest onward — the reference's
  *    validate-split pattern (SURVEY §2.2 P8) applied at the table
  *    boundary. Two filters over one source scan; Spark dedups the scan
  *    under AQE/cache and each side stays a pushdown-friendly filter.
  */
object Constraints {

  final case class Check(name: String, sqlExpr: String) {
    require(name.nonEmpty && !name.exists(c => c == '\t' || c == '\n'),
      s"constraint name '$name' must be non-empty without tab/newline")
    require(sqlExpr.nonEmpty && !sqlExpr.exists(c => c == '\t' || c == '\n'),
      s"constraint expression must be non-empty without tab/newline")
  }

  /** True exactly when the row violates the check: the expression
    * evaluates to FALSE. Null (unknown) passes — coalesced so the result
    * itself is never null and can sit under a negation safely. */
  def violated(c: Check): Column =
    coalesce(expr(c.sqlExpr) === lit(false), lit(false))

  /** Fail-the-write enforcement: returns `df` with every check folded
    * into its plan; materializing any violating row raises with the
    * constraint name, its expression, and the row as JSON. Pass-through
    * rows cost one codegen'd boolean per check. */
  def enforce(df: DataFrame, checks: Seq[Check]): DataFrame =
    checks.foldLeft(df) { (d, c) =>
      // assert_true returns null on pass; folded into the row filter so
      // the optimizer cannot prune the check away (same idiom as the
      // MERGE duplicate-source guard, operators/Merge.scala).
      d.filter(coalesce(
        assert_true(!violated(c), concat(
          lit(s"CHECK constraint '${c.name}' (${c.sqlExpr}) violated by: "),
          to_json(struct(df.columns.toIndexedSeq.map(col): _*))))
          .cast("boolean"),
        lit(true)))
    }

  /** Quarantine split: (rows passing every check, rows violating any).
    * The two frames partition `df` exactly — null-evaluating checks pass,
    * so a row lands in quarantine only for a definite FALSE. */
  def split(df: DataFrame, checks: Seq[Check]): (DataFrame, DataFrame) = {
    val bad = checks.map(violated).foldLeft(lit(false))(_ || _)
    (df.filter(!bad), df.filter(bad))
  }

  // ---- persistence (shared by ManagedTable and BucketedTable) ----
  // One `name\texpr` line per check in `<root>/_constraints`, swapped
  // atomically like the version pointer so readers never see a torn set.

  import java.nio.file.{Files, Paths, StandardCopyOption}

  def load(root: String): Seq[Check] = {
    val f = Paths.get(root, "_constraints")
    if (!Files.exists(f)) Seq.empty
    else Files.readString(f).linesIterator.filter(_.nonEmpty).map { line =>
      val Array(name, sqlExpr) = line.split("\t", 2)
      Check(name, sqlExpr)
    }.toSeq
  }

  def store(root: String, checks: Seq[Check]): Unit = {
    Files.createDirectories(Paths.get(root))
    val tmp = Paths.get(root, "_constraints.tmp")
    Files.writeString(tmp,
      checks.map(c => s"${c.name}\t${c.sqlExpr}").mkString("\n"))
    Files.move(tmp, Paths.get(root, "_constraints"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Shared ADD CONSTRAINT body: validate `live` (the current table
    * state), reject duplicates, persist. */
  private[sources] def add(root: String, live: DataFrame, name: String,
                           sqlExpr: String): Unit = {
    val c = Check(name, sqlExpr)
    val existing = load(root)
    require(!existing.exists(_.name == name),
      s"constraint '$name' already exists on $root")
    val nBad = live.filter(violated(c)).count()
    require(nBad == 0,
      s"cannot add CHECK constraint '$name' ($sqlExpr): " +
        s"$nBad existing row(s) violate it")
    store(root, existing :+ c)
  }

  private[sources] def drop(root: String, name: String): Unit = {
    val existing = load(root)
    require(existing.exists(_.name == name), s"no constraint '$name' on $root")
    store(root, existing.filterNot(_.name == name))
  }
}
