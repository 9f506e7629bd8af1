package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Generated-column surface for the versioned table layer (Delta
  * generated columns): a column DEFINED as a SQL expression over the
  * row's other columns. On every write:
  *
  *  - a frame that OMITS the column gets it computed — writers supply
  *    only physical columns and the table guarantees the derivation
  *    (the classic use is a partition-grain date derived from an event
  *    timestamp);
  *  - a frame that SUPPLIES the column is validated — each provided
  *    value must null-safely equal the expression's result, enforced
  *    with the same fold-into-the-write-plan idiom as
  *    [[Constraints.enforce]] (the first mismatching row aborts the
  *    publish before the pointer swaps; no separate validation scan).
  *
  * Persistence mirrors [[Constraints]]: one `name\texpr` line in
  * `<root>/_generated`, atomically swapped.
  */
object GeneratedColumns {

  final case class Gen(name: String, sqlExpr: String) {
    require(name.nonEmpty && !name.exists(c => c == '\t' || c == '\n'),
      s"generated column name '$name' must be non-empty without tab/newline")
    require(sqlExpr.nonEmpty && !sqlExpr.exists(c => c == '\t' || c == '\n'),
      s"generation expression must be non-empty without tab/newline")
  }

  /** Compute-or-validate every generated column into `df`'s plan. */
  def apply(df: DataFrame, gens: Seq[Gen]): DataFrame =
    gens.foldLeft(df) { (d, g) =>
      if (!d.columns.contains(g.name)) d.withColumn(g.name, expr(g.sqlExpr))
      else d.filter(coalesce(
        assert_true(col(g.name) <=> expr(g.sqlExpr), concat(
          lit(s"generated column '${g.name}' (${g.sqlExpr}) mismatch in: "),
          to_json(struct(d.columns.toIndexedSeq.map(col): _*))))
          .cast("boolean"),
        lit(true)))
    }

  import java.nio.file.{Files, Paths, StandardCopyOption}

  def load(root: String): Seq[Gen] = {
    val f = Paths.get(root, "_generated")
    if (!Files.exists(f)) Seq.empty
    else Files.readString(f).linesIterator.filter(_.nonEmpty).map { line =>
      val Array(name, sqlExpr) = line.split("\t", 2)
      Gen(name, sqlExpr)
    }.toSeq
  }

  def store(root: String, gens: Seq[Gen]): Unit = {
    Files.createDirectories(Paths.get(root))
    val tmp = Paths.get(root, "_generated.tmp")
    Files.writeString(tmp,
      gens.map(g => s"${g.name}\t${g.sqlExpr}").mkString("\n"))
    Files.move(tmp, Paths.get(root, "_generated"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }
}
