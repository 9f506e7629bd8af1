package graft.sources

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

/** Local-filesystem helpers shared by the table layer and the
  * side-effectful gate queries — one home for the recursive-delete idiom
  * (with the walk stream closed) instead of per-caller copies. */
object ScratchDirs {

  /** Delete `p` and everything under it if it exists. */
  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val st = Files.walk(p)
      try st.sorted(Comparator.reverseOrder[Path]()).forEach(Files.delete(_))
      finally st.close()
    }

  /** Empty scratch dir under the build tree (safe to delete/rewrite on
    * every call — bench runs each gate several times). */
  def fresh(name: String): String = {
    val p = Paths.get("target", "gate_tmp", name).toAbsolutePath
    deleteRecursively(p)
    p.toString
  }
}
