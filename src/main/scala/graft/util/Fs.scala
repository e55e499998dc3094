package graft.util

import java.nio.file.{Files, Path, Paths}

/** Local-filesystem helpers for scratch/work directories. */
object Fs {

  /** Delete a directory tree if it exists (no-op otherwise). The walk
    * stream is closed deterministically — it holds directory handles. */
  def deleteRec(dir: String): Unit = {
    val p: Path = Paths.get(dir)
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try {
        val it = walk.sorted(java.util.Comparator.reverseOrder[Path]()).iterator()
        while (it.hasNext) Files.delete(it.next())
      } finally walk.close()
    }
  }
}
