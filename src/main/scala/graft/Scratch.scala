package graft

import java.nio.file.{Files, Path}
import java.util.Comparator

/** Scratch directories for queries that materialize fixture files
  * (CSV/XML/binary roundtrips). All live under one per-JVM root that a
  * shutdown hook deletes recursively — without this, every
  * Verify/Bench run leaked ~25 MB of temp files per roundtrip query
  * (measured: 862 orphaned dirs after one working day). */
object Scratch {

  private lazy val root: Path = {
    val r = Files.createTempDirectory("graft_scratch_")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(r)))
    r
  }

  /** A fresh directory under the self-cleaning root. */
  def dir(prefix: String): String =
    Files.createTempDirectory(root, prefix).toString

  private def deleteRecursively(p: Path): Unit =
    try {
      Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => { val _ = Files.deleteIfExists(f) })
    } catch { case _: Exception => () } // best-effort: never fail shutdown
}
