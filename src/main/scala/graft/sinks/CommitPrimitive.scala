package graft.sinks

import java.nio.file.{FileAlreadyExistsException, Files, Path}

/** The ONE atomicity primitive TableLog needs from its storage: publish
  * `content` at `path` iff nothing exists there, atomically — a reader
  * must never observe partial content, and exactly one of N racing
  * writers wins. Everything else in the log (CAS retry, delta replay,
  * vacuum) is built on this single operation, so porting the format to
  * another store is ONE implementation:
  *
  *   - local FS (here): write temp + hard-link — link(2) fails EEXIST
  *     atomically and publishes complete content or nothing
  *   - object store: conditional PUT (`If-None-Match: *` on S3/GCS/Azure)
  *   - HDFS: create-exclusive temp + atomic rename
  */
trait CommitPrimitive {
  /** True = committed; false = CAS conflict (something already at
    * `path` — or this writer's temp vanished under it, which degrades
    * to a retry, never a torn manifest). */
  def putIfAbsent(path: Path, content: Array[Byte]): Boolean
}

object CommitPrimitive {

  /** Local-FS primitive: the manifest is fully written to a `.tmp-*`
    * sibling, then HARD-LINKED to its final name. The winner's content
    * appears complete or not at all; the loser gets a clean false. A
    * vanished temp (an aggressive concurrent vacuum) also returns
    * false — the caller's CAS loop rewrites and retries. */
  object HardLink extends CommitPrimitive {
    def putIfAbsent(path: Path, content: Array[Byte]): Boolean = {
      val tmp = path.resolveSibling(s".tmp-${java.util.UUID.randomUUID()}")
      Files.write(tmp, content)
      try { Files.createLink(path, tmp); true }
      catch {
        case _: FileAlreadyExistsException => false
        case _: java.nio.file.NoSuchFileException => false
      }
      finally Files.deleteIfExists(tmp)
    }
  }

  /** Single-process CONDITIONAL-PUT mock (object-store `If-None-Match`
    * semantics): existence check + publish under one mutex, published
    * via atomic move so readers still never see partial content. Used
    * by TableLogSpec to prove the log's correctness rests on the
    * primitive's contract alone, not on link(2) — the shape an S3/GCS
    * adapter implements with a real conditional PUT. */
  object ConditionalPut extends CommitPrimitive {
    private val mutex = new Object
    def putIfAbsent(path: Path, content: Array[Byte]): Boolean =
      mutex.synchronized {
        if (Files.exists(path)) false
        else {
          val tmp = path.resolveSibling(s".tmp-${java.util.UUID.randomUUID()}")
          Files.write(tmp, content)
          try {
            Files.move(tmp, path, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
            true
          } finally Files.deleteIfExists(tmp)
        }
      }
  }
}
