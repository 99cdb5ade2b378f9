package graft.operators

import java.io.File
import java.nio.file.Files

/** The ONE primitive the lakehouse commit protocol needs from its
  * storage/catalog layer: an ATOMIC create-if-absent of a small
  * manifest file. Every [[Versioned]] table commit and every
  * [[MultiTable]] coordinator pin funnels through `putIfAbsent` —
  * swap the implementation and the whole engine's concurrency story
  * moves to a new backend without touching a verb.
  *
  * Contract: exactly one of N racing callers for the same `target`
  * returns true; every other returns false (the caller then re-reads
  * the log and retries — the OCC loop). On a true return the content
  * is durably visible to readers; a false return must leave whatever
  * the winner published untouched.
  *
  * Backends:
  *  - [[PosixLinkCoordinator]] (default): create-exclusive hard link —
  *    correct on any POSIX filesystem (local disk, NFSv4, Lustre).
  *  - [[ConditionalPutCoordinator]]: conditional-put semantics (PUT
  *    If-None-Match) as S3-class object stores and catalog services
  *    expose them — the store serializes the existence check and the
  *    write in one service-side critical section; nothing relies on
  *    client-side rename or link atomicity. The in-memory lock here
  *    STANDS IN for the service; a production S3 backend implements
  *    the same three lines against the store API.
  */
trait CommitCoordinator {
  /** Atomically materialize `content` at `target` iff nothing has been
    * published there yet. True = this caller won the slot. */
  def putIfAbsent(target: File, content: String): Boolean
}

/** POSIX create-exclusive hard-link CAS (the default): write a hidden
  * temp sibling, link it into place — link creation is atomic and
  * fails (never replaces) when the target exists, which is exactly
  * the put-if-absent contract; a plain rename would silently replace
  * on POSIX and lose a commit. */
object PosixLinkCoordinator extends CommitCoordinator {
  override def putIfAbsent(target: File, content: String): Boolean = {
    target.getParentFile.mkdirs()
    val tmp = File.createTempFile(
      "." + target.getName + "-", ".tmp", target.getParentFile)
    Files.writeString(tmp.toPath, content)
    try {
      Files.createLink(target.toPath, tmp.toPath)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
    } finally Files.deleteIfExists(tmp.toPath)
  }
}

/** Conditional-put coordinator simulating an S3-class object store:
  * the existence check and the write serialize in ONE critical
  * section (the store's If-None-Match evaluation) — no hard links, no
  * atomic-rename assumption. Files still land on local disk so every
  * reader path works unchanged.
  *
  * `raceHook` runs INSIDE the critical window, before the existence
  * check, with the target path: a spec injects a competing publish
  * there (reentrant on the same thread) and proves the loser observes
  * the winner — deterministic coverage of the race the real store
  * resolves with LWT/conditional writes. */
final class ConditionalPutCoordinator(
    raceHook: File => Unit = _ => ()) extends CommitCoordinator {
  private val lock = new Object
  override def putIfAbsent(target: File, content: String): Boolean =
    lock.synchronized {
      raceHook(target)
      if (target.exists()) false
      else {
        target.getParentFile.mkdirs()
        val tmp = File.createTempFile(
          "." + target.getName + "-", ".tmp", target.getParentFile)
        Files.writeString(tmp.toPath, content)
        // the move happens inside the store's critical section — this
        // models SERVICE-side atomicity, not client rename semantics
        Files.move(tmp.toPath, target.toPath)
        true
      }
    }
}
