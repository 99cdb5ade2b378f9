package graft.streaming

/** Last-applied-batch marker for foreachBatch replay guards, written
  * ATOMICALLY (tmp + rename) so a crash mid-write can't leave a
  * truncated marker that wedges every subsequent restart.
  *
  * Two read policies, matched to the sink's write discipline:
  *  - `lenient` (idempotent per-batch writes — overwrite-by-batchId
  *    dirs, tagged segments): an unreadable marker degrades to "replay
  *    the in-flight batch", which the idempotent write absorbs.
  *  - strict (non-idempotent folds, e.g. aggregate MV MERGE): an
  *    unreadable marker is an ERROR — replaying a possibly-applied
  *    batch would double-fold, so the operator must stop and say so
  *    rather than corrupt the target.
  */
object BatchMarker {

  def lastApplied(path: String, lenient: Boolean): Long = {
    val f = new java.io.File(path)
    if (!f.exists()) -1L
    else {
      val raw = scala.io.Source.fromFile(f).mkString.trim
      raw.toLongOption match {
        case Some(v) => v
        case None if lenient => -1L
        case None => throw new java.io.IOException(
          s"corrupt batch marker $path ('$raw') guarding a non-idempotent " +
            "sink — refusing to guess; inspect the target and restore the marker")
      }
    }
  }

  def commit(path: String, batchId: Long): Unit = {
    val tmp = new java.io.File(path + ".tmp")
    val w = new java.io.PrintWriter(tmp)
    try w.print(batchId) finally w.close()
    val fin = new java.io.File(path)
    fin.delete()
    if (!tmp.renameTo(fin))
      throw new java.io.IOException(s"could not publish batch marker $path")
  }
}
