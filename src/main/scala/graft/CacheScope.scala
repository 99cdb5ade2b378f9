package graft

import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

/** Lifecycle tracking for operator-internal `persist()` calls.
  *
  * Several operators persist intermediate frames because their plans
  * consume the same subtree from multiple branches (dedup inverted index,
  * connected-components labels, IVF centroids). The persist is a plan
  * property, but the UNPERSIST cannot live inside the operator: the
  * operator returns a lazy DataFrame and never sees the action that
  * finally consumes it. Left alone, those entries leak into the session
  * cache across queries.
  *
  * `CacheScope` is the cleanup hook: operators route their persists
  * through [[persist]]; a caller that wants bounded cache lifetime wraps
  * consumption in [[withScope]], which unpersists every frame the
  * enclosed operators registered once the block exits. Outside any scope,
  * [[persist]] degrades to a plain `persist` and the caller owns cleanup
  * (`spark.catalog.clearCache()` being the blunt instrument — what the
  * bench driver uses between queries).
  *
  * Consume the result INSIDE the scope: frames are unpersisted at exit,
  * so a DataFrame escaping the scope recomputes from lineage when used
  * (correct, just no longer cached).
  */
object CacheScope {

  private val scopes =
    new ThreadLocal[List[scala.collection.mutable.ArrayBuffer[Dataset[_]]]] {
      override def initialValue(): List[scala.collection.mutable.ArrayBuffer[Dataset[_]]] = Nil
    }

  /** Persist `ds`, registering it with the innermost active scope (if
    * any) for unpersist at scope exit. Returns `ds` for chaining. */
  def persist[T](ds: Dataset[T],
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): Dataset[T] = {
    ds.persist(level)
    scopes.get() match {
      case head :: _ => head += ds
      case Nil       =>
    }
    ds
  }

  /** Run `body`; at exit (normal or exceptional) unpersist every frame
    * the enclosed operators registered via [[persist]]. Nestable — an
    * inner scope releases only its own frames. Unpersist of an
    * already-unpersisted frame is a no-op, so operators that release
    * intermediates early (connectedComponents) compose safely. */
  def withScope[A](body: => A): A = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[Dataset[_]]
    scopes.set(buf :: scopes.get())
    try body
    finally {
      scopes.set(scopes.get().tail)
      buf.foreach(_.unpersist(false))
    }
  }
}
