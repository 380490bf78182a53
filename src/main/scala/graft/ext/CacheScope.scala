package graft.ext

import org.apache.spark.sql.Dataset

/** Tracks frames persisted inside a multi-stage operator so the caller (or
  * the composing pipeline) can release them once the consuming action has
  * completed. Long-lived sessions that run curation repeatedly would
  * otherwise accumulate MEMORY_AND_DISK blocks indefinitely — persisted
  * intermediates are invisible to the caller and Spark never evicts them on
  * its own.
  *
  * Usage: pass a scope into [[Dedup.nearDuplicates]] (etc.), run the action
  * that consumes the result, then `scope.close()`. Closing is safe once the
  * consumer no longer needs the lineage (e.g. after
  * [[Dedup.duplicateClusters]] converged — its output is checkpointed and
  * independent of the inputs).
  */
final class CacheScope {
  private val frames = scala.collection.mutable.ArrayBuffer.empty[Dataset[_]]

  /** Register an already-persisted frame for later release. */
  def own[T <: Dataset[_]](df: T): T = synchronized { frames += df; df }

  /** Unpersist every owned frame (idempotent). */
  def close(blocking: Boolean = false): Unit = synchronized {
    frames.foreach(_.unpersist(blocking))
    frames.clear()
  }
}
