package org.apache.spark.graft

import org.apache.spark.SparkContext
import org.apache.spark.storage.BroadcastBlockId

/** Synchronous block-manager hygiene + storage introspection for the bench
  * harness. Lives under `org.apache.spark` because the block-manager
  * surface it needs (`SparkContext.env`, `BlockManagerMaster
  * .getStorageStatus`, `removeBroadcast`) is `private[spark]` — the
  * standard shim-package pattern for build-time access to Spark
  * internals; no Spark source is copied or modified.
  *
  * Why it exists (round-9 verdict items 1 and 3): between bench queries,
  * dead broadcast blocks are only reclaimed when driver GC enqueues their
  * weak references and the ASYNC ContextCleaner drains them — so the
  * eviction work of query N's broadcasts lands inside query N+1's timed
  * trials, and accumulated residue made identical code measure 1.1-2.5×
  * slower in full-run context than standalone. These helpers let the
  * bench (a) scrub broadcast blocks synchronously in the untimed gap and
  * (b) snapshot residual storage per trial so any remaining drift is
  * attributable instead of asserted.
  */
object BlockHygiene {

  /** Residual storage across all block managers (local mode: the one
    * driver store): (blocks, memUsedBytes, diskUsedBytes, broadcastIds).
    */
  def snapshot(sc: SparkContext): (Int, Long, Long, Int) = {
    val st = sc.env.blockManager.master.getStorageStatus
    val nBc = sc.env.blockManager.getMatchingBlockIds(_.isBroadcast)
      .collect { case BroadcastBlockId(id, _) => id }.distinct.size
    (st.map(_.blocks.size).sum, st.map(_.memUsed).sum, st.map(_.diskUsed).sum, nBc)
  }

  /** Synchronously remove every broadcast's blocks. Safe ONLY between
    * independent query executions: a fresh plan re-broadcasts what it
    * needs, but a live plan mid-execution would lose its pieces. Returns
    * the number of broadcast ids scrubbed.
    */
  def dropBroadcasts(sc: SparkContext): Int = {
    val ids = sc.env.blockManager.getMatchingBlockIds(_.isBroadcast)
      .collect { case BroadcastBlockId(id, _) => id }.distinct
    ids.foreach { id =>
      try sc.env.blockManager.master.removeBroadcast(id, removeFromMaster = true, blocking = true)
      catch { case _: Throwable => () } // already gone / racing cleaner
    }
    ids.size
  }
}
