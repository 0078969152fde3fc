package graft.catalog

import org.apache.spark.sql.DataFrame
import java.nio.file.{Files, Path, StandardCopyOption}

/** Incremental CDC consumer over a versioned container: polls the version
  * pointer and delivers each new window's change feed ([[Catalog.changes]])
  * to a callback, checkpointing the delivered version so a restarted tail
  * resumes exactly where it stopped — the micro-batch consumption loop a
  * Delta/Iceberg CDF streaming source runs per trigger, expressed over the
  * catalog's COW version history (which IS the change log; nothing extra
  * is written at commit time).
  *
  * Delivery contract: the checkpoint advances AFTER the callback returns,
  * so a crash mid-callback redelivers the same window on restart —
  * at-least-once in general, exactly-once when the callback is idempotent
  * per window (the standard `foreachBatch` contract; the (fromV, toV) pair
  * passed to the callback is the idempotency key). Each window's feed is
  * commit-sized (the COW file-name delta), never table-sized.
  *
  * Retention coupling: the tail needs its last-delivered version directory
  * to still exist to compute the next delta. A `vacuum` that outruns the
  * tail's lag makes the delta uncomputable — [[pollOnce]] then throws with
  * the recovery options (re-seed from scratch, or raise `keepLast` to
  * cover the consumer lag), rather than silently skipping changes.
  */
final class ChangeTail(cat: Catalog, container: String, checkpoint: Path) {

  /** Highest checkpoint THIS INSTANCE has observed — the in-memory floor
    * that catches a checkpoint vanishing (or rewinding) under a live
    * tail: the container was dropped, or a registered consumer was
    * unregistered out from under it. Silently reading 0 there would
    * replay the whole history as inserts into a sink that already
    * consumed it (and, for a registered tail, crash only AFTER the
    * side effects when `reset` finds its directory gone). */
  @volatile private var observed: Int = 0

  /** Highest version already delivered (0 = nothing yet). */
  def lastDelivered: Int = {
    val v = if (Files.exists(checkpoint)) Files.readString(checkpoint).trim.toInt else 0
    if (v < observed)
      throw new IllegalStateException(
        s"ChangeTail $container: checkpoint ${checkpoint.getFileName} " +
          s"reads $v but this tail already delivered through $observed — " +
          "the checkpoint vanished or rewound under a live consumer " +
          "(container dropped, or the consumer unregistered). Construct a " +
          "fresh tail to re-seed from scratch.")
    observed = v
    v
  }

  /** One poll: if the container advanced past [[lastDelivered]], hand the
    * callback the net change feed for the whole outstanding window plus
    * its (fromV, toV) bounds, then checkpoint toV. Returns the number of
    * versions consumed (0 = already caught up).
    */
  def pollOnce(f: (DataFrame, Int, Int) => Unit): Int = {
    val from = lastDelivered
    val to = cat.currentVersion(container)
    // a pointer BELOW the checkpoint means the container was dropped and
    // recreated (version history restarted): silently waiting would never
    // deliver the new history — same loud-error stance as the vacuum case
    if (to < from)
      throw new IllegalStateException(
        s"ChangeTail $container: version pointer is $to but this tail already " +
          s"delivered through $from — the container was dropped and recreated. " +
          "Delete the checkpoint to re-seed from the new history.")
    if (to == from) return 0
    if (from > 0 && !cat.versions(container).contains(from))
      throw new IllegalStateException(
        s"ChangeTail $container: version $from was vacuumed before this tail " +
          s"consumed past it (have: ${cat.versions(container).mkString(",")}). " +
          "Re-seed the consumer from a full snapshot (delete the checkpoint " +
          "to replay everything as inserts) or vacuum with keepLast covering " +
          "the consumer lag.")
    f(cat.changes(container, from, Some(to)), from, to)
    reset(to)
    to - from
  }

  /** Reposition the checkpoint (atomic swap, same idiom as the catalog's
    * version pointer) — used after each delivery, and by re-seeding
    * consumers ([[IncrementalView.seed]]). */
  def reset(v: Int): Unit = {
    val tmp = checkpoint.resolveSibling(
      s"${checkpoint.getFileName}.tmp-${ProcessHandle.current.pid}-${System.nanoTime()}")
    Files.writeString(tmp, v.toString)
    Files.move(tmp, checkpoint, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    // an EXPLICIT reposition through the API moves the in-memory floor
    // with it (backward included — re-seeding callers own that choice);
    // only out-of-band checkpoint loss stays a loud error
    observed = v
  }

  /** Poll until `until` returns true, sleeping `pollMs` between empty
    * polls — the resident-consumer loop. Callback failures propagate
    * (the checkpoint has not advanced, so the window redelivers).
    */
  def run(pollMs: Long, until: () => Boolean)(f: (DataFrame, Int, Int) => Unit): Unit =
    while (!until()) {
      if (pollOnce(f) == 0) Thread.sleep(pollMs)
    }
}

object ChangeTail {
  /** A REGISTERED tail: its checkpoint lives in the catalog's consumer
    * registry ([[Catalog.registerTail]]), so vacuum's retention floor
    * protects its resume window exactly like the engine's dependent
    * views — the shape for any consumer whose re-seed would be a full
    * corpus read. An unregistered tail (the bare constructor) keeps the
    * loud-error-after-vacuum contract instead.
    */
  def registered(cat: Catalog, container: String, consumerId: String): ChangeTail =
    new ChangeTail(cat, container, cat.registerTail(container, consumerId))
}
