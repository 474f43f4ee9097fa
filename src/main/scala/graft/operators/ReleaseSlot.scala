package graft.operators

/** The fire-and-forget cache-release slot shared by every operator
  * whose returned frame still reads an internally-persisted dataset
  * lazily: the cache cannot be freed inside the call (the caller has
  * not evaluated yet), so each invocation releases the PREVIOUS
  * call's cache instead — a long-lived session pins at most one copy
  * per operator, not one per invocation (ADVICE r4/r5 lineage; the
  * LanguageModel precedent).
  *
  * SAFETY CONTRACT: the release hook must only undo RECOMPUTABLE
  * backing — `persist()`/broadcast caches, where a late evaluation of
  * the superseded frame recomputes and is slower but never wrong.
  * NEVER register a `localCheckpoint` release here: checkpointing
  * discards lineage, so releasing it crashes a still-live consumer
  * with CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND instead of recomputing
  * (the one-copy-per-round checkpoint loops in Dedup release their
  * OWN superseded rounds synchronously instead, where no external
  * reader can exist).
  */
final class ReleaseSlot private () {
  private val last =
    new java.util.concurrent.atomic.AtomicReference[() => Unit]()

  /** Register this invocation's release hook and run the previous
    * one (if any). */
  def swap(release: () => Unit): Unit = {
    val prev = last.getAndSet(release)
    if (prev != null) prev()
  }
}

object ReleaseSlot {
  def apply(): ReleaseSlot = new ReleaseSlot
}
