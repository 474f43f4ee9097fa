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
  *
  * CONCURRENCY CONTRACT: slots are JVM-wide singletons, one per
  * operator — the design assumes AT MOST ONE in-flight invocation of
  * a given operator per JVM (the batch-pipeline execution model,
  * where a driver runs queries sequentially). Two concurrent
  * invocations of the same operator (multi-session JVM, parallel job
  * submission) release each other's live caches mid-query: never a
  * wrong result (persist-backed frames recompute from deterministic
  * lineage), but each query degrades to recompute-only, and for a
  * NONDETERMINISTIC input frame the recompute widens the window in
  * which an adaptive operator's routing decision (census) and its
  * executed plan read different snapshots — such callers must
  * persist their input themselves (the documented input contract of
  * every adaptive operator) or serialize invocations per operator.
  */
final class ReleaseSlot private () {
  private val last =
    new java.util.concurrent.atomic.AtomicReference[() => Unit]()

  /** Register this invocation's release hook and run the previous
    * one (if any).
    *
    * ORDERING CONTRACT (round 10): call this BEFORE the new
    * invocation's `persist()`. Spark's cache manager dedupes
    * persist() on the analyzed plan, so on identical lineage a
    * persist-then-swap order registers nothing new and the previous
    * hook then drops the very entry this call is relying on —
    * alternating cache hits with full recomputes across repeated
    * invocations (the q75/q84 bench-spread pathology). */
  def swap(release: () => Unit): Unit = {
    val prev = last.getAndSet(release)
    if (prev != null) prev()
  }

  /** Run the previous hook (if any) without registering a new one —
    * the release-first half when the new hook's frame is not built
    * yet; pair with [[set]]. */
  def releasePrevious(): Unit = {
    val prev = last.getAndSet(null)
    if (prev != null) prev()
  }

  /** Register this invocation's hook (after [[releasePrevious]]). */
  def set(release: () => Unit): Unit = last.set(release)
}

object ReleaseSlot {
  def apply(): ReleaseSlot = new ReleaseSlot
}
