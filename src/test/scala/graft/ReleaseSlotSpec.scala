package graft

import graft.operators.ReleaseSlot

/** The per-session keying contract (round-15, verdict finding #3):
  * two sessions sharing one JVM-wide operator slot must never release
  * each other's hooks — only a LATER registration from the SAME
  * session runs the previous hook. The suite drives the slot with
  * plain counters (the slot never inspects the hook, so frames are
  * not needed to pin the keying semantics) against the shared session
  * and an isolated `newSession()` twin — the exact multi-session-JVM
  * shape the contract exists for. */
class ReleaseSlotSpec extends SparkSuite {

  test("slots are keyed per session: cross-session swaps never fire " +
      "each other's hooks; same-session swaps fire in order") {
    val s1 = initSpark()
    val s2 = s1.newSession()
    val slot = ReleaseSlot()
    var released = Vector.empty[String]

    slot.swap(s1, () => released :+= "a1")
    // a DIFFERENT session registering must not release s1's hook
    slot.swap(s2, () => released :+= "b1")
    assert(released.isEmpty,
      "cross-session swap released a live hook")
    // same-session swap releases that session's previous hook only
    slot.swap(s1, () => released :+= "a2")
    assert(released == Vector("a1"))
    slot.swap(s2, () => released :+= "b2")
    assert(released == Vector("a1", "b1"))
  }

  test("releasePrevious is session-scoped and set replaces without " +
      "firing") {
    val s1 = initSpark()
    val s2 = s1.newSession()
    val slot = ReleaseSlot()
    var released = Vector.empty[String]

    slot.set(s1, () => released :+= "a1")
    slot.set(s2, () => released :+= "b1")
    // set() replaces silently — the releasePrevious/set split exists
    // for the release-BEFORE-persist ordering, so set must never fire
    slot.set(s1, () => released :+= "a2")
    assert(released.isEmpty, "set() fired a hook")
    slot.releasePrevious(s2)
    assert(released == Vector("b1"),
      "releasePrevious crossed sessions or missed its own")
    // s2's entry is consumed: a second releasePrevious is a no-op
    slot.releasePrevious(s2)
    assert(released == Vector("b1"))
    slot.releasePrevious(s1)
    assert(released == Vector("b1", "a2"))
  }
}
