package graft.core

/** Nested list counter chain — ListNumber.java:3-56.
  *
  * A linked list of per-level counters keyed by list id in the segmenter.
  * `incrementNumber` resets all deeper levels (ListNumber.java:31-37);
  * `overrideNumber(n)` resets deeper levels unless told not to
  * (ListNumber.java:39-48). State lives entirely within one turn's fold —
  * no cross-row state (SURVEY.md §2.3 A3).
  */
final class ListNumber(val level: Int, val format: String) {
  var subNumber: ListNumber = _
  var number: Int = 0

  def incrementNumber(): Int = {
    resetSubLevels(subNumber)
    number += 1
    number
  }

  def overrideNumber(newNumber: Int, resetSubs: Boolean = true): Unit = {
    number = newNumber
    if (resetSubs) resetSubLevels(subNumber)
  }

  private def resetSubLevels(root: ListNumber): Unit = {
    var r = root
    while (r != null) {
      r.number = 0
      r = r.subNumber
    }
  }
}
