package graft.ops

import graft.Q

/** SURVEY §2.2 Q38–Q44: scalar function classes. Filled incrementally. */
object ScalarFnQueries {
  def defs: Seq[Q] = Seq()
}
