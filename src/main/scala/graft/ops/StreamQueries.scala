package graft.ops

import graft.Q

/** SURVEY §2.2 Q45–Q53: Structured Streaming surface, drained with
  * Trigger.AvailableNow so results are oracle-comparable to batch SQL.
  */
object StreamQueries {
  def defs: Seq[Q] = Seq()
}
