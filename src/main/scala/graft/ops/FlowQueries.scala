package graft.ops

import graft.Q

/** Flows-domain queries over a deterministic synthesized flow table
  * (SURVEY §1.3 schema) + the UDF/UDAF/UDTF surface Q54–Q56.
  */
object FlowQueries {
  def defs: Seq[Q] = Seq()
}
