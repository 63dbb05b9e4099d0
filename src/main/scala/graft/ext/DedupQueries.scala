package graft.ext

import graft.Q

/** SURVEY §2.3 X1/X2: exact + near deduplication over `documents`. */
object DedupQueries {
  def defs: Seq[Q] = Seq()
}
