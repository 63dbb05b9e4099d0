package graft.ext

import graft.Q

/** SURVEY §2.3 X4: text analysis over `documents`. */
object TextQueries {
  def defs: Seq[Q] = Seq()
}
