package graft.ext

import graft.Q

/** SURVEY §2.3 X5: multimodal (binary) columns carried through the
  * relational surface.
  */
object MultimodalQueries {
  def defs: Seq[Q] = Seq()
}
