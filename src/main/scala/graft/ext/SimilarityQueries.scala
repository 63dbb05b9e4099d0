package graft.ext

import graft.Q

/** SURVEY §2.3 X3: similarity search over `embeddings`. */
object SimilarityQueries {
  def defs: Seq[Q] = Seq()
}
