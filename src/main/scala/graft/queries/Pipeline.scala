package graft.queries

import graft.QueryDef

/** Training-data pipeline operators (dedup, similarity, text analysis,
  * multimodal). Filled in incrementally; see graft.operators.* */
object Pipeline {
  def defs: Seq[QueryDef] = Seq.empty
}
