package graft.ops

import graft.QueryDef

object Scalars {
  def defs: Seq[QueryDef] = Seq.empty
}
