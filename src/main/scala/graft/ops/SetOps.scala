package graft.ops

import graft.QueryDef

object SetOps {
  def defs: Seq[QueryDef] = Seq.empty
}
