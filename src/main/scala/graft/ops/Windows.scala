package graft.ops

import graft.QueryDef

object Windows {
  def defs: Seq[QueryDef] = Seq.empty
}
