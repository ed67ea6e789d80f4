package graft.ops

import graft.QueryDef

object Text {
  def defs: Seq[QueryDef] = Seq.empty
}
