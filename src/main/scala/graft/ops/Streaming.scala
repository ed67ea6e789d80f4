package graft.ops

import graft.QueryDef

object Streaming {
  def defs: Seq[QueryDef] = Seq.empty
}
