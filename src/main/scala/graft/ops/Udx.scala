package graft.ops

import graft.QueryDef

object Udx {
  def defs: Seq[QueryDef] = Seq.empty
}
