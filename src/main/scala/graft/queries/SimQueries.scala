package graft.queries

object SimQueries {
  def defs: Seq[QueryDef] = Seq()
}
