package graft.queries

object TextQueries {
  def defs: Seq[QueryDef] = Seq()
}
