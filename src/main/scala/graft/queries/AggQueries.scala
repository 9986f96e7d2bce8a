package graft.queries

object AggQueries {
  def defs: Seq[QueryDef] = Seq()
}
