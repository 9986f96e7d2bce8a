package graft.queries

object WindowQueries {
  def defs: Seq[QueryDef] = Seq()
}
