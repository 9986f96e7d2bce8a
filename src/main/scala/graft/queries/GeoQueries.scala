package graft.queries

object GeoQueries {
  def defs: Seq[QueryDef] = Seq()
}
