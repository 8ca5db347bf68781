package graft.queries

/** All query packs, in SURVEY.md §2 order. SparkEntry delegates here. */
object Registry {
  def packs: Seq[QueryPack] = Seq(
    CoreQueries, JoinGroupQueries, WindowQueries, ReshapeQueries,
    PipelineQueries, ScaleQueries, CurationQueries, FlagshipQueries)

  lazy val all: Seq[Query] = {
    val qs = packs.flatMap(_.queries)
    val dup = qs.groupBy(_.name).collect { case (n, g) if g.size > 1 => n }
    require(dup.isEmpty, s"duplicate query names: ${dup.mkString(",")}")
    qs
  }
}
