package graft.tools
object CountCheck {
  def main(args: Array[String]): Unit = {
    import graft.queries._
    val suites = Seq(
      "analytics" -> AnalyticsQueries.queries.keySet,
      "extended" -> ExtendedQueries.queries.keySet,
      "more" -> MoreQueries.queries.keySet,
      "pipeline" -> PipelineQueries.queries.keySet,
      "http" -> HttpQueries.queries.keySet)
    val sum = suites.map(_._2.size).sum
    val union = suites.flatMap(_._2).toSet
    println(s"sum=$sum union=${union.size} entry=${graft.SparkEntry.queries.size} oracles=${graft.SparkEntry.oracleSql.size}")
    val noOracle = graft.SparkEntry.queries.keySet -- graft.SparkEntry.oracleSql.keySet
    println(s"queries without oracle: $noOracle")
    val orphan = graft.SparkEntry.oracleSql.keySet -- graft.SparkEntry.queries.keySet
    println(s"oracles without query: $orphan")
  }
}
