package graft

/** Central inventory of every engine capability (SURVEY §2). Each subsystem
  * contributes a Seq[QueryDef]; SparkEntry projects this into the driver's
  * contract maps.
  */
object Registry {
  def all: Seq[QueryDef] =
    operators.Relational.defs ++
      operators.Etl.defs ++
      operators.Analytics.defs ++
      operators.GraphOps.defs ++
      operators.Sentiment.defs ++
      operators.TextAnalysis.defs ++
      operators.Dedup.defs ++
      operators.Similarity.defs ++
      operators.Multimodal.defs ++
      operators.StreamingQueries.defs ++
      operators.Ops.defs

  def byName: Map[String, QueryDef] = all.map(d => d.name -> d).toMap
}
