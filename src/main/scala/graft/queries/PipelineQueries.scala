package graft.queries

/** Flagship end-to-end pipeline fixtures (filled in next). */
object PipelineQueries {
  val all: Seq[Q] = Seq()
}
