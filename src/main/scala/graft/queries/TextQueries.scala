package graft.queries

/** Text-analysis + dedup queries over `documents` (filled in next). */
object TextQueries {
  val all: Seq[Q] = Seq()
}
