package graft.queries

/** Embedding similarity / ANN queries over `embeddings` (filled in next). */
object SimilarityQueries {
  val all: Seq[Q] = Seq()
}
