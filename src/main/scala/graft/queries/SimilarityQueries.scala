package graft.queries

/** Similarity-search extension operators over `embeddings`/`documents`
  * (filled in incrementally; see SURVEY.md §7.2 step 6).
  */
object SimilarityQueries {
  def all: Seq[Q] = Seq.empty
}
