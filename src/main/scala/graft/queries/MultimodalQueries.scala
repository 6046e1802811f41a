package graft.queries

/** Multimodal (binary column) extension operators
  * (filled in incrementally; see SURVEY.md §7.2 step 6).
  */
object MultimodalQueries {
  def all: Seq[Q] = Seq.empty
}
