package graft.queries

/** Text-analysis + dedup extension operators over the `documents` table
  * (filled in incrementally; see SURVEY.md §7.2 step 6).
  */
object TextQueries {
  def all: Seq[Q] = Seq.empty
}
