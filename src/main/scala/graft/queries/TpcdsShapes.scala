package graft.queries

import graft.Q

/** TPC-DS operator shapes ported onto the fixture star schema
  * (SURVEY.md §7 step 4, FIXTURES.md §3). Filled in incrementally.
  */
object TpcdsShapes {
  def all: Seq[Q] = Seq()
}
