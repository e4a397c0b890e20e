package graft.ops

import graft.Q

/** Text-analysis operators over `documents` (builder-prompt north
  * star): language-ID, quality scoring, token counting, fingerprints.
  */
object TextAnalysis {
  def all: Seq[Q] = Seq()
}
