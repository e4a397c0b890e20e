package graft.streaming

import graft.Q

/** Event-time windowing over `events`: tumbling/sliding/session, batch
  * (oracle-checked) and Structured Streaming variants (spec-checked).
  */
object EventWindows {
  def all: Seq[Q] = Seq()
}
