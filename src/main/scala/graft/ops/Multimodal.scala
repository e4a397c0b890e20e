package graft.ops

import graft.Q

/** Multimodal-column plumbing: opaque binary payloads + typed
  * metadata; decode/feature steps stubbed deterministically.
  */
object Multimodal {
  def all: Seq[Q] = Seq()
}
