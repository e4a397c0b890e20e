package graft.ops

import graft.Q

/** Similarity search over `embeddings`: brute-force cosine top-k and
  * bucketed (IVF/LSH) approximate variants.
  */
object Similarity {
  def all: Seq[Q] = Seq()
}
