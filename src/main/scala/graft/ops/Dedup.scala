package graft.ops

import graft.Q

/** Deduplication operators over `documents`/`embeddings`: exact,
  * MinHash+LSH, SimHash, n-gram Jaccard, embedding cosine near-dup.
  */
object Dedup {
  def all: Seq[Q] = Seq()
}
