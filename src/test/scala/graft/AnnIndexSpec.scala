package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.Similarity
import graft.sources.SnapStore

/** The persisted IVF index (VERDICT r14 #9): centroids as exact
  * decimal sums+counts and posting-list assignments live as SnapStore
  * tables; queries serve from the stored aggregate, and an append to
  * the vector table re-indexes incrementally — O(new data), result
  * bit-identical to a full rebuild.
  */
class AnnIndexSpec extends SparkSpec {

  private def vecsOf(n: Int, idOffset: Long = 0L) =
    Tables.embeddings(spark, sf)
      .filter(col("vec_id") < n)
      .select((col("vec_id") + idOffset).as("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))

  test("the persisted-index query path returns exactly the recompute " +
    "path's answer (same values, same tie order)") {
    val fromIndex = Similarity.ivfTopKPersisted(spark, sf).collect().toSeq
    val recompute = Similarity.ivfTopK(spark, sf).collect().toSeq
    assert(fromIndex == recompute,
      s"index-served top-k diverged from recompute " +
        s"(first diff: ${fromIndex.zip(recompute).find(p => p._1 != p._2)})")
  }

  test("append + incremental refresh: only the appended vectors are " +
    "re-indexed, and the refreshed index is bit-identical to a full " +
    "rebuild over the appended corpus") {
    val rootInc = Files.createTempDirectory("graft-anninc")
    val rootFull = Files.createTempDirectory("graft-annfull")
    Seq(rootInc, rootFull).foreach(_.toFile.deleteOnExit())

    // Incremental path: index 300, append 30 (re-keyed +10000 so ids
    // stay unique; labels stay in-domain), refresh.
    Similarity.buildIvfIndex(spark, rootInc, vecsOf(300))
    val appended = vecsOf(30, idOffset = 10000L)
    SnapStore.append(spark, rootInc.resolve("vecs"), appended, "label")
    val n = Similarity.refreshIvfIndex(spark, rootInc)
    assert(n == 30L, s"refresh must index exactly the appended rows, got $n")
    assert(Similarity.refreshIvfIndex(spark, rootInc) == 0L,
      "a second refresh with no new appends must be a no-op")

    // Full-rebuild reference over the same 330 vectors.
    Similarity.buildIvfIndex(spark, rootFull,
      vecsOf(300).unionByName(vecsOf(30, idOffset = 10000L)))

    def centroids(root: java.nio.file.Path) =
      SnapStore.read(spark, root.resolve("ivf_centroids"))
        .filter(col("i") >= 1) // exclude the cursor sentinel
        .select(col("label"), col("i"), col("csum").cast("string"),
          col("ccnt"))
        .collect().map(r => (r.getInt(0), r.getInt(1),
          r.getString(2), r.getLong(3))).sortBy(t => (t._1, t._2)).toSeq
    assert(centroids(rootInc) == centroids(rootFull),
      "merged decimal sums must equal the full rebuild's exactly")

    def assignments(root: java.nio.file.Path) =
      SnapStore.read(spark, root.resolve("ivf_assign"))
        .collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    assert(assignments(rootInc) == assignments(rootFull))
    assert(assignments(rootInc).size == 330)
  }

  test("a refresh that crashed between the posting-list append and " +
    "the centroid merge re-runs to convergence: no duplicate " +
    "assignments, centroids merged exactly once") {
    val root = Files.createTempDirectory("graft-anncrash")
    root.toFile.deleteOnExit()
    Similarity.buildIvfIndex(spark, root, vecsOf(200))
    val appended = vecsOf(25, idOffset = 20000L)
    SnapStore.append(spark, root.resolve("vecs"), appended, "label")
    // Simulate the crashed first half: the assignment append landed,
    // the centroid overwrite (which carries the cursor) did not.
    SnapStore.append(spark, root.resolve("ivf_assign"),
      appended.select(col("vec_id"), col("label").as("alabel")), "alabel")

    val n = Similarity.refreshIvfIndex(spark, root)
    assert(n == 25L)
    val asg = SnapStore.read(spark, root.resolve("ivf_assign"))
      .collect().map(_.getLong(0)).toSeq
    assert(asg.size == 225 && asg.distinct.size == 225,
      s"re-run must not duplicate posting-list entries: ${asg.size}")
    // Centroid counts account for every vector exactly once.
    val total = SnapStore.read(spark, root.resolve("ivf_centroids"))
      .filter(col("i") === 1)
      .agg(org.apache.spark.sql.functions.sum(col("ccnt")))
      .collect()(0).getLong(0)
    assert(total == 225L, s"centroid counts must sum to 225, got $total")
  }
}
