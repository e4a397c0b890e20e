package graft

import org.apache.spark.sql.functions._

/** Guarantees of the bucket-representative candidate design
  * (ops.Dedup): connectivity for true duplicates and O(n·bands)
  * candidate bounds — the properties that make the operators safe at
  * 100 TB (VERDICT r1 #5/#6).
  */
class DedupSpec extends SparkSpec {

  private def exactDupGroups: Seq[Seq[Long]] = {
    // Ground truth: identical distinct-word SETS — exactly the
    // object minhash signatures are computed over (the fixture has
    // no byte-identical texts, but word-set duplicates exist).
    Tables.documents(spark, sf)
      .groupBy(sort_array(expr("array_distinct(split(text, ' '))")).as("ws"))
      .agg(collect_list(col("doc_id")).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(col("ids"))
      .collect()
      .map(_.getSeq[Long](0).sorted.toSeq)
      .toSeq
  }

  test("minhash LSH links connect every word-set-duplicate pair (union-find)") {
    val groups = exactDupGroups
    assert(groups.nonEmpty, "fixture should contain word-set duplicates")
    val links = ops.Dedup.minhashLsh(spark, sf)
      .select(col("a_id"), col("b_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: Long, b: Long): Unit = { parent(find(a)) = find(b) }
    links.foreach { case (a, b) => union(a, b) }
    // Identical docs share every band signature, so each links to (or
    // is) the same bucket representative — the unthresholded edge
    // list must connect them.
    groups.foreach { ids =>
      ids.tail.foreach(b =>
        assert(find(ids.head) == find(b),
          s"dup pair (${ids.head}, $b) not connected by minhash links"))
    }
  }

  test("rewritten dedup candidates are bounded by n (representative links)") {
    val n = Tables.documents(spark, sf).count()
    // One block membership per doc => at most one link per doc.
    val ngram = ops.Dedup.ngramJaccard(spark, sf)
    assert(ngram.count() <= n)
    assert(ngram.select(col("b_id")).distinct().count() === ngram.count())
    val nVec = Tables.embeddings(spark, sf).count()
    val emb = ops.Dedup.embeddingCosine(spark, sf)
    assert(emb.count() <= nVec)
    assert(emb.select(col("b_id")).distinct().count() === emb.count())
  }

  test("simhash histogram stays in the hamming<=3 domain and is deterministic") {
    val h1 = ops.Dedup.simhash(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(h1.forall { case (h, p) => h >= 0 && h <= 3 && p > 0 })
    val h2 = ops.Dedup.simhash(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(h1 === h2)
  }

  test("clusters are the exact connected components of the J>=0.8 links") {
    val links = ops.Dedup.minhashLsh(spark, sf)
      .filter(col("jacc") >= 0.8)
      .select(col("a_id"), col("b_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    links.foreach { case (a, b) => parent(find(a)) = find(b) }
    val got = ops.Dedup.clusters(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = Tables.documents(spark, sf).count()
    assert(got.length === n, "every document gets exactly one cluster row")
    // Reference components from the driver-side union-find: same
    // partition of docs, with cluster_id = the component's min doc.
    val refComp = got.map(_._1)
      .map(d => d -> find(d)).groupBy(_._2).values
      .map(_.map(_._1).toSet).toSet
    val gotComp = got.groupBy(_._2).values.map(_.map(_._1).toSet).toSet
    assert(gotComp === refComp)
    got.groupBy(_._2).foreach { case (cid, rows) =>
      assert(rows.map(_._1).min === cid, "cluster_id is the min doc_id")
      assert(rows.forall(_._3 == rows.length), "cluster_size is exact")
    }
  }

  test("clusters converge identically under durable checkpointing") {
    val baseline = ops.Dedup.clusters(spark, sf).collect()
      .map(_.toString).toSeq
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-cc-ckpt").toString
    spark.conf.set("spark.graft.cc.checkpointDir", ckpt)
    try {
      val durable = ops.Dedup.clusters(spark, sf).collect()
        .map(_.toString).toSeq
      assert(durable === baseline)
      // The conf actually took the durable path: checkpoint files
      // exist under the ESTABLISHED context checkpoint dir — Pin
      // sets it once per context (review r15 #5), so when an
      // earlier durable test already pinned a directory, this run's
      // payloads land THERE, not under this test's conf value.
      val actual = spark.sparkContext.getCheckpointDir.getOrElse(ckpt)
      val p = new org.apache.hadoop.fs.Path(actual)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(fs.exists(p) && fs.listStatus(p)
        .exists(_.getPath.getName.startsWith("rdd-")),
        s"no checkpoint payloads under $actual")
    } finally spark.conf.unset("spark.graft.cc.checkpointDir")
  }

  test("incremental dedup links incoming docs only to the corpus side") {
    val rows = ops.Dedup.incremental(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    def isIncoming(id: Long) = Math.floorMod(id * 2654435761L, 10L) == 0
    assert(rows.nonEmpty && rows.forall { case (id, _, _, _) => isIncoming(id) })
    rows.foreach { case (_, nCand, nDup, dupOf) =>
      assert(nDup <= nCand, "verified dups are a subset of candidates")
      if (nDup == 0) assert(dupOf === -1L)
      // The winning match must live in the corpus split, never the batch.
      else assert(dupOf >= 0 && !isIncoming(dupOf))
    }
    assert(rows.exists(_._3 > 0), "the verification threshold actually bites")
    assert(rows.exists(_._3 == 0), "not everything is a duplicate")
  }

  test("stream-static incremental dedup matches the batch verdicts") {
    import SparkSpec.spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val incomingDocs = Tables.documents(spark, sf)
      .filter(pmod(col("doc_id") * 2654435761L, lit(10)) === 0)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val stream = ops.Dedup.incrementalStream(spark, sf,
      ms.toDF().toDF("doc_id", "text"))
    val q = stream.writeStream.format("memory").queryName("inc_mem")
      .outputMode("append").start()
    try {
      ms.addData(incomingDocs.toIndexedSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("inc_mem")
      .select($"doc_id", $"idx_doc", $"is_dup").distinct()
      .as[(Long, Long, Boolean)].collect()
      .groupBy(_._1).view
      .mapValues(rs => rs.filter(_._3).map(_._2).sorted.toSeq).toMap
    val batch = ops.Dedup.incremental(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(batch.nonEmpty)
    batch.foreach { case (id, nDup, dupOf) =>
      val dups = got.getOrElse(id, Seq.empty)
      assert(dups.size === nDup, s"doc $id: stream $dups vs batch n_dup $nDup")
      if (nDup > 0) assert(dups.min === dupOf)
    }
  }

  test("verified links respect their thresholds and similarity domains") {
    val jaccs = ops.Dedup.ngramJaccard(spark, sf)
      .select(col("jacc")).collect().map(_.getDouble(0))
    assert(jaccs.forall(j => j >= 0.8 && j <= 1.0))
    val cosines = ops.Dedup.embeddingCosine(spark, sf)
      .select(col("cosine")).collect().map(_.getDouble(0))
    assert(cosines.forall(c => c >= 0.25 && c <= 1.0000001))
  }
}
