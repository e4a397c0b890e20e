package graft

import org.apache.spark.sql.functions._

/** Invariants for the curation operators (k-means Lloyd step, bigram
  * fluency, length deciles) that the value-level DuckDB oracle can't
  * express: partition totality, assignment optimality, and decile
  * monotonicity.
  */
class CurationSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  test("kmeans_step clusters partition the vector set") {
    val total = Tables.embeddings(spark, sf).count()
    val out = ops.Curation.kmeansStep(spark, sf)
      .select($"cid", $"n", $"inertia").as[(Long, Long, Long)].collect()
    assert(out.map(_._2).sum === total)
    assert(out.map(_._1).toSeq === out.map(_._1).toSeq.sorted)
    out.foreach { case (_, n, inertia) =>
      assert(n > 0)
      assert(inertia >= 0)
    }
  }

  test("kmeans_step seeds are assigned to themselves (distance 0)") {
    // A seed's distance to its own centroid is 0, the unique minimum
    // (ties broken toward lower cid can never displace a 0 from its
    // own cid unless another seed is identical — the fixture has no
    // identical embedding pairs among vec_id < 8).
    val e = Tables.embeddings(spark, sf)
      .select($"vec_id", expr("transform(CAST(embedding AS array<double>), " +
        "x -> CAST(floor(x * 1000000) AS BIGINT))").as("xm"))
      .filter($"vec_id" < 8)
      .as[(Long, Seq[Long])].collect()
    val distinctSeeds = e.map(_._2).distinct.length
    assert(distinctSeeds === e.length, "seed embeddings must be distinct")
    // Every seed cluster must therefore be non-empty.
    val cids = ops.Curation.kmeansStep(spark, sf)
      .select($"cid").as[Long].collect().toSet
    assert((0L until 8L).toSet.subsetOf(cids))
  }

  test("bigram_fluency scores every multi-word doc, within mass bounds") {
    val expected = Tables.documents(spark, sf)
      .filter(size(split($"text", " ")) >= 2).count()
    val out = ops.Curation.bigramFluency(spark, sf)
      .select($"doc_id", $"n_bg", $"fluency_micro").as[(Long, Long, Long)]
      .collect()
    assert(out.length.toLong === expected)
    val totalBg = out.map(_._2).sum
    out.foreach { case (_, nBg, micro) =>
      assert(nBg > 0)
      // mean corpus frequency of a doc's bigrams is at least 1 (each
      // bigram counts itself) and at most the corpus bigram total.
      assert(micro >= 1000000L)
      assert(micro <= 1000000L * totalBg)
    }
  }

  test("word_rarity bounds: min_df <= mean <= max df, hapax <= distinct") {
    val total = Tables.documents(spark, sf).count()
    val out = ops.Curation.wordRarity(spark, sf)
      .select($"doc_id", $"n_distinct", $"min_df", $"hapax", $"mean_df_micro")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(out.length.toLong === total)
    out.foreach { case (_, nd, minDf, hapax, meanMicro) =>
      assert(nd > 0 && minDf >= 1 && hapax >= 0 && hapax <= nd)
      // mean DF is at least the minimum DF (exact under floor division)
      assert(meanMicro >= 1000000L * minDf)
      // a doc containing a hapax has min_df = 1
      if (hapax > 0) assert(minDf === 1)
    }
  }

  test("length_deciles cover all docs with monotone token ranges") {
    val total = Tables.documents(spark, sf).count()
    val out = ops.Curation.lengthDeciles(spark, sf)
      .select($"decile", $"docs", $"min_tok", $"max_tok")
      .as[(Long, Long, Long, Long)].collect()
    assert(out.map(_._2).sum === total)
    out.foreach { case (d, _, lo, hi) =>
      assert(d >= 0 && d <= 9)
      assert(lo <= hi)
    }
    // Decile token ranges must be disjoint and increasing.
    out.sortBy(_._1).sliding(2).foreach {
      case Array((_, _, _, hi1), (_, _, lo2, _)) => assert(hi1 < lo2)
      case _ =>
    }
  }
}
