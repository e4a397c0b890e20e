package graft

import graft.queries.{Materialize, TpcdsCorpus}

/** The corpus-table materialization layer: physical parquet tables
  * restore predicate pushdown and column pruning on the fact scans
  * (round-2's perf-weak item), and the conf kill-switch falls back to
  * pure synthesized views.
  */
class MaterializeSpec extends SparkSpec {

  private def q03Plan: String = {
    val df = SparkEntry.queries("corpus_tpcds_q03")(spark, sf)
    df.queryExecution.executedPlan.toString
  }

  test("corpus fact scans carry PushedFilters and pruned schemas") {
    val plan = q03Plan
    val factScan = plan.linesIterator
      .find(l => l.contains("FileScan parquet") && l.contains("ss_sold_date_sk"))
    assert(factScan.isDefined, plan)
    assert(factScan.get.contains("PushedFilters: [") &&
      !factScan.get.contains("PushedFilters: []"), factScan.get)
    // Pruned: the 23-column store_sales scan reads only the 3 columns
    // q03 touches.
    assert(!factScan.get.contains("ss_quantity"), factScan.get)
  }

  test("materialize=false falls back to synthesized views, same rows") {
    val rows = SparkEntry.queries("corpus_tpcds_q03")(spark, sf)
      .collect().map(_.toString).toSeq
    val s2 = spark.newSession()
    s2.conf.set(Materialize.confKey, "false")
    TpcdsCorpus.register(s2, sf)
    val viewRows = SparkEntry.queries("corpus_tpcds_q03")(s2, sf)
      .collect().map(_.toString).toSeq
    assert(viewRows === rows)
    s2.conf.unset(Materialize.confKey)
    // The catalog is shared across sessions: restore the stat-bearing
    // tables so later suites see the materialized registrations.
    TpcdsCorpus.register(spark.newSession(), sf)
  }
}
