package graft

import java.util.concurrent.{ConcurrentLinkedDeque, CountDownLatch, TimeUnit}

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, StageInfo}

/** Scala re-expression of the reference's `CustomMetricListener`
  * semantics (`CustomMetricListener.java:17-78`): capture the SQL
  * execution id from the first job's properties (latched, with a
  * timeout — `:36-50,68-78`), map stages to execution ids (`:52-60`),
  * and keep completed StageInfos for post-run attribution (`:62-66`).
  */
final class MetricListener extends SparkListener {
  @volatile private var latch = new CountDownLatch(1)
  @volatile private var currentExecutionId: Option[String] = None
  private val stageToExecution = TrieMap.empty[Int, String]
  private val completedStages = new ConcurrentLinkedDeque[StageInfo]()

  /** Reference resets per query before execution (`IcebergBenchmark.java:178`). */
  def reset(): Unit = {
    latch = new CountDownLatch(1)
    currentExecutionId = None
  }

  override def onJobStart(jobStart: SparkListenerJobStart): Unit = {
    val execId = Option(jobStart.properties)
      .flatMap(p => Option(p.getProperty("spark.sql.execution.id")))
    execId.foreach { id =>
      if (currentExecutionId.isEmpty) {
        currentExecutionId = Some(id)
        latch.countDown()
      }
      jobStart.stageIds.foreach(sid => stageToExecution.put(sid, id))
    }
  }

  override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
    completedStages.add(sc.stageInfo)

  /** Latch-wait mirroring `CustomMetricListener.java:68-78` (10s there). */
  def awaitExecutionId(timeoutMs: Long = 10000): Option[String] = {
    latch.await(timeoutMs, TimeUnit.MILLISECONDS)
    currentExecutionId
  }

  /** Stage-metric rollup for one execution id, mirroring
    * `IcebergBenchmark.java:269-355`: executor run/cpu/GC time, rows
    * and bytes read, plus any accumulables named `custom_scan_time*`
    * summed as total_batch_scan_time_ms (`:306-309`). The reference's
    * producer is its patched Iceberg reader; locally
    * [[graft.sources.SyntheticSource]] emits the same metric through
    * the DSv2 CustomMetric API (spec-verified end to end), and any
    * other scan leaves the sum at zero.
    */
  def metrics(executionId: String): (String, Long) = {
    val stages = completedStages.iterator.asScala
      .filter(si => stageToExecution.get(si.stageId).contains(executionId))
      .toSeq
    var run, cpu, gc, records, bytes, scanMs = 0L
    val perStage = stages.map { si =>
      val tm = si.taskMetrics
      run += tm.executorRunTime
      cpu += tm.executorCpuTime / 1000000L
      gc += tm.jvmGCTime
      records += tm.inputMetrics.recordsRead
      bytes += tm.inputMetrics.bytesRead
      val scan = si.accumulables.values
        .filter(_.name.exists(_.startsWith("custom_scan_time")))
        .flatMap(_.value.collect { case l: java.lang.Long => l.longValue() })
        .sum
      scanMs += scan
      s"""{"stage_id":${si.stageId},"run_ms":${tm.executorRunTime},""" +
        s""""cpu_ms":${tm.executorCpuTime / 1000000L},"gc_ms":${tm.jvmGCTime}}"""
    }
    val json =
      s"""{"executor_run_time_ms":$run,"executor_cpu_time_ms":$cpu,""" +
        s""""jvm_gc_time_ms":$gc,"records_read":$records,"bytes_read":$bytes,""" +
        s""""stages":[${perStage.mkString(",")}]}"""
    (json, scanMs)
  }

  def clearStages(): Unit = {
    completedStages.clear()
    stageToExecution.clear()
  }
}
