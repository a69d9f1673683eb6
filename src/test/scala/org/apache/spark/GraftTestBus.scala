package org.apache.spark

/** Test-only bridge to the private[spark] listener bus, so gate specs
  * can flush pending SparkListener events deterministically instead of
  * sleeping (the job-count pins in AnnSpec/PlanShapeSpec). */
object GraftTestBus {
  def waitUntilEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
