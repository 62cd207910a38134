package graft.operators

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{AtomicLong, AtomicReference}
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerStageSubmitted, SparkListenerTaskEnd}

/** Interactive progress/ETA reporting — the Spark re-expression of the
  * reference's StatsManager + printStatus status line (O20,
  * /root/reference/StatsManager.py:4-34,
  * /root/reference/filefilter.py:116-141). The reference tracked a
  * rolling per-row average and printed
  * `Filter i (name): ... avgT:.. ETA:HH:MM:SS ...` every 100 ms; rows
  * here are processed by parallel tasks inside stages, so the unit of
  * progress is the TASK: per active stage we track completed/total
  * tasks, records read, a rolling average task time, and derive
  *   ETA = pending_tasks × avgTaskMillis / activeCores
  * (the reference's `pending × avg / workers`, StatsManager.py:27-34).
  *
  * Scale note: listener events arrive on the driver's listener bus —
  * constant work per task, no executor-side cost, safe at any SF.
  */
object ProgressListener {
  private final case class StageState(
      name: String, numTasks: Int,
      done: AtomicLong = new AtomicLong, records: AtomicLong = new AtomicLong,
      taskMillis: AtomicLong = new AtomicLong, t0: Long = System.nanoTime())
}

final class ProgressListener(
    out: String => Unit = s => Console.err.print(s + "\r"),
    cores: Int = Runtime.getRuntime.availableProcessors(),
    intervalMs: Long = 100L) extends SparkListener {
  import ProgressListener.StageState

  private val stages = new ConcurrentHashMap[Int, StageState]()
  private val lastPrint = new AtomicLong(0L)
  private val last = new AtomicReference[String]("")

  /** Last status line emitted (for tests / final summary). */
  def lastLine: String = last.get()

  override def onStageSubmitted(ev: SparkListenerStageSubmitted): Unit = {
    val si = ev.stageInfo
    stages.put(si.stageId, StageState(si.name.takeWhile(_ != '\n'), si.numTasks))
  }

  override def onTaskEnd(ev: SparkListenerTaskEnd): Unit = {
    val st = stages.get(ev.stageId)
    if (st != null) {
      st.done.incrementAndGet()
      st.taskMillis.addAndGet(ev.taskInfo.duration)
      val m = ev.taskMetrics
      if (m != null) st.records.addAndGet(
        m.inputMetrics.recordsRead + m.shuffleReadMetrics.recordsRead)
      maybePrint(st, ev.stageId, force = false)
    }
  }

  override def onStageCompleted(ev: SparkListenerStageCompleted): Unit = {
    val st = stages.remove(ev.stageInfo.stageId)
    if (st != null) maybePrint(st, ev.stageInfo.stageId, force = true)
  }

  private def maybePrint(st: StageState, stageId: Int, force: Boolean): Unit = {
    val now = System.currentTimeMillis()
    val prev = lastPrint.get()
    if (force || now - prev >= intervalMs) {
      if (lastPrint.compareAndSet(prev, now)) {
        val done = st.done.get()
        val avg = if (done == 0) 0L else st.taskMillis.get() / done
        val pending = math.max(0L, st.numTasks - done)
        val etaMs = pending * avg / math.max(1, cores)
        val elapsedSec = (System.nanoTime() - st.t0) / 1e9
        val rate = if (elapsedSec > 0) (st.records.get() / elapsedSec).toLong else 0L
        val line = f"Stage $stageId (${st.name}): Tasks:$done/${st.numTasks} " +
          f"Rows:${st.records.get()} rows/s:$rate avgT:${avg}ms ETA:${hms(etaMs)}"
        last.set(line)
        out(line)
      }
    }
  }

  /** HH:MM:SS like the reference's time.strftime (StatsManager.py:34). */
  private def hms(ms: Long): String = {
    val s = ms / 1000
    f"${s / 3600}%02d:${s % 3600 / 60}%02d:${s % 60}%02d"
  }
}
