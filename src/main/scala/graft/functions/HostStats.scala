package graft.functions

/** Host-level measurement helpers shared by the benchmark and the scale
  * probe — ONE reader, so the two artifacts can never silently diverge
  * in how they stamp contamination evidence.
  */
object HostStats {

  /** The host's 1-minute load average (−1.0 where /proc is unavailable —
    * artifacts then show the stamp as missing rather than lying). */
  def loadAvg1: Double =
    try scala.io.Source.fromFile("/proc/loadavg").mkString
      .split(" ")(0).toDouble
    catch { case _: Throwable => -1.0 }
}
