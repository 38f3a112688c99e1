package graft

/** Kernel jiffy sampling for the bench's per-slot contention telemetry
  * (round 15). A sample is (aggregate busy jiffies, aggregate total
  * jiffies, this process's utime+stime jiffies); two samples bracketing
  * a timed region yield
  *
  *  - [[extBusyPct]]: the share of machine capacity OTHER processes
  *    held during the region — in-guest contention, measured during
  *    exactly the window the timer wraps (the pass-bracketing calib
  *    probes miss windows that open and close mid-pass);
  *  - [[selfUtilPct]]: this JVM's own share of the machine — the
  *    dilation discriminator separating "did more work" (wall up, util
  *    at its quiet baseline) from "got fewer cycles" (wall up, util
  *    proportionally down), which works even when the slowdown is
  *    hypervisor- or memory-bandwidth-level and invisible to guest
  *    jiffy accounting entirely.
  *
  * Telemetry may never break the bench: any read/parse failure yields
  * None, and both percent functions answer -1 for missing samples or
  * sub-jiffy regions. The parsing is isolated here (rather than inline
  * in Bench.main) so HostStatSpec can pin the subtle parts — the comm
  * field of /proc/self/stat may contain spaces and parentheses, and the
  * /proc/stat cpu line's column arithmetic differs across kernels.
  */
object HostStat {
  /** (busy, total, self) jiffies — None on any failure. */
  def sample(): Option[(Long, Long, Long)] =
    try {
      val stat = java.nio.file.Files.lines(java.nio.file.Paths.get("/proc/stat"))
        .filter(_.startsWith("cpu ")).findFirst.get
      val self = java.nio.file.Files.readString(
        java.nio.file.Paths.get("/proc/self/stat"))
      for (a <- parseCpuLine(stat); s <- parseSelfJiffies(self))
        yield (a._1, a._2, s)
    } catch { case _: Throwable => None }

  /** The aggregate "cpu " line of /proc/stat → (busy, total) jiffies.
    * Columns: user nice system idle iowait irq softirq steal [guest
    * guest_nice]; busy = user+nice+system+irq+softirq+steal (steal
    * counts as external — this process cannot have produced it), total
    * = busy+idle+iowait. Older kernels omit trailing columns, so
    * iowait/steal are read defensively.
    */
  def parseCpuLine(line: String): Option[(Long, Long)] =
    try {
      val c = line.trim.split("\\s+").drop(1).map(_.toLong)
      val busy = c(0) + c(1) + c(2) + c(5) + c(6) +
        (if (c.length > 7) c(7) else 0L)
      Some((busy, busy + c(3) + (if (c.length > 4) c(4) else 0L)))
    } catch { case _: Throwable => None }

  /** utime+stime of a /proc/<pid>/stat line. The comm field (2) is an
    * arbitrary thread name in parentheses — it may contain spaces and
    * even ')' — so fields are counted from the LAST ')' (the kernel
    * prints comm as a single parenthesized token; everything after the
    * final close-paren is fixed-position). utime/stime are fields 14/15
    * of the full line = indices 11/12 after "<paren>) ".
    */
  def parseSelfJiffies(stat: String): Option[Long] =
    try {
      val rest = stat.substring(stat.lastIndexOf(')') + 2).split(" ")
      Some(rest(11).toLong + rest(12).toLong)
    } catch { case _: Throwable => None }

  /** Percent of machine capacity other processes held between two
    * samples; -1 when either sample is missing or no jiffy elapsed. */
  def extBusyPct(a: Option[(Long, Long, Long)],
                 b: Option[(Long, Long, Long)]): Int = (a, b) match {
    case (Some((b0, t0, s0)), Some((b1, t1, s1))) if t1 > t0 =>
      (100L * math.max(0L, (b1 - b0) - (s1 - s0)) / (t1 - t0)).toInt
    case _ => -1
  }

  /** Percent of machine capacity THIS process held between two samples;
    * -1 when either sample is missing or no jiffy elapsed. */
  def selfUtilPct(a: Option[(Long, Long, Long)],
                  b: Option[(Long, Long, Long)]): Int = (a, b) match {
    case (Some((_, t0, s0)), Some((_, t1, s1))) if t1 > t0 =>
      (100L * math.max(0L, s1 - s0) / (t1 - t0)).toInt
    case _ => -1
  }
}
