package graft

/** Machine-checkable bench provenance. Three rounds of benchmark
  * artifacts needed out-of-band prose adjudication against hypervisor
  * steal (identical binaries dilating 3-4× with zero guest processes);
  * the signal that settles those disputes is the kernel's own cumulative
  * steal counter — field 8 of `/proc/stat`'s aggregate `cpu` line, the
  * jiffies this guest was runnable but the hypervisor ran someone else.
  * Recording its delta INSIDE every artifact (alongside the 1-min
  * loadavg already there) turns "was this run contaminated?" into a
  * field comparison instead of a PLANS.md narrative.
  *
  * Units: the `cpu` line aggregates over all CPUs at USER_HZ = 100
  * (fixed kernel ABI for /proc/stat regardless of CONFIG_HZ), so the
  * delta is stolen CPU-seconds across the whole machine. `stealPct`
  * normalizes by wall × nCpu — the fraction of total machine capacity
  * the hypervisor took during the run. Flag, don't refuse: the driver's
  * per-round run must still produce its artifact, so a contaminated run
  * is marked `"contended":true` (and warned on stderr) for the judge to
  * discount mechanically. */
object HostMeter {

  /** Fraction of machine capacity stolen above which a timing run is
    * flagged contaminated. 2% of 32 cores over a 123 s sf0.1 battery is
    * ~79 stolen CPU-seconds — far above scheduler noise (clean-host
    * runs measure < 0.1%), far below the 3-4× dilation episodes (r14's
    * logged incident: ~5,070 stolen CPU-seconds across the session). */
  val ContendedStealFrac = 0.02

  private val UserHz = 100.0

  /** Cumulative steal CPU-seconds since boot, or -1 where unreadable
    * (non-Linux, or a kernel without the steal column). */
  def stealSec(): Double =
    try {
      val src = scala.io.Source.fromFile("/proc/stat")
      try src.getLines().find(_.startsWith("cpu "))
        .map(_.trim.split("\\s+"))
        .filter(_.length > 8)
        .map(f => f(8).toDouble / UserHz)
        .getOrElse(-1.0)
      finally src.close()
    } catch { case scala.util.control.NonFatal(_) => -1.0 }

  /** 1-min system loadavg, or -1 where the JVM can't read it. */
  def load1(): Double =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .getSystemLoadAverage

  final case class Mark(steal: Double, load1: Double, wallNanos: Long)

  def mark(): Mark = Mark(stealSec(), load1(), System.nanoTime())

  /** The provenance fields for one timed region, as a brace-less JSON
    * fragment callers splice into their artifact:
    * `"steal_sec":…,"steal_pct":…,"ncpu":…,"load1_start":…,
    * "load1_end":…,"contended":…`. `steal_sec`/`steal_pct` are -1 when
    * the counter is unreadable (then `contended` stays false — absence
    * of evidence is recorded as absence, not as a verdict). */
  def provenanceJson(start: Mark, end: Mark): String = {
    val nCpu = Runtime.getRuntime.availableProcessors()
    val wall = (end.wallNanos - start.wallNanos) / 1e9
    val steal =
      if (start.steal < 0 || end.steal < 0) -1.0 else end.steal - start.steal
    val pct =
      if (steal < 0 || wall <= 0) -1.0 else steal / (wall * nCpu)
    val contended = pct > ContendedStealFrac
    if (contended)
      System.err.println(
        f"[bench] CONTENDED RUN: $steal%.1f stolen CPU-seconds over " +
          f"$wall%.1f s wall (${pct * 100}%.1f%% of $nCpu cores) — " +
          "timings are not comparable; re-measure on a quiet host")
    s""""steal_sec":${r3(steal)},"steal_pct":${r4(pct)},"ncpu":$nCpu,""" +
      s""""load1_start":${start.load1},"load1_end":${end.load1},""" +
      s""""contended":$contended"""
  }

  private def r3(v: Double): String =
    BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
  private def r4(v: Double): String =
    BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toString
}
