package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bench provenance: the steal counter must read on this host and the
  * provenance fragment must flag contamination mechanically. */
class HostMeterSpec extends AnyFunSuite {

  test("steal counter reads and is monotone on Linux") {
    val a = HostMeter.stealSec()
    assume(a >= 0, "/proc/stat steal column unavailable on this host")
    val b = HostMeter.stealSec()
    assert(b >= a, s"cumulative steal went backwards: $a -> $b")
  }

  test("provenance fragment carries steal/load/contended and flags only real steal") {
    val nCpu = Runtime.getRuntime.availableProcessors()
    // a quiet 10-second window with zero recorded steal -> not contended
    val start = HostMeter.Mark(steal = 100.0, load1 = 0.2, wallNanos = 0L)
    val quiet = HostMeter.Mark(steal = 100.0, load1 = 0.3,
      wallNanos = 10L * 1000 * 1000 * 1000)
    val qj = HostMeter.provenanceJson(start, quiet)
    assert(qj.contains("\"steal_sec\":0.000"), qj)
    assert(qj.contains("\"contended\":false"), qj)
    assert(qj.contains(s""""ncpu":$nCpu"""), qj)
    assert(qj.contains("\"load1_start\":0.2"), qj)
    // steal above the capacity threshold over the same window -> flagged
    val stolen = 10.0 * nCpu * (HostMeter.ContendedStealFrac * 2)
    val noisy = HostMeter.Mark(steal = 100.0 + stolen, load1 = 9.0,
      wallNanos = quiet.wallNanos)
    val nj = HostMeter.provenanceJson(start, noisy)
    assert(nj.contains("\"contended\":true"), nj)
    // unreadable counter -> -1 markers, never a contended verdict
    val blind = HostMeter.provenanceJson(
      HostMeter.Mark(-1.0, 0.2, 0L), noisy)
    assert(blind.contains("\"steal_sec\":-1.000"), blind)
    assert(blind.contains("\"contended\":false"), blind)
  }
}
