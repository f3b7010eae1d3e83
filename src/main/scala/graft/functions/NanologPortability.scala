package graft.functions

/** The measured cross-engine contract behind [[graft.operators.Sentiment]]'s
  * integer-nanolog Naive Bayes scoring: floor(ln(k)·1e9 + 0.5) is
  * bit-identical between the JVM's Math.log and DuckDB's ln for EVERY
  * integer k ≤ 100,000,000. Raw ln differs by ~1 ulp on ~27 per million
  * inputs (neither engine's ln is correctly rounded), but the half-up
  * nanolog rounding absorbs all of them — a flip needs the true value
  * within ~1 ulp of a 0.5e-9 rounding boundary, ~1e-10 per integer.
  *
  * The measurement is pinned HERE as per-range CRC32s of the big-endian
  * value stream, recomputed from both engines at recording time
  * (2026-08-16, JDK 17 / the container's DuckDB):
  *  - FunctionsSpec recomputes the JVM side of the first range on every
  *    test run, so a JDK upgrade that changes Math.log rounding fails
  *    the build instead of silently desynchronizing sent_nb_eval's
  *    oracle;
  *  - tools/nanolog_check.py recomputes the DuckDB side of all ranges
  *    against the same constants (driver-side python, the check.py
  *    toolchain).
  */
object NanologPortability {

  /** Largest integer ln argument the cross-engine bit-identity is
    * MEASURED for (= max hi of [[Ranges]]). Beyond it the ulp argument
    * still holds but is extrapolated; [[graft.operators.Sentiment]]'s
    * scorer raises at runtime rather than risk a silent oracle desync
    * (r17 ADVICE).
    */
  val MeasuredMax: Long = 100000000L

  /** (lo, hi, CRC32 of big-endian longs floor(ln(k)·1e9+0.5), k = lo..hi). */
  val Ranges: Seq[(Long, Long, Long)] = Seq(
    (1L, 2000000L, 1743986948L),
    (2000001L, 20000000L, 4139499043L),
    (20000001L, 50000000L, 3221527147L),
    (50000001L, 100000000L, 2456336427L))

  /** CRC32 of the JVM-side nanolog stream for k = lo..hi. */
  def jvmCrc(lo: Long, hi: Long): Long = {
    val crc = new java.util.zip.CRC32
    val buf = new Array[Byte](8)
    var k = lo
    while (k <= hi) {
      val v = math.floor(math.log(k.toDouble) * 1e9 + 0.5).toLong
      buf(0) = (v >>> 56).toByte; buf(1) = (v >>> 48).toByte
      buf(2) = (v >>> 40).toByte; buf(3) = (v >>> 32).toByte
      buf(4) = (v >>> 24).toByte; buf(5) = (v >>> 16).toByte
      buf(6) = (v >>> 8).toByte; buf(7) = v.toByte
      crc.update(buf)
      k += 1
    }
    crc.getValue
  }
}
