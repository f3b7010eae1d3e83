package graft.tools
/** Dev-only: raw JVM speed + flags check inside the forked runtime. */
object JvmProbe {
  def main(args: Array[String]): Unit = {
    import java.lang.management.ManagementFactory
    println("JVMPROBE args=" + ManagementFactory.getRuntimeMXBean.getInputArguments)
    var x = 0L
    val t0 = System.nanoTime()
    var i = 0
    while (i < 2_000_000_000) { x += i; i += 1 }
    println(f"JVMPROBE loop2B ${(System.nanoTime() - t0) / 1e9}%5.2f s x=$x")
    val t1 = System.nanoTime()
    val arr = Array.tabulate(10_000_000)(_.toString)
    val h = arr.map(_.hashCode.toLong).sum
    println(f"JVMPROBE alloc10M ${(System.nanoTime() - t1) / 1e9}%5.2f s h=$h")
  }
}
object JvmProbe2 {
  def main(args: Array[String]): Unit = {
    println("PROC " + Runtime.getRuntime.availableProcessors)
    println("ENV JAVA_TOOL_OPTIONS=" + sys.env.get("JAVA_TOOL_OPTIONS"))
    println("ENV JDK_JAVA_OPTIONS=" + sys.env.get("JDK_JAVA_OPTIONS"))
    println("ENV _JAVA_OPTIONS=" + sys.env.get("_JAVA_OPTIONS"))
    import java.lang.management.ManagementFactory
    import scala.jdk.CollectionConverters._
    ManagementFactory.getGarbageCollectorMXBeans.asScala.foreach(b => println("GC " + b.getName))
  }
}
object JvmProbe3 {
  def main(args: Array[String]): Unit = {
    println("HOME " + System.getProperty("java.home") + " ver=" + System.getProperty("java.vm.version") + " vm=" + System.getProperty("java.vm.name"))
    val t1 = System.nanoTime()
    val arr = new Array[String](10000000)
    var i = 0
    while (i < arr.length) { arr(i) = java.lang.Integer.toString(i); i += 1 }
    var h = 0L; i = 0
    while (i < arr.length) { h += arr(i).hashCode; i += 1 }
    println(f"ALLOC ${(System.nanoTime() - t1) / 1e9}%5.2f s h=$h")
    println("CDS " + System.getProperty("java.vm.info"))
  }
}
