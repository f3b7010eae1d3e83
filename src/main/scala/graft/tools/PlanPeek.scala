package graft.tools

import graft._

/** Dev probe: execute one registered query at a given SF and print its
  * FINALIZED formatted physical plan (collect first, so the AQE plan shown
  * is the one that actually ran). Usage:
  * `runMain graft.tools.PlanPeek <query> [sfDir]`.
  */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val s = GraftSession.get(4)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val df = Registry.byName(args(0)).run(s, dir)
    df.collect()
    df.explain("formatted")
  }
}
