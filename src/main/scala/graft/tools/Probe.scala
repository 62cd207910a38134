package graft.tools

/** Tiny main used to verify how sbt relays forked stdout (the driver
  * line-parses our bench JSON from the captured tail, so the emit path
  * must produce an unprefixed line).
  */
object Probe {
  def main(args: Array[String]): Unit = {
    println("""{"probe":"println"}""")
    val raw = new java.io.PrintStream(
      new java.io.FileOutputStream(java.io.FileDescriptor.out), true)
    raw.println("""{"probe":"rawfd"}""")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      raw.println("""{"probe":"hook"}"""); raw.flush()
    }))
  }
}
