package graft

/** Flake-adjudication runner (round-20 directive #2): run one suite N
  * times inside ONE JVM — `Test/runMain graft.RepeatSuite
  * <N> [<suiteClass>]` — so a once-observed transient failure gets a
  * reproduction COUNT instead of a shrug. The shared SparkSession is
  * reused across iterations exactly like a parallel full-suite run
  * reuses it, so lease/recover timing windows see the same contention
  * shape that produced the original observation. Exit 1 on any
  * failing iteration, with the failing test names printed.
  */
object RepeatSuite {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(50)
    val cls = args.drop(1).headOption
      .getOrElse("graft.StagedCommitSpec")
    var failedRuns = 0
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    for (i <- 1 to n) {
      val suite = Class.forName(cls).getDeclaredConstructor()
        .newInstance().asInstanceOf[org.scalatest.Suite]
      val rep = new org.scalatest.Reporter {
        override def apply(e: org.scalatest.events.Event): Unit =
          e match {
            case f: org.scalatest.events.TestFailed =>
              failures += s"run $i: ${f.testName}: ${f.message}"
            case _ => ()
          }
      }
      val before = failures.size
      suite.run(None, org.scalatest.Args(rep))
      if (failures.size > before) failedRuns += 1
      if (i % 10 == 0) println(s"RepeatSuite: $i/$n done, " +
        s"$failedRuns failing runs so far")
    }
    failures.foreach(f => println(s"FAILED $f"))
    println(s"RepeatSuite: $cls x $n -> $failedRuns failing runs, " +
      s"${failures.size} failing tests")
    if (failedRuns > 0) sys.exit(1)
  }
}
