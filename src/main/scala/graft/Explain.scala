package graft

/** Plan-inspection main: prints the formatted physical plan of selected
  * queries (all, when no names given) so scan pruning (`PushedFilters`,
  * `ReadSchema`), join strategies and whole-stage-codegen spans can be
  * audited. Usage: runMain graft.Explain [sfDir] [name...] */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = args.drop(1).toSet
    val spark = Verify.makeSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    SparkEntry.allDefs
      .filter(d => names.isEmpty || names.contains(d.name))
      .foreach { d =>
        println(s"\n========== ${d.name} ==========")
        try d.fn(spark, sfDir).explain("formatted")
        catch { case e: Throwable => println(s"failed: ${e.getMessage}") }
      }
    spark.stop()
  }
}
