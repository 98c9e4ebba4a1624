package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the (executed, post-AQE) physical plan of one or
  * more registered queries. `runMain graft.Explain q36_simhash_pairs
  * [sfDir]` — executes the query first so AQE finalizes the plan, then
  * dumps the tree (ReusedExchange / join strategy / codegen spans are
  * only trustworthy on the final plan).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.map(_.split(",").toSeq)
      .getOrElse(sys.error("usage: Explain <q1,q2,...> [sfDir]"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-explain")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      df.collect()   // drive THIS execution so AQE finalizes in place
      println(s"==== $n ====")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
