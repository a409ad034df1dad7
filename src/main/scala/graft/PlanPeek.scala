package graft
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("8")
    val p = queries.TextQueries.t43_token_quota.fn(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    println("==== t43 ====")
    println(p)
    spark.stop()
  }
}
