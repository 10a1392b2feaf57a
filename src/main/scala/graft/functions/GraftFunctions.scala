package graft.functions

import org.apache.spark.sql.SparkSession

/** SQL-surface registration for graft's native expressions, so
  * `spark.sql("SELECT dot_q(a, b) ...")` works next to the Column API
  * (the same dual surface Spark's own functions have). */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_q", exprs => VectorDotQ(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "token_simhash64", exprs => TokenSimHash64(exprs.head), "scala_udf")
  }
}
