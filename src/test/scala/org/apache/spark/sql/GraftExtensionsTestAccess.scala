package org.apache.spark.sql

/** Test-only bridge into the `private[sql]` half of
  * [[SparkSessionExtensions]]: lets specs enumerate what an extensions
  * class injected without building a whole SparkSession around it.
  */
object GraftExtensionsTestAccess {
  def functionNames(ext: SparkSessionExtensions): Set[String] = {
    val reg = new org.apache.spark.sql.catalyst.analysis.SimpleFunctionRegistry
    ext.registerFunctions(reg)
    reg.listFunction().map(_.funcName).toSet
  }
}
