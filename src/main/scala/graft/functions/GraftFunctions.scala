package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.functions.call_function

/** Registration for graft's native Catalyst expressions.
  *
  * Either configure `spark.sql.extensions=graft.functions.GraftExtensions`
  * or call [[GraftFunctions.register]] on a live session; after that the
  * functions are available in SQL and via `expr(...)`.
  */
object GraftFunctions {

  private[functions] val cosineInfo = new ExpressionInfo(
    classOf[CosineSimilarity].getName, null, "graft_cosine")

  private[functions] val cosineBuilder: Seq[Expression] => Expression = { children =>
    require(children.length == 2, "graft_cosine requires exactly 2 arguments")
    CosineSimilarity(children.head, children(1))
  }

  private[functions] val l2Info = new ExpressionInfo(
    classOf[L2DistanceSq].getName, null, "graft_l2sq")

  private[functions] val l2Builder: Seq[Expression] => Expression = { children =>
    require(children.length == 2, "graft_l2sq requires exactly 2 arguments")
    L2DistanceSq(children.head, children(1))
  }

  private[functions] val dbitsInfo = new ExpressionInfo(
    classOf[DoubleBits].getName, null, "graft_dbits")

  private[functions] val dbitsBuilder: Seq[Expression] => Expression = { children =>
    require(children.length == 1, "graft_dbits requires exactly 1 argument")
    DoubleBits(children.head)
  }

  private[functions] val hammingInfo = new ExpressionInfo(
    classOf[Hamming64].getName, null, "graft_hamming64")

  private[functions] val hammingBuilder: Seq[Expression] => Expression = { children =>
    require(children.length == 2, "graft_hamming64 requires exactly 2 arguments")
    Hamming64(children.head, children(1))
  }

  private[functions] val sortedCommonInfo = new ExpressionInfo(
    classOf[SortedCommonCount64].getName, null, "graft_sorted_common64")

  private[functions] val sortedCommonBuilder: Seq[Expression] => Expression = { children =>
    require(children.length == 2, "graft_sorted_common64 requires exactly 2 arguments")
    SortedCommonCount64(children.head, children(1))
  }

  private[functions] val norm2Info = new ExpressionInfo(
    classOf[Norm2].getName, null, "graft_norm2")

  private[functions] val norm2Builder: Seq[Expression] => Expression = { children =>
    require(children.length == 1, "graft_norm2 requires exactly 1 argument")
    Norm2(children.head)
  }

  private[functions] val maxByInfo = new ExpressionInfo(
    classOf[MaxByHash].getName, null, "graft_max_by")

  private[functions] val maxByBuilder: Seq[Expression] => Expression = { children =>
    require(children.length == 2, "graft_max_by requires exactly 2 arguments")
    MaxByHash(children.head, children(1))
  }

  private[functions] val minByInfo = new ExpressionInfo(
    classOf[MaxByHash].getName, null, "graft_min_by")

  private[functions] val minByBuilder: Seq[Expression] => Expression = { children =>
    require(children.length == 2, "graft_min_by requires exactly 2 arguments")
    MaxByHash(children.head, children(1), reverse = true)
  }

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_max_by"), maxByInfo, maxByBuilder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_min_by"), minByInfo, minByBuilder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_cosine"), cosineInfo, cosineBuilder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_l2sq"), l2Info, l2Builder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_dbits"), dbitsInfo, dbitsBuilder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_hamming64"), hammingInfo, hammingBuilder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_sorted_common64"), sortedCommonInfo, sortedCommonBuilder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_norm2"), norm2Info, norm2Builder)
  }

  /** Column-API argmax/argmin over [[MaxByHash]] — takes the consuming
    * DataFrame so registration lands on the session the plan resolves
    * against (registration is idempotent). */
  def maxByCol(df: DataFrame, value: Column, ord: Column): Column = {
    register(df.sparkSession)
    call_function("graft_max_by", value, ord)
  }

  def minByCol(df: DataFrame, value: Column, ord: Column): Column = {
    register(df.sparkSession)
    call_function("graft_min_by", value, ord)
  }
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("graft_cosine"), GraftFunctions.cosineInfo, GraftFunctions.cosineBuilder))
    ext.injectFunction((FunctionIdentifier("graft_l2sq"), GraftFunctions.l2Info, GraftFunctions.l2Builder))
    ext.injectFunction((FunctionIdentifier("graft_dbits"), GraftFunctions.dbitsInfo, GraftFunctions.dbitsBuilder))
    ext.injectFunction((FunctionIdentifier("graft_hamming64"), GraftFunctions.hammingInfo, GraftFunctions.hammingBuilder))
    ext.injectFunction((FunctionIdentifier("graft_sorted_common64"), GraftFunctions.sortedCommonInfo, GraftFunctions.sortedCommonBuilder))
    ext.injectFunction((FunctionIdentifier("graft_max_by"), GraftFunctions.maxByInfo, GraftFunctions.maxByBuilder))
    ext.injectFunction((FunctionIdentifier("graft_min_by"), GraftFunctions.minByInfo, GraftFunctions.minByBuilder))
    ext.injectFunction((FunctionIdentifier("graft_norm2"), GraftFunctions.norm2Info, GraftFunctions.norm2Builder))
  }
}
