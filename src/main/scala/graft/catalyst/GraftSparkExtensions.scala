package graft.catalyst

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions hook exposing graft's native expressions as SQL
  * functions, for spark-submit users:
  *
  *   spark-submit --conf spark.sql.extensions=graft.catalyst.GraftSparkExtensions ...
  *   SELECT graft_simhash64(text), graft_minhash_sig(shingles, 16),
  *          graft_cosine(a, b) FROM docs
  *
  * (Sessions created programmatically can call
  * org.apache.spark.sql.graft.NativeColumns.register(spark) instead — the
  * builder ignores extensions once a session exists.)
  */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftSparkExtensions].getName, null, name, usage, "")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("graft_simhash64"),
      info("graft_simhash64", "_FUNC_(text) - 64-bit simhash over whitespace tokens"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "graft_simhash64(text)")
        SimHash64Expr(exprs.head)
      }))
    e.injectFunction((FunctionIdentifier("graft_minhash_sig"),
      info("graft_minhash_sig", "_FUNC_(arr, k) - k-long minhash signature of a string array"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "graft_minhash_sig(arr, k)")
        val k = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v.toInt
          case other => sys.error(s"graft_minhash_sig: k must be a literal int, got $other")
        }
        MinHashSigExpr(exprs.head, k)
      }))
    e.injectFunction((FunctionIdentifier("graft_cosine"),
      info("graft_cosine", "_FUNC_(a, b) - cosine similarity of two float/double arrays"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "graft_cosine(a, b)")
        ArrayCosineExpr(exprs.head, exprs(1))
      }))
  }
}
