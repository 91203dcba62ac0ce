package graft.functions

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.catalyst.expressions.Expression

/** Arity guard for the native-function SQL registrars. Every `register`
  * in this package hands the function registry a builder that indexes
  * into the argument list (`exprs.head`, `exprs(1)`); called with the
  * wrong argument count, that indexing threw a bare
  * NoSuchElementException naming neither the function nor the expected
  * signature. Routing builders through [[checked]] raises Spark's own
  * `WRONG_NUM_ARGS` AnalysisException instead — same error class, same
  * SQLSTATE (42605), same message shape as a built-in function called
  * with bad arity.
  */
private[functions] object FunctionArity {

  /** Wrap `build` so it validates `exprs.length == arity` before
    * indexing, raising an analysis error that names `name`.
    */
  def checked(name: String, arity: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    exprs => {
      if (exprs.length != arity) {
        throw new AnalysisException(
          errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          messageParameters = Map(
            "functionName" -> s"`$name`",
            "expectedNum" -> arity.toString,
            "actualNum" -> exprs.length.toString,
            "docroot" -> "https://spark.apache.org/docs/latest"),
          cause = None)
      }
      build(exprs)
    }
}
