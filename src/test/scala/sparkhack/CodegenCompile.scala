package org.apache.spark.sql.catalyst.expressions.codegen

import org.apache.spark.sql.catalyst.expressions.Expression

/** Test-only bridge into the private[sql] codegen API. */
object CodegenCompile {
  /** Compiles (not just renders) the UnsafeProjection for `exprs` with
    * subexpression elimination — throws on any Janino error instead of
    * silently falling back to the interpreter like UnsafeProjection.create
    * does. Used by CodegenCompileSpec to pin every custom expression to
    * whole-stage-compilable code. */
  def compileUnsafeProjection(exprs: Seq[Expression]): Unit = {
    GenerateUnsafeProjection.generate(exprs, subexpressionEliminationEnabled = true)
    ()
  }
}
