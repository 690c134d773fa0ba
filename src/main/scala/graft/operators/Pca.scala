package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GramMatrixAggregate

/** Distributed PCA by the "fit small, apply wide" pattern (the same shape
  * as [[KMeansIVF]]'s learned quantizer and [[BpeVocab]]'s merge learning):
  *
  *  1. ONE distributed pass accumulates Σxxᵀ exactly — the integer
  *     micro-unit [[graft.functions.GramMatrixMicro]] aggregate (a single
  *     long[d(d+1)/2] buffer per partition, map-side combined) plus the
  *     per-dimension micro sums for the mean. Exact integers ⇒ the
  *     covariance the driver sees is bit-identical run to run, so the
  *     whole fit is deterministic.
  *  2. The d×d covariance ((Σxxᵀ)/n − μμᵀ) eigendecomposes DRIVER-side —
  *     cyclic Jacobi, O(d³) on a d=64 matrix is microseconds; no cluster
  *     involvement, no iteration over data.
  *  3. Projection is a map-side expression: k dot products against
  *     broadcast-literal component vectors (the [[graft.functions.DotProduct]]
  *     codegen path) — no shuffle, linear in rows, exactly how a 100 TB
  *     embedding corpus gets dimension-reduced before ANN indexing.
  *
  * Sign convention: each component's largest-|coordinate| entry is made
  * positive, so eigenvector signs (mathematically arbitrary) are stable.
  */
object Pca {

  final case class Model(
      dims: Int,
      mean: Array[Double],
      components: Array[Array[Double]], // top-k rows, orthonormal
      eigenvalues: Array[Double])       // descending, matching components

  /** The exact integer moments the ONE fit pass accumulates — exposed so
    * audits (q93) can derive per-axis variances n·Σx²−(Σx)² without a
    * second corpus aggregation. `gramDiagMicro(i)` = Σ(round(xᵢ·1e6))²,
    * `sumMicro(i)` = Σ round(xᵢ·1e6); both order-independent long sums. */
  final case class Moments(n: Long, sumMicro: Array[Long], gramDiagMicro: Array[Long])

  /** One pass over `df` + a driver-side Jacobi eigensolve. */
  def fit(df: DataFrame, vecCol: String, dims: Int, k: Int): Model =
    fitWithMoments(df, vecCol, dims, k)._1

  /** [[fit]], also returning the pass's exact integer moments. */
  def fitWithMoments(df: DataFrame, vecCol: String, dims: Int, k: Int): (Model, Moments) = {
    require(k >= 1 && k <= dims, s"need 1 <= k <= dims, got k=$k dims=$dims")
    val v = col(vecCol).cast("array<double>")
    // cast BEFORE the sum: the aggregate must accumulate exact longs —
    // summing integral doubles goes inexact (and order-dependent) past
    // 2^53, breaking the bit-determinism the driver-side fit relies on
    val sumCols = (0 until dims).map(i =>
      sum(round(element_at(v, i + 1) * 1000000.0).cast("long")).cast("long").as(s"s$i"))
    val row = df.agg(
      GramMatrixAggregate.gramMicro(v, dims).as("g"),
      (count(lit(1)).as("n") +: sumCols): _*).head()

    val nL = row.getAs[Long]("n")
    val n = nL.toDouble
    require(n >= 2, s"PCA needs >= 2 rows, got $n")
    val sums = (0 until dims).map(i => row.getAs[Long](s"s$i")).toArray
    val mean = (0 until dims).map(i => sums(i) / 1e6 / n).toArray
    // gram entries are micro² (1e-12) scaled
    val cov = Array.ofDim[Double](dims, dims)
    val gramDiag = Array.ofDim[Long](dims)
    row.getSeq[org.apache.spark.sql.Row](row.fieldIndex("g")).foreach { cell =>
      val i = cell.getInt(0); val j = cell.getInt(1)
      if (i == j) gramDiag(i) = cell.getLong(2)
      val e = cell.getLong(2) / 1e12 / n - mean(i) * mean(j)
      cov(i)(j) = e; cov(j)(i) = e
    }

    val (values, vectors) = jacobiEigen(cov)
    val order = values.zipWithIndex.sortBy { case (ev, idx) => (-ev, idx) }.map(_._2).take(k)
    val comps = order.map { idx =>
      val c = vectors.map(_(idx))
      val m = c.indices.maxBy(i => math.abs(c(i)))
      if (c(m) < 0) c.map(-_) else c
    }
    (Model(dims, mean, comps.toArray, order.map(values).toArray),
      Moments(nL, sums, gramDiag))
  }

  /** Map-side projection onto the model's components: k codegen'd dot
    * products of the (centered) vector against literal component arrays. */
  def projectCol(vecCol: Column, model: Model): Column = {
    val v = vecCol.cast("array<double>")
    val comps = model.components.map { c =>
      // dot(x - mean, c) = dot(x, c) - dot(mean, c): precompute the scalar
      val offset = c.zip(model.mean).map { case (ci, mi) => ci * mi }.sum
      graft.functions.VectorExpressions.dot(v, typedLit(c.toSeq)) - lit(offset)
    }
    array(comps: _*)
  }

  def project(df: DataFrame, vecCol: String, model: Model, outCol: String = "pca"): DataFrame =
    df.withColumn(outCol, projectCol(col(vecCol), model))

  /** Cyclic Jacobi on a symmetric matrix: returns (eigenvalues, column
    * eigenvectors). Deterministic: fixed sweep order, fixed tolerance. */
  private[operators] def jacobiEigen(a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    while (off > 1e-14 && sweep < 100) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > 1e-18) rotate(a, v, p, q)
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    ((0 until d).map(i => a(i)(i)).toArray, v)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- a.indices if i != j) s += a(i)(j) * a(i)(j)
    s
  }

  private def rotate(a: Array[Array[Double]], v: Array[Array[Double]], p: Int, q: Int): Unit = {
    val d = a.length
    val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
    val t = math.signum(theta) match {
      case 0.0 => 1.0 / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
      case s   => s / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
    }
    val c = 1.0 / math.sqrt(t * t + 1.0)
    val s = t * c
    val app = a(p)(p); val aqq = a(q)(q); val apq = a(p)(q)
    a(p)(p) = c * c * app - 2.0 * s * c * apq + s * s * aqq
    a(q)(q) = s * s * app + 2.0 * s * c * apq + c * c * aqq
    a(p)(q) = 0.0; a(q)(p) = 0.0
    var i = 0
    while (i < d) {
      if (i != p && i != q) {
        val aip = a(i)(p); val aiq = a(i)(q)
        a(i)(p) = c * aip - s * aiq; a(p)(i) = a(i)(p)
        a(i)(q) = s * aip + c * aiq; a(q)(i) = a(i)(q)
      }
      val vip = v(i)(p); val viq = v(i)(q)
      v(i)(p) = c * vip - s * viq
      v(i)(q) = s * vip + c * viq
      i += 1
    }
  }
}
