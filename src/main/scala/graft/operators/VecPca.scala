package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.vecDot

/** PCA / whitening over the embedding store — the dimensionality-reduction
  * stage of an embedding pipeline (fit once, project everything; the
  * classic pre-ANN compression next to V7's int8, V10's PQ and V13's sign
  * bits, and the de-biasing step behind "whitening sentence
  * representations"). Spark shape: the fit is ONE distributed pass — a
  * per-partition (count, Σx, Σxxᵀ) accumulator (mapPartitions — genuine
  * per-partition imperative logic; the d×d outer-product matrix never
  * materializes as rows), merged on the driver in partition order so the
  * float sums are deterministic per corpus layout. The eigensolve is a
  * cyclic Jacobi on the d×d covariance (d=64 ⇒ trivially driver-sized,
  * bounded driver state like the k-means centroids), and the projection
  * is m codegen'd vec_dot columns against broadcast literal components —
  * (x−μ)·c computed as x·c − μ·c so no per-row vector subtract exists.
  *
  * k-means-free but float-fitted ⇒ rows-only entry (V4b's argument): the
  * spec pins orthonormality, variance ordering, the planted-direction
  * recovery, and projected-variance ≡ eigenvalue identities.
  */
object VecPca {

  /** Cyclic Jacobi eigensolver for a symmetric matrix (driver-side,
    * d ≤ a few hundred). Returns (eigenvalues, eigenvectors as rows),
    * sorted by eigenvalue descending; vector signs canonicalized so the
    * largest-magnitude entry is positive (eigenvector sign is arbitrary —
    * pinning it makes results reproducible). */
  private[graft] def jacobiEig(m0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val n = m0.length
    val a = m0.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    def offNorm: Double = {
      var s = 0.0
      var i = 0
      while (i < n) { var j = i + 1; while (j < n) { s += a(i)(j) * a(i)(j); j += 1 }; i += 1 }
      s
    }
    var sweep = 0
    while (sweep < 100 && offNorm > 1e-18) {
      var p = 0
      while (p < n) {
        var q = p + 1
        while (q < n) {
          if (math.abs(a(p)(q)) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            val t = math.signum(theta) match {
              case 0.0 => 1.0 / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
              case sg => sg / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < n) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < n) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val pairs = (0 until n).map { j =>
      val col = Array.tabulate(n)(i => v(i)(j))
      val mx = col.indices.maxBy(i => (math.abs(col(i)), -i))
      val canon = if (col(mx) < 0) col.map(-_) else col
      (a(j)(j), canon)
    }.sortBy { case (ev, vec) => (-ev, vec.headOption.getOrElse(0.0)) }
    (pairs.map(_._1).toArray, pairs.map(_._2).toArray)
  }

  /** One-pass mean + covariance: per-partition accumulators collected and
    * merged in partition order (deterministic float sums for a fixed
    * corpus layout); sample covariance (n−1). Driver state = #partitions
    * × (d + d(d+1)/2) doubles — bounded. */
  private[graft] def covarianceOf(e: DataFrame): (Long, Array[Double], Array[Array[Double]]) = {
    val sess = e.sparkSession
    import sess.implicits._
    val partials = e.select($"v").as[Seq[Double]].mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val first = it.next().toArray
        val d = first.length
        var n = 1L
        val s = first.clone()
        val o = new Array[Double](d * (d + 1) / 2)
        def addOuter(x: Array[Double]): Unit = {
          var idx = 0
          var i = 0
          while (i < d) {
            var j = i
            while (j < d) { o(idx) += x(i) * x(j); idx += 1; j += 1 }
            i += 1
          }
        }
        addOuter(first)
        while (it.hasNext) {
          val x = it.next().toArray
          n += 1
          var i = 0
          while (i < d) { s(i) += x(i); i += 1 }
          addOuter(x)
        }
        Iterator.single((pid, n, s.toSeq, o.toSeq))
      }
    }.collect().sortBy(_._1)
    require(partials.nonEmpty, "empty embedding store")
    val d = partials.head._3.length
    var n = 0L
    val s = new Array[Double](d)
    val o = new Array[Double](d * (d + 1) / 2)
    partials.foreach { case (_, pn, ps, po) =>
      n += pn
      var i = 0
      while (i < d) { s(i) += ps(i); i += 1 }
      i = 0
      while (i < o.length) { o(i) += po(i); i += 1 }
    }
    val mean = s.map(_ / n)
    val cov = Array.ofDim[Double](d, d)
    var idx = 0
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val c = (o(idx) - n * mean(i) * mean(j)) / (n - 1).toDouble
        cov(i)(j) = c; cov(j)(i) = c
        idx += 1; j += 1
      }
      i += 1
    }
    (n, mean, cov)
  }

  /** Fit on the store: top-m (eigenvalue, component) pairs + the mean. */
  private[graft] def fit(e: DataFrame, m: Int): (Array[Double], Array[Array[Double]], Array[Double]) = {
    val (_, mean, cov) = covarianceOf(e)
    val (evals, evecs) = jacobiEig(cov)
    (evals.take(m), evecs.take(m), mean)
  }

  // V15 — project every vector onto the top-m principal components.
  def pcaProject(s: SparkSession, dir: String, m: Int = 8): DataFrame =
    pcaProjectOn(VectorOps.normed(s, dir), m)

  /** V15 core on any (vec_id, v) frame (fixture-testable). */
  private[graft] def pcaProjectOn(e: DataFrame, m: Int): DataFrame = {
    val sess = e.sparkSession
    import sess.implicits._
    val (_, comps, mean) = fit(e, m)
    val cols = comps.zipWithIndex.map { case (c, j) =>
      val meanDot = mean.zip(c).map { case (a, b) => a * b }.sum
      (vecDot($"v", typedlit(c.toSeq)) - lit(meanDot)).as(s"pc$j")
    }
    e.select(($"vec_id" +: cols.toSeq): _*).orderBy($"vec_id")
  }
}
