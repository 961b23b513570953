package graft.fit

/** Small Levenberg–Marquardt least-squares fitter with numeric Jacobian and
  * box bounds — the scipy `curve_fit` replacement for the moderator
  * monitor-peak fit (F7, reference
  * `warehouses/.../moderator_performance/fit_monitor.py:72-175`). Pure Scala,
  * no Spark types: runs inside `Dataset.map` tasks.
  */
object GaussNewton {

  final case class FitResult(params: Array[Double], errors: Array[Double],
                             iterations: Int, converged: Boolean)

  /** Minimize sum((f(x_i, p) - y_i)^2) over p with LM damping.
    *
    * @param f model value at (x, params)
    * @param lower/upper box bounds (params clamped after each step, like
    *   scipy's trf handling of the reference's bounds
    *   `moderator_performance.py:43-60`)
    * @param maxIter reference maxfev=1000 (`fit_monitor.py:84-86`)
    */
  def fit(xs: Array[Double], ys: Array[Double], p0: Array[Double],
          lower: Array[Double], upper: Array[Double],
          f: (Double, Array[Double]) => Double,
          maxIter: Int = 1000, tol: Double = 1e-10): FitResult = {
    val n = xs.length
    val k = p0.length
    var p = p0.clone()
    var lambda = 1e-3
    var prevSse = sse(xs, ys, p, f)
    var iter = 0
    var converged = false

    while (iter < maxIter && !converged) {
      val jac = jacobian(xs, p, f)
      val r = residuals(xs, ys, p, f)
      // JtJ + lambda*diag(JtJ), Jtr
      val jtj = Array.ofDim[Double](k, k)
      val jtr = new Array[Double](k)
      var i = 0
      while (i < n) {
        var a = 0
        while (a < k) {
          jtr(a) += jac(i)(a) * r(i)
          var b = 0
          while (b < k) { jtj(a)(b) += jac(i)(a) * jac(i)(b); b += 1 }
          a += 1
        }
        i += 1
      }
      val damped = Array.tabulate(k, k)((a, b) =>
        if (a == b) jtj(a)(b) * (1 + lambda) else jtj(a)(b))
      val step = solve(damped, jtr)
      val candidate = Array.tabulate(k)(a =>
        math.min(upper(a), math.max(lower(a), p(a) - step(a))))
      val newSse = sse(xs, ys, candidate, f)
      if (newSse < prevSse) {
        converged = math.abs(prevSse - newSse) <= tol * math.max(prevSse, 1e-30)
        p = candidate
        prevSse = newSse
        lambda = math.max(lambda / 3, 1e-12)
      } else {
        lambda = math.min(lambda * 3, 1e12)
        if (lambda >= 1e12) converged = true // stuck: accept current p
      }
      iter += 1
    }

    // covariance = (JtJ)^-1 * s^2, s^2 = SSE/(n-k); errors = sqrt(diag)
    // (`fit_monitor.py:161-166`)
    val jac = jacobian(xs, p, f)
    val jtj = Array.ofDim[Double](k, k)
    var i = 0
    while (i < n) {
      var a = 0
      while (a < k) {
        var b = 0
        while (b < k) { jtj(a)(b) += jac(i)(a) * jac(i)(b); b += 1 }
        a += 1
      }
      i += 1
    }
    val s2 = if (n > k) prevSse / (n - k) else Double.NaN
    val errors =
      try {
        val inv = invert(jtj)
        Array.tabulate(k)(a => math.sqrt(math.max(0, inv(a)(a) * s2)))
      } catch { case _: Exception => Array.fill(k)(Double.NaN) }
    FitResult(p, errors, iter, converged)
  }

  /** Gaussian + fixed flat background, the reference's model
    * (`fit_monitor.py:72-81`): a*exp(-(x-mu)^2/(2 sigma^2)) + bg. */
  def gaussianFlatBg(bg: Double)(x: Double, p: Array[Double]): Double = {
    val d = (x - p(1)) / p(2)
    p(0) * math.exp(-0.5 * d * d) + bg
  }

  private def residuals(xs: Array[Double], ys: Array[Double], p: Array[Double],
                        f: (Double, Array[Double]) => Double): Array[Double] =
    Array.tabulate(xs.length)(i => f(xs(i), p) - ys(i))

  private def sse(xs: Array[Double], ys: Array[Double], p: Array[Double],
                  f: (Double, Array[Double]) => Double): Double = {
    val r = residuals(xs, ys, p, f)
    var s = 0.0
    var i = 0
    while (i < r.length) { s += r(i) * r(i); i += 1 }
    s
  }

  private def jacobian(xs: Array[Double], p: Array[Double],
                       f: (Double, Array[Double]) => Double): Array[Array[Double]] = {
    val k = p.length
    Array.tabulate(xs.length) { i =>
      Array.tabulate(k) { a =>
        val h = math.max(1e-8, math.abs(p(a)) * 1e-7)
        val pp = p.clone(); pp(a) += h
        val pm = p.clone(); pm(a) -= h
        (f(xs(i), pp) - f(xs(i), pm)) / (2 * h)
      }
    }
  }

  /** Gaussian elimination with partial pivoting. */
  private def solve(mIn: Array[Array[Double]], bIn: Array[Double]): Array[Double] = {
    val k = bIn.length
    val m = mIn.map(_.clone())
    val b = bIn.clone()
    var col = 0
    while (col < k) {
      var piv = col
      var r = col + 1
      while (r < k) { if (math.abs(m(r)(col)) > math.abs(m(piv)(col))) piv = r; r += 1 }
      val tmp = m(col); m(col) = m(piv); m(piv) = tmp
      val tb = b(col); b(col) = b(piv); b(piv) = tb
      val d = m(col)(col)
      if (math.abs(d) < 1e-300) throw new ArithmeticException("singular")
      r = col + 1
      while (r < k) {
        val factor = m(r)(col) / d
        var c = col
        while (c < k) { m(r)(c) -= factor * m(col)(c); c += 1 }
        b(r) -= factor * b(col)
        r += 1
      }
      col += 1
    }
    val x = new Array[Double](k)
    var row = k - 1
    while (row >= 0) {
      var s = b(row)
      var c = row + 1
      while (c < k) { s -= m(row)(c) * x(c); c += 1 }
      x(row) = s / m(row)(row)
      row -= 1
    }
    x
  }

  private def invert(m: Array[Array[Double]]): Array[Array[Double]] = {
    val k = m.length
    Array.tabulate(k) { col =>
      val e = new Array[Double](k); e(col) = 1.0
      solve(m, e)
    }.transpose
  }
}
