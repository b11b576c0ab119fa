package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed training for the model-based quality filter — the FIT
  * side of tx14-style scoring (CCNet/fastText-family linear
  * classifiers are the standard corpus-quality models; scoring is
  * row-local column math, and so is training's inner loop).
  *
  * Full-batch logistic-regression gradient descent where each
  * iteration evaluates the CURRENT weights as plan literals over the
  * corpus (row-local sigmoid — no join, no UDF, stays inside
  * whole-stage codegen) and reduces to dim + 2 map-side-combined
  * scalar averages: one gradient component per feature, the bias
  * gradient, and the pre-update log-loss. Only the weight vector ever
  * reaches the driver — `iters` passes = `iters` jobs over the data,
  * the same broadcast-literal shape as [[graft.ann.IvfIndex.fit]]'s
  * Lloyd steps. At 100 TB each pass is one scan + one tiny aggregate;
  * nothing about the corpus is collected, shuffled, or amplified.
  *
  * Callers doing several iterations should persist `df` (the fit
  * scans it `iters` times).
  */
object Train {

  /** One GD step's outcome: post-update bias/weights, and the mean
    * log-loss measured at the weights the step STARTED from (so
    * `lossPre` of iter 1 is the all-zero model's ln 2, and a
    * decreasing sequence certifies descent without an extra pass).
    */
  final case class FitStep(iter: Int, bias: Double, weights: Seq[Double],
      lossPre: Double)

  /** Fit on numeric feature columns and a 0/1 `labelCol`; returns the
    * full (iter 1..iters) trajectory — pin it, don't just keep the
    * last step, so training is auditable and oracle-checkable.
    */
  def fitLogreg(df: DataFrame, featureCols: Seq[String], labelCol: String,
      iters: Int = 3, lr: Double = 1.0): Seq[FitStep] = {
    require(featureCols.nonEmpty && iters >= 1)
    var bias = 0.0
    var w = Array.fill(featureCols.length)(0.0)
    val steps = Seq.newBuilder[FitStep]
    for (t <- 1 to iters) {
      val z = featureCols.zip(w).foldLeft(lit(bias): Column) {
        case (acc, (f, wi)) => acc + col(f) * lit(wi)
      }
      val p = lit(1.0) / (lit(1.0) + exp(-z))
      val y = col(labelCol).cast("double")
      val err = p - y
      val gradAggs =
        avg(err).as("gb") +:
        avg(-(y * log(p) + (lit(1.0) - y) * log(lit(1.0) - p))).as("loss") +:
        featureCols.zipWithIndex.map { case (f, i) =>
          avg(err * col(f)).as(s"g$i")
        }
      val r = df.agg(gradAggs.head, gradAggs.tail: _*).head()
      bias -= lr * r.getDouble(0)
      w = w.zipWithIndex.map { case (wi, i) => wi - lr * r.getDouble(2 + i) }
      steps += FitStep(t, bias, w.toSeq, r.getDouble(1))
    }
    steps.result()
  }
}
