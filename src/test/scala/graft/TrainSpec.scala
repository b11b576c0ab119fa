package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Train
import graft.tsdb.TsdbFixtures.spark

/** The distributed logreg fit must reproduce a sequential reference
  * implementation step for step (the aggregate is a pure sum — only
  * order differs), descend on its own loss, and recover the planted
  * sign structure of a separable rule.
  */
class TrainSpec extends AnyFunSuite {
  import spark.implicits._

  // deterministic, roughly separable on x1 with a weak x2 term
  private val rows: Seq[(Double, Double, Double)] =
    (0 until 200).map { i =>
      val x1 = (i % 17) / 17.0
      val x2 = (i % 7) / 7.0
      (x1, x2, if (x1 + 0.3 * x2 > 0.6) 1.0 else 0.0)
    }

  test("trajectory equals the sequential reference implementation") {
    val df = rows.toDF("x1", "x2", "y")
    val steps = Train.fitLogreg(df, Seq("x1", "x2"), "y", iters = 4, lr = 0.5)
    var b = 0.0
    var w = Array(0.0, 0.0)
    val n = rows.size
    for (t <- 1 to 4) {
      val p = rows.map { case (x1, x2, _) =>
        1.0 / (1.0 + math.exp(-(b + w(0) * x1 + w(1) * x2)))
      }
      val loss = rows.zip(p).map { case ((_, _, y), pi) =>
        -(y * math.log(pi) + (1 - y) * math.log(1 - pi))
      }.sum / n
      b -= 0.5 * rows.zip(p).map { case ((_, _, y), pi) => pi - y }.sum / n
      w = Array(
        w(0) - 0.5 * rows.zip(p).map { case ((x1, _, y), pi) => (pi - y) * x1 }.sum / n,
        w(1) - 0.5 * rows.zip(p).map { case ((_, x2, y), pi) => (pi - y) * x2 }.sum / n)
      val s = steps(t - 1)
      assert(s.iter == t)
      assert(math.abs(s.lossPre - loss) < 1e-9, s"iter $t loss")
      assert(math.abs(s.bias - b) < 1e-9, s"iter $t bias")
      assert(math.abs(s.weights(0) - w(0)) < 1e-9 &&
        math.abs(s.weights(1) - w(1)) < 1e-9, s"iter $t weights")
    }
  }

  test("loss descends and the planted signs are recovered") {
    val df = rows.toDF("x1", "x2", "y").persist()
    val steps = Train.fitLogreg(df, Seq("x1", "x2"), "y", iters = 8, lr = 1.0)
    df.unpersist(blocking = false)
    assert(steps.head.lossPre > steps.last.lossPre,
      s"no descent: ${steps.map(_.lossPre)}")
    assert(math.abs(steps.head.lossPre - math.log(2)) < 1e-12,
      "iter-1 lossPre must be the zero-model's ln 2")
    val fin = steps.last
    assert(fin.weights(0) > 0 && fin.weights(1) > 0 && fin.bias < 0,
      s"planted rule x1 + 0.3 x2 > 0.6 implies +,+,- got $fin")
  }
}
