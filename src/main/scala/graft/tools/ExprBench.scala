package graft.tools

import org.apache.spark.unsafe.types.UTF8String

/** Microbenchmark for the native similarity expressions' static
  * compute kernels (what generated code calls per row) — isolates
  * per-call cost and 32-thread allocation/GC contention from plan
  * shape. */
object ExprBench {
  def main(args: Array[String]): Unit = {
    val a = UTF8String.fromString(
      "goldenrod lavender spring chocolate lace")
    val b = UTF8String.fromString(
      "goldenrod lavender spring chocolate lime")
    var i = 0; var acc = 0.0
    while (i < 200000) {
      acc += graft.expressions.JaroWinkler.compute(a, b); i += 1
    }
    val n = 2000000
    val t0 = System.nanoTime()
    i = 0
    while (i < n) {
      acc += graft.expressions.JaroWinkler.compute(a, b); i += 1
    }
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"jw single-thread: $n%d evals in $dt%.2fs = " +
      f"${dt / n * 1e9}%.0f ns/eval (acc=$acc%.1f)")
    val per = n / 4
    val t1 = System.nanoTime()
    val ts = (1 to 32).map { _ =>
      val t = new Thread(() => {
        var j = 0; var x = 0.0
        while (j < per) {
          x += graft.expressions.JaroWinkler.compute(a, b); j += 1
        }
        if (x == 1) print("")
      })
      t.start(); t
    }
    ts.foreach(_.join())
    val dt2 = (System.nanoTime() - t1) / 1e9
    println(f"jw 32 threads x $per%d evals: $dt2%.2fs wall = " +
      f"${dt2 / per * 1e9}%.0f ns/eval-lane")
  }
}
