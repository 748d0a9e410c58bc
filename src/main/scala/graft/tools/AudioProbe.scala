package graft.tools

import graft.multimodal.Multimodal.Decoder

/** Micro-probe behind the q332/q333 scaling exponent (measured 1.38/1.16
  * at the round-12 ScaleProbe — every other heavy is ≤0.7): times the
  * WAV encode+decode kernel single-threaded vs 32-threaded. If the
  * 32-thread run shows no speedup, the per-row cost is serialized inside
  * the JDK (AudioSystem's per-call provider lookup takes a classloader
  * lock), not compute-bound. sbt "runMain graft.tools.AudioProbe" */
object AudioProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(20000)
    def work(id: Long): Long = {
      val b = Decoder.encodeTestWav(id, 80)
      Decoder.decodeAudio(id, b).get.sum_sq
    }
    (0 until 2000).foreach(i => work(i.toLong)) // C2 warmup
    val pool = java.util.concurrent.Executors.newFixedThreadPool(32)
    def bench(label: String, f: Long => Long): Unit = {
      val t1 = System.nanoTime()
      var acc = 0L
      (0 until n).foreach(i => acc += f(i.toLong))
      val single = (System.nanoTime() - t1) / 1e9
      val t2 = System.nanoTime()
      val futs = (0 until n).map(i => pool.submit(
        new java.util.concurrent.Callable[Long] { def call(): Long = f(i.toLong) }))
      futs.foreach(_.get())
      val multi = (System.nanoTime() - t2) / 1e9
      println(f"[audio-probe] $label%-12s acc=$acc  1t: $single%5.2f s" +
        f" (${n / single}%8.0f/s)  32t: $multi%5.2f s (${n / multi}%8.0f/s)" +
        f"  speedup=${single / multi}%.1fx")
    }
    val canned = Decoder.encodeTestWav(7L, 80)
    bench("encode", id => Decoder.encodeTestWav(id, 80).length.toLong)
    bench("decode", _ => Decoder.decodeAudio(7L, canned).get.sum_sq)
    bench("enc+dec", work)
    pool.shutdown()
  }
}
