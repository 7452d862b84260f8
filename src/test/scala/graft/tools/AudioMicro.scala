package graft.tools
import graft.operators.Audio

/** Dev micro-benchmark (no Spark): where does the audio pipeline's
  * per-clip time go — payload ENCODE (AudioSystem.write), container
  * open (AudioSystem.getAudioInputStream SPI lookup), stream DECODE,
  * or the sample fold?
  */
object AudioMicro {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(20000)
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s  (${(System.nanoTime() - t0) / 1e3 / n}%6.1f us/clip)")
      r
    }
    // warmup
    (0 until 2000).foreach(i => Audio.decode(i, Audio.wavPayload(i)))
    val payloads = time("encode (wavPayload)")(
      (0 until n).map(i => Audio.wavPayload(i.toLong)).toArray)
    time("decode (full)")(payloads.zipWithIndex.foreach { case (p, i) =>
      Audio.decode(i.toLong, p) })
    time("open only (SPI+header)") {
      payloads.foreach { p =>
        val in = javax.sound.sampled.AudioSystem
          .getAudioInputStream(new java.io.ByteArrayInputStream(p))
        in.close()
      }
    }
    time("readAllBytes after open") {
      payloads.foreach { p =>
        val in = javax.sound.sampled.AudioSystem
          .getAudioInputStream(new java.io.ByteArrayInputStream(p))
        in.readAllBytes(); in.close()
      }
    }
    // contention probe: the same decode work fanned over 32 threads —
    // linear scaling means the codec path is lock-free; a flat wall
    // time means AudioSystem serializes concurrent callers
    def mt(name: String)(work: Int => Unit): Unit = {
      val t0 = System.nanoTime()
      val ts = (0 until 32).map { t =>
        val th = new Thread(() => work(t)); th.start(); th
      }
      ts.foreach(_.join())
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s wall (32 threads x $n clips)")
    }
    mt("decode x32 threads") { t =>
      payloads.foreach(p => Audio.decodeAudio(p)) }
    mt("encode x32 threads") { t =>
      (0 until n).foreach(i => Audio.wavPayload((t * n + i).toLong)) }
  }
}
