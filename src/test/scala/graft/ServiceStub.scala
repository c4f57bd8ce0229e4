package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** In-process line-protocol inference stub for the external-service
  * operator tests ([[graft.pipeline.HttpInference]]): answers requests
  * via `respond` with programmable fault injection and concurrency
  * accounting.
  *
  *  - `failFirstN`: the first N requests (globally) answer HTTP 500 —
  *    exercises the retry ladder recovering a transient outage;
  *  - `poisonMarker`: any request whose body contains the marker always
  *    answers 500 — exercises retry exhaustion → failed-status rows;
  *  - `badMarker`: answers 404 — exercises the non-retriable path
  *    (exactly one attempt, still a failed-status row);
  *  - `slowMarker`/`slowMs`: any request whose body contains the marker
  *    sleeps before answering — exercises request timeouts and (with a
  *    marker matching every request) in-flight pipelining.
  */
final class ServiceStub(respond: Seq[String] => Seq[String],
                        failFirstN: Int = 0,
                        poisonMarker: Option[String] = None,
                        badMarker: Option[String] = None,
                        slowMarker: Option[String] = None,
                        slowMs: Long = 0L) extends AutoCloseable {
  val requests = new AtomicInteger(0)
  private val concurrent = new AtomicInteger(0)
  val maxConcurrent = new AtomicInteger(0)

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
  server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(16))
  server.createContext("/infer", (exchange: HttpExchange) => {
    val n = requests.incrementAndGet()
    val c = concurrent.incrementAndGet()
    maxConcurrent.updateAndGet(m => math.max(m, c))
    try {
      val body = new String(exchange.getRequestBody.readAllBytes(), UTF_8)
      if (slowMs > 0 && slowMarker.exists(body.contains)) Thread.sleep(slowMs)
      if (badMarker.exists(body.contains)) {
        exchange.sendResponseHeaders(404, -1) // non-retriable
        exchange.close()
      } else if (n <= failFirstN || poisonMarker.exists(body.contains)) {
        exchange.sendResponseHeaders(500, -1)
        exchange.close()
      } else {
        val lines = body.split("\n", -1).toSeq.filter(_.nonEmpty)
        val out = respond(lines).mkString("\n").getBytes(UTF_8)
        exchange.sendResponseHeaders(200, if (out.isEmpty) -1 else out.length.toLong)
        if (out.nonEmpty) exchange.getResponseBody.write(out)
        exchange.close()
      }
    } finally concurrent.decrementAndGet()
  })
  server.start()

  def endpoint: String = s"http://127.0.0.1:${server.getAddress.getPort}/infer"
  def close(): Unit = server.stop(0)
}

object ServiceStub {
  /** Diarize service: echo identity fields, label from the slice peak —
    * the SAME formula as the local mock path in
    * [[graft.pipeline.SpeechPipeline.diarizeStage]], so service and mock
    * paths must agree exactly.
    */
  val diarize: Seq[String] => Seq[String] = _.map { line =>
    val f = line.split("\t", -1)
    val w = graft.pipeline.HttpInference.unb64(f(4))
    var peak = 0f
    var i = 0
    while (i < w.length) { if (math.abs(w(i)) > peak) peak = math.abs(w(i)); i += 1 }
    val label = if (peak > 0.5f) "speaker_0" else "speaker_1"
    s"${f(0)}\t${f(1)}\t${f(2)}\t$label"
  }

  /** Embedding service: runs [[graft.pipeline.MockModels.MockEmbedder]]
    * itself over the transmitted slice — both base64 legs are lossless,
    * so the service path must equal the local mock path float-for-float.
    */
  val embed: Seq[String] => Seq[String] = { lines =>
    val m = new graft.pipeline.MockModels.MockEmbedder()
    lines.map { line =>
      val f = line.split("\t", -1)
      val w = graft.pipeline.HttpInference.unb64(f(4))
      val seg = graft.model.SpeakerSegment(f(0), f(1).toDouble, f(2).toDouble, f(3))
      val (_, emb) = m.predictBatch(Seq((seg, w))).head
      s"${f(0)}\t${f(1)}\t${f(2)}\t${f(3)}\t${graft.pipeline.HttpInference.b64(emb)}"
    }
  }

  /** ASR service: [[graft.pipeline.Transcription.MockAsr]]'s formula over
    * the transmitted slice.
    */
  val asr: Seq[String] => Seq[String] = _.map { line =>
    val f = line.split("\t", -1)
    val w = graft.pipeline.HttpInference.unb64(f(5))
    val mean = if (w.isEmpty) 0d else w.map(x => math.abs(x.toDouble)).sum / w.length
    val nWords = math.max(1, (f(2).toDouble - f(1).toDouble).toInt)
    val word = if (mean > 0.5) "loud" else "soft"
    val lang = if (mean > 0.5) "en" else "xx"
    s"${f(0)}\t${f(1)}\t${f(2)}\t${f(3)}\t${Seq.fill(nWords)(word).mkString(" ")}\t$lang"
  }
}
