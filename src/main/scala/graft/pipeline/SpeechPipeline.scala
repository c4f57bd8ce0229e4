package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model._
import graft.ops.SegmentAlgebra

/** The reference's five-stage pipeline (§3 traces) as composed Dataset
  * transformations in ONE logical plan — the process/env hops of
  * `data_pipeline.sh` disappear; each stage is a transformation keyed by
  * `file`, so the whole chain shuffles once per stage boundary at most
  * and scales horizontally across files.
  *
  * Stage map (reference → here):
  *  1. VAD (`vad_multi.py`)                 → [[vadStage]]
  *  2. separation filter (`separation_filter.py`) → [[separationEconomyMerge]] + mock separate
  *  3. diarization (`diarization.py`)       → [[diarizeStage]] (mock) + sweep line
  *  4. speaker rematch (`speaker_rematch.py`) → [[rematchStage]]
  *  5. host match (`host_rematch.py`)       → [[hostMatchStage]]
  */
object SpeechPipeline {

  /** The whole reference pipeline (stages 1-5) as one composed run under
    * a single config (the `data_pipeline.sh` orchestration without its
    * process/env hops): returns the per-host match rollup.
    */
  def runAll(spark: SparkSession, audio: Dataset[AudioFile],
             hostPrints: Map[String, Array[Float]],
             cfg: PipelineConfig = PipelineConfig.production) = {
    val vad = vadStage(audio, cfg.vadPadSec)
    val (single, _) = diarizeStage(vad, audio)
    val (merged, embTable) = rematchStage(single, audio,
      minChunkSec = math.min(cfg.rematchChunkMinSec, 0.2),
      mergedCapSec = cfg.rematchMergedCapSec,
      minClusterRatio = cfg.clusterSizeRatio,
      clusterSimThreshold = cfg.clusterSimThreshold,
      softRescueThreshold = cfg.softRescueThreshold)
    hostMatchStage(spark, merged, embTable, hostPrints, cfg.hostBudgetSec)
  }

  /** Stage 1 — VAD: mock inference, pad+clamp (P1, `vad_multi.py:33-35`),
    * zero-gap merge (W1 with interval=0, cap=∞ — `vad_multi.py:37`).
    */
  def vadStage(audio: Dataset[AudioFile], padSec: Double = 0.1): Dataset[Segment] =
    vadStageWith(audio, "mock_vad", () => new MockModels.MockVad(), padSec)

  /** M1 — the VAD stage over the ONNX Silero operator ([[Onnx
    * .OnnxSileroVad]]): the same pad+clamp and zero-gap merge as
    * [[vadStage]], with the model injected via a [[Onnx
    * .SessionProvider]] — a real runtime jar OR a recorded-fixture
    * session drops in with zero pipeline change (PipelineSpec replays
    * a full-file pass bit-exactly against recorded fixtures).
    */
  def vadStageOnnx(audio: Dataset[AudioFile], provider: Onnx.SessionProvider,
                   padSec: Double = 0.1): Dataset[Segment] =
    vadStageWith(audio, s"onnx_vad:${provider.name}",
      () => new Onnx.OnnxSileroVad(provider), padSec)

  /** Shared VAD stage body over any segment-emitting batch model. */
  def vadStageWith(audio: Dataset[AudioFile], modelName: String,
      load: () => BatchModel[AudioFile, Seq[Segment]],
      padSec: Double): Dataset[Segment] = {
    import audio.sparkSession.implicits._
    val durations = audio.map(a => (a.file, a.waveform.length.toDouble / a.sr))
      .toDF("file", "dur")
    val raw = InferenceOp.flatMapBatched[AudioFile, Segment](
      audio, modelName, load, batchSize = 4)
    val padded = raw.toDF("file", "start", "end")
      .join(broadcast(durations), "file")
      .select(col("file"),
        greatest(col("start") - lit(padSec), lit(0d)).as("start"),
        least(col("end") + lit(padSec), col("dur")).as("end"))
      .as[Segment]
    SegmentAlgebra.sessionizeCapped(padded, gap = 0d, maxDuration = Double.MaxValue)
      .map(m => Segment(m.file, m.start, m.end))
  }

  /** Stage 2a — separation-economy merge (X3, `separation_filter.py:167-188`):
    * coalesce VAD spans into ≤`maxDur` chunks, skipping gaps > `gap`, so
    * the expensive model runs once per chunk, not per span.
    */
  def separationEconomyMerge(vad: Dataset[Segment], gap: Double = 5d,
                             maxDur: Double = 60d): Dataset[MergedSegment] =
    SegmentAlgebra.sessionizeCapped(vad, gap, maxDur)

  /** Stage 2b — assign each VAD span to the separation chunk containing
    * it (J1, `separation_filter.py:221-236`), via the custom sorted-merge
    * operator (String file keys, times scaled to exact integer micros for
    * its LongType bound contract). Output: one row per span with its
    * chunk's bounds.
    */
  def assignToChunks(vad: Dataset[Segment], chunks: Dataset[MergedSegment]): DataFrame = {
    val segs = vad.toDF()
      .select(col("file"),
        round(col("start") * 1e6d).cast("long").as("s_us"),
        round(col("end") * 1e6d).cast("long").as("e_us"))
    val ch = chunks.toDF()
      .select(col("file").as("c_file"),
        round(col("start") * 1e6d).cast("long").as("chunk_s_us"),
        round(col("end") * 1e6d).cast("long").as("chunk_e_us"))
    graft.plans.ContainmentJoin.sortedContainmentJoin(
        segs, ch, "file", "c_file", "s_us", "e_us", "chunk_s_us", "chunk_e_us")
      .select(col("file"),
        (col("s_us").cast("double") / 1e6d).as("start"),
        (col("e_us").cast("double") / 1e6d).as("end"),
        (col("chunk_s_us").cast("double") / 1e6d).as("chunk_start"),
        (col("chunk_e_us").cast("double") / 1e6d).as("chunk_end"))
  }

  /** W5 — overlapped chunking with margins (`separate_fast.py:148-186`):
    * split each waveform into fixed-size core chunks plus `margin`
    * samples each side; bounded per-task memory for hour-long audio (X6).
    */
  def chunkWithMargins(audio: Dataset[AudioFile], chunkSamples: Int,
                       marginSamples: Int): Dataset[AudioChunk] = {
    import audio.sparkSession.implicits._
    audio.flatMap { a =>
      val n = a.waveform.length
      val nChunks = math.max(1, (n + chunkSamples - 1) / chunkSamples)
      (0 until nChunks).iterator.map { ci =>
        val coreStart = ci * chunkSamples
        val coreLen = math.min(chunkSamples, n - coreStart)
        val lo = math.max(0, coreStart - marginSamples)
        val hi = math.min(n, coreStart + coreLen + marginSamples)
        AudioChunk(a.file, a.sr, ci, coreStart, coreLen,
          a.waveform.slice(lo, hi))
      }
    }
  }

  /** W5 reassembly — strip margins, order by chunk index, flatten
    * (`separate_fast.py:236-241` margin strip + order-preserving concat).
    */
  def reassemble(chunks: Dataset[AudioChunk], marginSamples: Int): Dataset[AudioFile] = {
    import chunks.sparkSession.implicits._
    chunks.map { c =>
      val lo = c.coreStart - math.max(0, c.coreStart - marginSamples)
      (c.file, c.sr, c.chunkIdx, c.samples.slice(lo, lo + c.coreLen))
    }.groupByKey(t => (t._1, t._2))
      .mapGroups { (key, it) =>
        val parts = it.toArray.sortBy(_._3)
        AudioFile(key._1, key._2, parts.flatMap(_._4))
      }
  }

  /** W5 — STFT inference framing (`separate_fast.py:208-221`): the exact
    * window arithmetic the reference feeds its spectral model. With
    * `trim = nFft/2` and `gen = chunkSize − 2·trim`,
    *
    *   pad    = gen − n mod gen   (a FULL extra gen when n mod gen == 0 —
    *                               the reference's modulo quirk, kept)
    *   padded = [0]×trim ++ w ++ [0]×pad ++ [0]×trim
    *   frames = padded[i, i+chunkSize) for i = 0, gen, …  while i < n+pad
    *
    * — exactly (n+pad)/gen frames of chunkSize samples each, adjacent
    * frames overlapping by 2·trim. Emitted via flatMap so per-task state
    * is one frame, never the padded waveform × frame count.
    */
  def stftFrames(audio: Dataset[AudioFile], chunkSize: Int, nFft: Int)
      : Dataset[StftFrame] = {
    import audio.sparkSession.implicits._
    val trim = nFft / 2
    val gen = chunkSize - 2 * trim
    require(gen > 0, s"chunkSize $chunkSize must exceed nFft $nFft")
    audio.flatMap { a =>
      val n = a.waveform.length
      val pad = gen - n % gen
      val nFrames = (n + pad) / gen
      (0 until nFrames).iterator.map { fi =>
        val out = new Array[Float](chunkSize)
        // padded index p maps to waveform index p − trim when in range
        val pStart = fi * gen
        var j = 0
        while (j < chunkSize) {
          val src = pStart + j - trim
          if (src >= 0 && src < n) out(j) = a.waveform(src)
          j += 1
        }
        StftFrame(a.file, a.sr, fi, n, pad, out)
      }
    }
  }

  /** W5 — STFT frame reassembly (`separate_fast.py:236-241`): per frame
    * keep `[trim, chunkSize − trim)` (the generated core), concatenate in
    * frame order, drop the trailing `pad` — the exact inverse of
    * [[stftFrames]], so frame ⊕ reassemble is the identity for every
    * length (property-tested in PipelineSpec).
    */
  def stftReassemble(frames: Dataset[StftFrame], chunkSize: Int, nFft: Int)
      : Dataset[AudioFile] = {
    import frames.sparkSession.implicits._
    val trim = nFft / 2
    val gen = chunkSize - 2 * trim
    frames.map(f => (f.file, f.sr, f.frameIdx, f.nSample,
        f.samples.slice(trim, chunkSize - trim)))
      .groupByKey(t => (t._1, t._2))
      .mapGroups { (key, it) =>
        val parts = it.toArray.sortBy(_._3)
        val n = parts.head._4
        val out = new Array[Float](n)
        parts.foreach { case (_, _, fi, _, core) =>
          val at = fi * gen
          val len = math.min(gen, n - at)
          if (len > 0) System.arraycopy(core, 0, out, at, len)
        }
        AudioFile(key._1, key._2, out)
      }
  }

  /** Stage 2c — separation through the REAL W5 window algebra, nested
    * exactly like the reference: margin chunking ([[chunkWithMargins]],
    * `separate_fast.py:148-186`) → per-chunk STFT framing
    * ([[stftFrames]], `:208-221`) → the per-frame model kernel (mock
    * here; an [[Onnx]] session at production) → frame reassembly with
    * trim/unpad ([[stftReassemble]], `:236-241`) → margin-strip
    * order-preserving concat ([[reassemble]]) → the F9 residual
    * `nonvocal = mixture − vocal` (`separation_filter.py:117`). Chunk
    * identity rides an encoded file key through the frame algebra so
    * every level stays a plain Dataset op. A linear per-sample kernel
    * commutes with all of it — the PipelineSpec test asserts the
    * composition equals the kernel applied directly, which is the
    * transparency the reference's trim/pad arithmetic promises.
    */
  def separateStage(audio: Dataset[AudioFile], chunkSamples: Int = 4096,
                    marginSamples: Int = 512, chunkSize: Int = 1024,
                    nFft: Int = 512): (Dataset[AudioFile], Dataset[AudioFile]) = {
    import audio.sparkSession.implicits._
    val chunks = chunkWithMargins(audio, chunkSamples, marginSamples)
    val asFiles = chunks.map(c => AudioFile(
      s"${c.file}\u0000${c.chunkIdx}\u0000${c.coreStart}\u0000${c.coreLen}",
      c.sr, c.samples))
    val frames = stftFrames(asFiles, chunkSize, nFft)
    val sep = InferenceOp.mapBatched[StftFrame, StftFrame](
      frames, "mock_frame_separator",
      () => new MockModels.MockFrameSeparator(), batchSize = 8)
    val vocalChunks = stftReassemble(sep, chunkSize, nFft).map { a =>
      val parts = a.file.split('\u0000')
      AudioChunk(parts(0), a.sr, parts(1).toInt, parts(2).toInt,
        parts(3).toInt, a.waveform)
    }
    val vocal = reassemble(vocalChunks, marginSamples)
    val mixDf = audio.map(a => (a.file, a.sr, a.waveform)).toDF("file", "sr", "mix")
    val vocDf = vocal.map(a => (a.file, a.waveform)).toDF("file", "voc")
    val nonvocal = mixDf.join(vocDf, "file")
      .as[(String, Int, Array[Float], Array[Float])]
      .map { case (f, sr, m, v) =>
        AudioFile(f, sr, Array.tabulate(m.length)(i => m(i) - v(i))) }
    (vocal, nonvocal)
  }

  /** Stage 3 — mock diarization: assign a speaker per VAD span from its
    * dominant amplitude band, then resolve overlaps with the sweep line
    * (J8) and split single vs overlapping (U3, `diarization.py:61-63`).
    */
  def diarizeStage(vad: Dataset[Segment], audio: Dataset[AudioFile])
      : (Dataset[ActiveInterval], Dataset[ActiveInterval]) = {
    import vad.sparkSession.implicits._
    val waves = audio.map(a => (a.file, a.sr, a.waveform))
      .toDF("file", "sr", "waveform")
    val spk = vad.toDF("file", "start", "end").join(waves, "file")
      .as[(String, Double, Double, Int, Array[Float])]
      .map { case (file, s, e, sr, w) =>
        val lo = math.max(0, (s * sr).toInt)
        val hi = math.min(w.length, (e * sr).toInt)
        var peak = 0f
        var i = lo
        while (i < hi) { if (math.abs(w(i)) > peak) peak = math.abs(w(i)); i += 1 }
        val label = if (peak > 0.5f) "speaker_0" else "speaker_1"
        SpeakerSegment(file, s, e, label)
      }
    val active = SegmentAlgebra.sweepLineActiveSets(spk)
    (active.filter(a => a.speakers.length == 1),
      active.filter(a => a.speakers.length > 1))
  }

  /** One diarization answer from the external service, with the S10
    * status/error pair ([[graft.model.DecodedAudio]] convention).
    */
  final case class ServiceSpeakerRow(file: String, start: Double, end: Double,
      speaker: String, status: String, error: String)

  /** Stage 3, EXTERNAL-SERVICE variant (SURVEY §7.4.4 — Sortformer has
    * no JVM runtime): the same relational shell as [[diarizeStage]] with
    * the per-span speaker label fetched from a batch HTTP service via
    * [[HttpInference.mapService]]. Wire protocol: request lines
    * `file TAB start TAB end TAB sr TAB base64(f32le waveform)`, response
    * lines echoing `file TAB start TAB end TAB speaker` one per input.
    * Spans the service cannot label after retries become
    * `status="failed"` rows routed OUT of the sweep line (returned third)
    * — fault isolation, never job death.
    */
  def diarizeStageService(vad: Dataset[Segment], audio: Dataset[AudioFile],
                          cfg: HttpServiceConfig)
      : (Dataset[ActiveInterval], Dataset[ActiveInterval], Dataset[ServiceSpeakerRow]) = {
    import vad.sparkSession.implicits._
    val waves = audio.map(a => (a.file, a.sr, a.waveform))
      .toDF("file", "sr", "waveform")
    val withWave = vad.toDF("file", "start", "end").join(waves, "file")
      .as[(String, Double, Double, Int, Array[Float])]
      .map { case (file, s, e, sr, w) =>
        val slice = w.slice(math.max(0, (s * sr).toInt), math.min(w.length, (e * sr).toInt))
        (file, s, e, sr, slice)
      }
    // NB: Charset is not Serializable — name it inside each closure
    val rows = HttpInference.mapService[(String, Double, Double, Int, Array[Float]), ServiceSpeakerRow](
      withWave, cfg,
      encode = xs => xs.map { case (f, s, e, sr, w) =>
        s"$f\t$s\t$e\t$sr\t${HttpInference.b64(w)}"
      }.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8),
      decode = bytes => new String(bytes, java.nio.charset.StandardCharsets.UTF_8).split("\n", -1).toSeq
        .filter(_.nonEmpty).map { line =>
          val f = line.split("\t", -1)
          ServiceSpeakerRow(f(0), f(1).toDouble, f(2).toDouble, f(3), "completed", "")
        },
      onFailure = (x, e) => ServiceSpeakerRow(x._1, x._2, x._3, "failed",
        "failed", s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage)}"))
      .cache() // one service pass feeds both the ok and failed splits
    val ok = rows.filter(_.status == "completed")
      .map(r => SpeakerSegment(r.file, r.start, r.end, r.speaker))
    val failed = rows.filter(_.status == "failed")
    val active = SegmentAlgebra.sweepLineActiveSets(ok)
    (active.filter(a => a.speakers.length == 1),
      active.filter(a => a.speakers.length > 1), failed)
  }

  /** Stage 4 — speaker rematch (`speaker_rematch.py`): W2 speaker-change
    * merge, P4/P5 duration filters, mock embeddings, then the M5 global
    * re-clustering ([[Clustering.clusterOne]] per file, the UMAP→HDBSCAN
    * substitute with the A12 floor and the ≥ 0.2 soft rescue) that
    * assigns every chunk its GLOBAL speaker label — noise chunks keep the
    * reference's −1 posture as label "noise".
    *
    * Returns (globally-relabeled chunks, embedding table keyed by the
    * global labels) — both feed [[hostMatchStage]]; the relabeled chunks
    * also feed [[assignGlobalSpeakerIds]] for the J5 remap trace.
    */
  def rematchStage(single: Dataset[ActiveInterval], audio: Dataset[AudioFile],
                   minChunkSec: Double = 0.2, mergedCapSec: Double = 20d,
                   minClusterRatio: Double = 0.04,
                   clusterSimThreshold: Double = 0.75,
                   softRescueThreshold: Double = 0.2)
      : (Dataset[SpeakerSegment], Dataset[(String, String, Double, Array[Float])]) = {
    import single.sparkSession.implicits._
    val withWave = mergedWithWave(single, audio, minChunkSec, mergedCapSec)
    val embedded = InferenceOp.mapBatched[(SpeakerSegment, Array[Float]), (SpeakerSegment, Array[Float])](
      withWave, "mock_embedder", () => new MockModels.MockEmbedder(), batchSize = 16)
    clusterEmbedded(embedded, minClusterRatio, clusterSimThreshold, softRescueThreshold)
  }

  /** The speaker-change-merged chunk table joined to its waveform slice
    * — the shared front half of the M4 embedding stage (mock and
    * service variants).
    */
  private def mergedWithWave(single: Dataset[ActiveInterval], audio: Dataset[AudioFile],
                             minChunkSec: Double, mergedCapSec: Double)
      : Dataset[(SpeakerSegment, Array[Float])] = {
    import single.sparkSession.implicits._
    val spk = single.map(a => SpeakerSegment(a.file, a.start, a.end, a.speakers.head))
    val merged = SegmentAlgebra.sessionizeBySpeaker(spk,
      gap = 1d, maxDuration = mergedCapSec, minDuration = minChunkSec)
    val waves = audio.map(a => (a.file, a.sr, a.waveform)).toDF("file", "sr", "waveform")
    merged.toDF("file", "start", "end", "speaker").join(waves, "file")
      .as[(String, Double, Double, String, Int, Array[Float])]
      .map { case (file, s, e, spkr, sr, w) =>
        (SpeakerSegment(file, s, e, spkr),
          w.slice(math.max(0, (s * sr).toInt), math.min(w.length, (e * sr).toInt)))
      }
  }

  /** M5 over an embedded chunk table — the shared back half: cluster
    * each file's chunk embeddings (deterministic member order is part
    * of the kernel contract) and emit (relabeled chunks, embedding
    * table keyed by the global labels).
    */
  private def clusterEmbedded(embedded: Dataset[(SpeakerSegment, Array[Float])],
                              minClusterRatio: Double, clusterSimThreshold: Double,
                              softRescueThreshold: Double)
      : (Dataset[SpeakerSegment], Dataset[(String, String, Double, Array[Float])]) = {
    import embedded.sparkSession.implicits._
    val clustered = embedded.groupByKey(_._1.file).flatMapGroups {
      (file: String, it: Iterator[(SpeakerSegment, Array[Float])]) =>
        val rows = it.toArray.sortBy(t => (t._1.start, t._1.end, t._1.speaker))
        val labels = Clustering.clusterOne(rows.map(_._2).toIndexedSeq,
          minClusterRatio, clusterSimThreshold, softRescueThreshold)
        rows.iterator.zip(labels.iterator).map { case ((seg, emb), l) =>
          (SpeakerSegment(file, seg.start, seg.end, if (l < 0) "noise" else s"g$l"), emb)
        }
    }.cache()
    // eager: both returned outputs derive from it, and concurrent
    // consumers racing a cold cache would each run inference+clustering
    clustered.count()
    val relabeled = clustered.map(_._1)
    val embTable = clustered.map { case (seg, emb) =>
      (seg.file, seg.speaker, seg.end - seg.start, emb)
    }
    (relabeled, embTable)
  }

  /** One embedding answer from the external service, with the S10
    * status/error pair. `emb` is empty on the failed rows.
    */
  final case class ServiceEmbedRow(file: String, start: Double, end: Double,
      speaker: String, emb: Array[Float], status: String, error: String)

  /** Stage 4, EXTERNAL-SERVICE variant (SURVEY §7.4.4 — ECAPA has no
    * JVM runtime): [[rematchStage]] with the M4 chunk embedding fetched
    * from a batch HTTP service via [[HttpInference.mapService]], then
    * the SAME M5 clustering back half. Wire protocol: request lines
    * `file TAB start TAB end TAB speaker TAB base64(f32le waveform)`,
    * response lines echoing the identity fields with
    * `base64(f32le embedding)` in place of the waveform (both base64
    * legs are bit-lossless, so service ≡ mock exactly when the service
    * runs the mock formula). Chunks the service cannot embed after
    * retries become `status="failed"` rows returned third and EXCLUDED
    * from clustering — an unembedded chunk cannot cluster; it exits as
    * an S10 failure row, never job death and never a fabricated vector.
    */
  def rematchStageService(single: Dataset[ActiveInterval], audio: Dataset[AudioFile],
                          cfg: HttpServiceConfig,
                          minChunkSec: Double = 0.2, mergedCapSec: Double = 20d,
                          minClusterRatio: Double = 0.04,
                          clusterSimThreshold: Double = 0.75,
                          softRescueThreshold: Double = 0.2)
      : (Dataset[SpeakerSegment], Dataset[(String, String, Double, Array[Float])],
         Dataset[ServiceEmbedRow]) = {
    import single.sparkSession.implicits._
    val withWave = mergedWithWave(single, audio, minChunkSec, mergedCapSec)
    // NB: Charset is not Serializable — name it inside each closure
    val rows = HttpInference.mapService[(SpeakerSegment, Array[Float]), ServiceEmbedRow](
      withWave, cfg,
      encode = xs => xs.map { case (seg, w) =>
        s"${seg.file}\t${seg.start}\t${seg.end}\t${seg.speaker}\t${HttpInference.b64(w)}"
      }.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8),
      decode = bytes => new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
        .split("\n", -1).toSeq.filter(_.nonEmpty).map { line =>
          val f = line.split("\t", -1)
          ServiceEmbedRow(f(0), f(1).toDouble, f(2).toDouble, f(3),
            HttpInference.unb64(f(4)), "completed", "")
        },
      onFailure = (x, e) => ServiceEmbedRow(x._1.file, x._1.start, x._1.end,
        x._1.speaker, Array.emptyFloatArray, "failed",
        s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage)}"))
      .cache() // one service pass feeds both the ok and failed splits
    val ok = rows.filter(_.status == "completed")
      .map(r => (SpeakerSegment(r.file, r.start, r.end, r.speaker), r.emb))
    val failed = rows.filter(_.status == "failed")
    val (relabeled, embTable) = clusterEmbedded(
      ok, minClusterRatio, clusterSimThreshold, softRescueThreshold)
    (relabeled, embTable, failed)
  }

  /** Stage 4b — the local→global remap trace (A6+J3+J5,
    * `speaker_rematch.py:211-261`): longest segment per LOCAL speaker →
    * max-overlap argmax against the globally-labeled segments → mapping
    * table → relabel every original segment, dropping locals with no
    * mapping (the reference's `continue`). Returns (relabeled originals,
    * the `speaker_mapping` artifact).
    */
  def assignGlobalSpeakerIds(original: Dataset[SpeakerSegment],
                             global: Dataset[SpeakerSegment]): (DataFrame, DataFrame) = {
    val o = original.toDF()
    val g = global.toDF()
      .select(col("file"), col("start").as("g_start"), col("end").as("g_end"),
        col("speaker").as("g_speaker"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("file"), col("speaker"))
      .orderBy((col("end") - col("start")).desc, col("start"), col("end"))
    val longest = o.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    val mapping = graft.ops.SegmentOps.maxOverlapJoin(
        longest, g, "file", "speaker", "g_speaker",
        "start", "end", "g_start", "g_end")
      .select(col("l.file").as("file"), col("l.speaker").as("local_speaker"),
        col("r.g_speaker").as("global_speaker"))
    // no broadcast hint: the mapping scales with #files × #speakers, so
    // let AQE broadcast it only while it is actually small
    val relabeled = o
      .join(mapping,
        o("file") === mapping("file") && o("speaker") === mapping("local_speaker"))
      .select(o("file"), o("start"), o("end"),
        mapping("global_speaker").as("speaker"))
    (relabeled, mapping)
  }

  /** Stage 5 — host match: per-speaker duration rollup (A4), longest-first
    * 180 s budget (W6/O5), mock verification score (M6), threshold accept
    * (P8), per-host rollup with proportions (A10).
    */
  def hostMatchStage(spark: SparkSession, merged: Dataset[SpeakerSegment],
                     embTable: Dataset[(String, String, Double, Array[Float])],
                     hostPrints: Map[String, Array[Float]],
                     budgetSec: Double = 180d) = {
    import spark.implicits._
    // A4: duration totals are the FULL per-speaker durations...
    val perSpeaker = merged.groupByKey(s => (s.file, s.speaker))
      .mapGroups { (key, it) =>
        (key._1, key._2, it.map(s => s.end - s.start).sum)
      }.toDF("file", "speaker", "total_dur")
    // ...while W6/O5 budgets only the audio fed to verification: take
    // segments longest-first while the running total stays within
    // budget, reference break-at-first-overflow (host_rematch.py:100-109).
    val avgEmb = embTable.groupByKey(t => (t._1, t._2))
      .mapGroups { (key, it) =>
        val rows = it.toArray.sortBy(-_._3)
        val kept = scala.collection.mutable.ArrayBuffer.empty[Array[Float]]
        var cum = 0d
        var i = 0
        var overflowed = false
        while (i < rows.length && !overflowed) {
          cum += rows(i)._3
          if (cum <= budgetSec) kept += rows(i)._4 else overflowed = true
          i += 1
        }
        val embs = if (kept.nonEmpty) kept.toArray else Array(rows.head._4)
        val dim = embs.head.length
        val mean = new Array[Float](dim)
        embs.foreach(e => (0 until dim).foreach(j => mean(j) += e(j) / embs.length))
        (key._1, key._2, mean)
      }
    val hosts = spark.sparkContext.broadcast(hostPrints)
    val scored = avgEmb.flatMap { case (file, spkr, emb) =>
      hosts.value.iterator.map { case (hostId, print) =>
        val score = MockModels.cosine(emb, print)
        (file, hostId, spkr, score, score > 0.5)
      }
    }.toDF("file", "host_id", "speaker", "score", "prediction")
    val accepted = scored.filter(col("prediction") && col("score") > 0.5)
      .join(perSpeaker, Seq("file", "speaker"))
    val totals = perSpeaker.groupBy("file")
      .agg(sum("total_dur").as("file_total"))
    accepted.groupBy(col("file"), col("host_id"))
      .agg(sum(col("total_dur")).as("host_total_duration"),
        collect_list(struct(col("speaker"), col("score"))).as("matched_speakers"))
      .join(broadcast(totals), "file")
      .withColumn("host_proportion", col("host_total_duration") / col("file_total"))
      .select(col("file"), col("host_id"), col("host_total_duration"),
        col("host_proportion"), col("matched_speakers"))
  }
}
