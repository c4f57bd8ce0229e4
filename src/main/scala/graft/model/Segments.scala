package graft.model

/** Typed segment relations — the reference's inter-stage record shapes
  * (FIXTURES.md §A) as case classes with `Encoder`s. Times are seconds as
  * double relative to one source `file`, exactly the reference's
  * convention (SURVEY §1.3); `file` is the partition key everywhere.
  */
final case class Segment(file: String, start: Double, end: Double)

/** Segment carrying a type discriminator ("voice" | "silence"), the
  * input of the typed merge (`utils.py:147-152`).
  */
final case class TypedSegment(file: String, start: Double, end: Double, segType: String)

/** Merged session: span plus member count and accumulated types
  * (`utils.py:93-94`).
  */
final case class MergedSegment(file: String, start: Double, end: Double,
    n: Int, types: Seq[String])

/** Diarization-style per-speaker segment (`diarization.py:142`). */
final case class SpeakerSegment(file: String, start: Double, end: Double, speaker: String)

/** Sweep-line elementary interval with its active speaker set
  * (`diarization.py:146`).
  */
final case class ActiveInterval(file: String, start: Double, end: Double,
    speakers: Seq[String])

/** An audio file as waveform samples (mock decode; FIXTURES.md §A9). */
final case class AudioFile(file: String, sr: Int, waveform: Array[Float])

/** Decode result with the S10 per-record status (`vad_multi.py:48-54`
  * per-file try/except): `status` is "completed" or "failed"; failed rows
  * keep the file key and the error, so a run's tally and its retry set
  * are both one filter away.
  */
final case class DecodedAudio(file: String, sr: Int, waveform: Array[Float],
    status: String, error: String)

/** A chunk of a waveform with margins for overlapped inference (W5). */
final case class AudioChunk(file: String, sr: Int, chunkIdx: Int,
    coreStart: Int, coreLen: Int, samples: Array[Float])

/** One fixed-size STFT inference frame (W5 spectral framing): exactly
  * `chunkSize` samples, of which the central `chunkSize − 2·trim` are
  * "generated" output; `nSample`/`pad` carry the original length and the
  * tail zero-pad so reassembly is self-contained per file.
  */
final case class StftFrame(file: String, sr: Int, frameIdx: Int,
    nSample: Int, pad: Int, samples: Array[Float])
