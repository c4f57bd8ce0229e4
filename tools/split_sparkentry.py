#!/usr/bin/env python3
"""One-shot refactor: split the 7.8k-line SparkEntry.scala query registry
into per-family QueriesXxx files + a QuerySupport helper object, keeping
SparkEntry as the thin driver-contract facade. Pure text moves — the
compile + Verify-dump-identity check is the proof."""
import re, sys

SRC = "/root/repo/src/main/scala/graft/SparkEntry.scala"
lines = open(SRC).read().split("\n")


def find(pred, start=0):
    for i in range(start, len(lines)):
        if pred(lines[i]):
            return i
    raise SystemExit(f"marker not found after {start}")


obj_open = find(lambda l: l == "object SparkEntry {")
entry_start = find(lambda l: l.startswith("  def entry(spark: SparkSession)"))
# entry() ends at the first "  }" after its start
entry_end = find(lambda l: l == "  }", entry_start)
regA = find(lambda l: l == "  private def registry: Seq[Q] = Seq(")
endA = find(lambda l: l == "  ) ++ textRegistry", regA)
regB = find(lambda l: l == "  private def textRegistry: Seq[Q] = Seq(", endA)
endB = find(lambda l: l == "  ) ++ kernelRegistry", regB)
regC = find(lambda l: l == "  private def kernelRegistry: Seq[Q] = Seq(", endB)
endC = find(lambda l: l == "  )", regC)
tail_q = find(lambda l: l.startswith("  def queries:"), endC)

# sanity: the three bodies hold exactly 215 Q entries
qpat = re.compile(r'^    Q\("([^"]+)",')


def chunks_of(body_lines):
    """Split a Seq body into per-entry chunks; comments/blanks directly
    above a Q line belong to that Q. A leading preamble (section banner
    before the first Q) sticks to the first chunk."""
    starts = [i for i, l in enumerate(body_lines) if qpat.match(l)]
    # walk each start back over its comment block
    adj = []
    for s in starts:
        j = s
        while j > 0 and (body_lines[j - 1].strip().startswith("//")
                         or body_lines[j - 1].strip() == ""):
            j -= 1
        adj.append(j)
    adj[0] = 0  # preamble -> first chunk
    out = []
    for k, a in enumerate(adj):
        b = adj[k + 1] if k + 1 < len(adj) else len(body_lines)
        name = qpat.match(body_lines[starts[k]]).group(1)
        out.append((name, body_lines[a:b]))
    return out


allchunks = (chunks_of(lines[regA + 1:endA])
             + chunks_of(lines[regB + 1:endB])
             + chunks_of(lines[regC + 1:endC]))
names = [n for n, _ in allchunks]
assert len(names) == 215, len(names)
assert len(set(names)) == 215

SPEECH = ("s2_", "s3_", "s10_", "svc_", "m1_", "m2_", "m5_", "m7_", "m8_",
          "m10_", "hm_", "rematch_", "p1_", "p3_", "w5_")


def family(n):
    if n.startswith(("c_", "curation_")): return "Curation"
    if n.startswith("dedup_"): return "Dedup"
    if n.startswith("sim_"): return "Sim"
    if n.startswith("streaming_"): return "Streaming"
    if n.startswith("t_"): return "Text"
    if n.startswith("mm_"): return "Multimodal"
    if n.startswith(("e_", "sketch_", "hh_", "r_")): return "Analytics"
    if n.startswith(SPEECH): return "Speech"
    return "Core"


fams = {}
for n, ch in allchunks:
    fams.setdefault(family(n), []).append((n, ch))

HEADER = """package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expr.Polyval
import graft.ops.{Curation, Dedup, EventAnalytics, GraphOps, MLlibOps, Multimodal, Retrieval, SegmentAlgebra, SegmentOps, Similarity, TextOps}
import graft.QuerySupport._
"""

DOCS = {
    "Core": "Relational core: scans, joins, windows, aggregates, set ops,\n  * ordering and scalar functions (SURVEY §2.1–2.8 A/F/J/O/U/W ids).",
    "Speech": "The speech-pipeline operator surface (SURVEY §2 S/P/M/HM ids):\n  * codec roundtrips, probes, service inference, stage mirrors.",
    "Text": "Text analysis: tokenization, quality, language id, BPE,\n  * fingerprinting, chunking (SURVEY §2.11 text ids).",
    "Dedup": "Deduplication family: exact/near-dup candidate generation,\n  * verification, components, canonicalization (SURVEY §2.11).",
    "Sim": "Similarity / ANN family: quantized cosine, IVF/LSH/PQ indexes,\n  * mining and pruning over the embeddings table (SURVEY §2.11).",
    "Curation": "Corpus curation: sampling, mixing, decontamination, packing,\n  * scoring, sharding, calibration (SURVEY §2.11 c_* ids).",
    "Analytics": "Event analytics + sketches: funnels, attribution, outliers,\n  * heavy hitters, cardinality/quantile sketches.",
    "Multimodal": "Multimodal (image/video/audio-as-binary) operators\n  * (SURVEY §2.11 mm_* ids).",
    "Streaming": "Structured Streaming flavors (SURVEY §2.10): every query runs\n  * its stream to completion (AvailableNow) and returns the sink table.",
}

for fam, entries in fams.items():
    body_parts = []
    for n, ch in entries:
        txt = "\n".join(ch).rstrip()
        if txt.endswith(","):
            txt = txt[:-1]
        body_parts.append(txt)
    body = ",\n\n".join(body_parts)
    out = (HEADER + "\n/** " + DOCS[fam] + "\n  */\n"
           + f"private[graft] object Queries{fam} {{\n\n"
           + f"  def entries: Seq[Q] = Seq(\n{body}\n  )\n}}\n")
    open(f"/root/repo/src/main/scala/graft/Queries{fam}.scala", "w").write(out)
    print(f"Queries{fam}: {len(entries)} queries, {len(out.splitlines())} lines")

# ---- QuerySupport.scala: head helpers (minus entry, minus registry) + block H
head_members = lines[obj_open + 1:entry_start]
# drop the banner comment directly above entry()
while head_members and (head_members[-1].strip().startswith("//")
                        or head_members[-1].strip() == ""):
    head_members.pop()
post_entry = lines[entry_end + 1:regA]   # Q, cleanupDirs, memos, services...
blockH = lines[endA + 1:regB]            # shared oracle CTE helpers

support = """package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{Curation, Dedup, SegmentOps, Similarity, TextOps}

/** Shared infrastructure of the query registry (split from SparkEntry):
  * the Q entry shape, session-lifetime memos of cross-family
  * intermediates, streaming staging, the loopback fixture service, and
  * the DuckDB CTE fragments shared by many oracles. See SparkEntry for
  * the driver contract and the determinism policy.
  */
private[graft] object QuerySupport {
""" + "\n".join(head_members) + "\n" + "\n".join(post_entry) + "\n" \
    + "\n".join(blockH) + "\n}\n"
# members were `private` to SparkEntry; inside QuerySupport they must be
# visible to the family objects -> make them private[graft]
support = re.sub(r"^  private (val|def|lazy val|case class)", r"  private[graft] \1",
                 support, flags=re.M)
open("/root/repo/src/main/scala/graft/QuerySupport.scala", "w").write(support)
print(f"QuerySupport: {len(support.splitlines())} lines")

# ---- new SparkEntry.scala: preamble + entry() + assembly + tail
pre = lines[:obj_open + 1]
# strip now-unused imports from the facade preamble
pre = [l for l in pre if not l.startswith(("import graft.expr.Polyval",
                                           "import graft.ops.",
                                           "import org.apache.spark.sql.expressions.Window"))]
tail = lines[tail_q:]
assembly = "\n" + "\n".join(lines[entry_start - 3:entry_end + 1]) + """

  import graft.QuerySupport.Q

  private def registry: Seq[Q] =
    QueriesCore.entries ++ QueriesSpeech.entries ++ QueriesText.entries ++
      QueriesDedup.entries ++ QueriesSim.entries ++ QueriesCuration.entries ++
      QueriesAnalytics.entries ++ QueriesMultimodal.entries ++
      QueriesStreaming.entries

"""
open(SRC, "w").write("\n".join(pre) + assembly + "\n".join(tail) + "\n")
print(f"SparkEntry: {len(pre) + len(assembly.splitlines()) + len(tail)} lines")
