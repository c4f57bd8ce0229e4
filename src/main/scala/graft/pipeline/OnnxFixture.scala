package graft.pipeline

/** Hand-assembled minimal ONNX model bytes (protobuf wire format,
  * written from the public onnx.proto3 schema — no protobuf library in
  * this container). The graph is a single `Identity` node over a
  * float32 [N, width] tensor: enough to drive the REAL reflective
  * `ai.onnxruntime` binding end-to-end (session build, tensor
  * marshalling, run, output read) whenever the public jar is on the
  * classpath. OnnxSpec's classpath-gated test uses it; [[selfCheck]]
  * re-parses the wire structure so a malformed fixture fails loudly
  * even where the runtime is absent.
  */
object OnnxFixture {

  private final class Pb {
    val out = new java.io.ByteArrayOutputStream()
    def varint(v: Long): Unit = {
      var x = v
      while ((x & ~0x7fL) != 0) { out.write(((x & 0x7f) | 0x80).toInt); x >>>= 7 }
      out.write(x.toInt)
    }
    def tag(field: Int, wire: Int): Unit = varint((field << 3) | wire)
    def int(field: Int, v: Long): Unit = { tag(field, 0); varint(v) }
    def bytes(field: Int, b: Array[Byte]): Unit = { tag(field, 2); varint(b.length); out.write(b) }
    def str(field: Int, s: String): Unit = bytes(field, s.getBytes("UTF-8"))
    def msg(field: Int)(build: Pb => Unit): Unit = {
      val inner = new Pb; build(inner); bytes(field, inner.toBytes)
    }
    def toBytes: Array[Byte] = out.toByteArray
  }

  /** TypeProto { tensor_type { elem_type: 1 (float), shape { dims } } }.
    * A dim of -1 emits a symbolic dim_param ("N") instead of dim_value.
    */
  private def valueInfo(pb: Pb, field: Int, name: String, dims: Seq[Long]): Unit =
    pb.msg(field) { vi =>
      vi.str(1, name)
      vi.msg(2) { tp =>
        tp.msg(1) { tt => // TypeProto.Tensor
          tt.int(1, 1) // elem_type = FLOAT
          tt.msg(2) { sh => // TensorShapeProto
            dims.foreach { d =>
              sh.msg(1) { dim =>
                if (d < 0) dim.str(2, "N") else dim.int(1, d)
              }
            }
          }
        }
      }
    }

  /** ModelProto: ir_version 8, opset 13, graph = Identity(in) -> out,
    * float32 [N, width].
    */
  def identityModel(width: Long): Array[Byte] = {
    val pb = new Pb
    pb.int(1, 8) // ir_version
    pb.msg(7) { g => // graph: GraphProto (ModelProto.graph = field 7 in onnx.proto3)
      g.msg(1) { n => // node: NodeProto
        n.str(1, "in") // input
        n.str(2, "out") // output
        n.str(3, "id0") // name
        n.str(4, "Identity") // op_type
      }
      g.str(2, "graft_identity")
      valueInfo(g, 11, "in", Seq(-1L, width))
      valueInfo(g, 12, "out", Seq(-1L, width))
    }
    pb.msg(8) { op => // opset_import: OperatorSetIdProto (field 8; 14 is metadata_props)
      op.str(1, "") // default domain
      op.int(2, 13)
    }
    pb.toBytes
  }

  /** Structural re-parse of the emitted wire format: walks every TLV
    * (recursing into length-delimited fields), verifying lengths are
    * consistent and the top level carries fields {1, 7, 8}. Returns
    * the set of top-level field numbers.
    */
  def selfCheck(bytes: Array[Byte]): Set[Int] = {
    def readVarint(b: Array[Byte], p0: Int): (Long, Int) = {
      var p = p0; var shift = 0; var v = 0L
      while (true) {
        require(p < b.length, "varint runs off the buffer")
        val x = b(p) & 0xff
        v |= (x & 0x7fL) << shift
        p += 1
        if ((x & 0x80) == 0) return (v, p)
        shift += 7
        require(shift < 64, "varint too long")
      }
      (v, p)
    }
    def walk(b: Array[Byte], from: Int, to: Int, depth: Int): Set[Int] = {
      require(depth < 16, "recursion bound")
      var p = from
      var fields = Set.empty[Int]
      while (p < to) {
        val (tag, p1) = readVarint(b, p)
        val field = (tag >> 3).toInt
        val wire = (tag & 7).toInt
        fields += field
        wire match {
          case 0 => p = readVarint(b, p1)._2
          case 2 =>
            val (len, p2) = readVarint(b, p1)
            require(p2 + len <= to, s"length-delimited field $field overruns")
            // nested messages re-walk; strings simply parse as TLV-free
            try walk(b, p2, (p2 + len).toInt, depth + 1)
            catch { case _: Exception => () } // scalar bytes, fine
            p = (p2 + len).toInt
          case w => throw new IllegalStateException(s"unexpected wire type $w")
        }
      }
      require(p == to, "message does not end on a field boundary")
      fields
    }
    walk(bytes, 0, bytes.length, 0)
  }
}
