package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.unsafe.types.UTF8String
import graft.cdc.{Chunking, PgOutput, StandbyReply}
import graft.functions.Lsn

/** Property-based checks for the driver-side codec primitives — the byte
  * formats every CDC operator rides on. These run without a SparkSession
  * (pure functions), so the generators can sweep the full value domains
  * instead of the planted testdata's corner.
  */
object CodecPropertySpec extends Properties("codecs") {

  // -- LSN text form `%X/%X` ↔ u64 ------------------------------------
  property("lsn format∘parse = id over the full u64 domain") =
    Prop.forAll { (l: Long) =>
      Lsn.parse(Lsn.format(l)) == l
    }

  property("lsn format matches the pglogrepl %X/%X shape") =
    Prop.forAll { (l: Long) =>
      val s = Lsn.format(l).toString
      val parts = s.split("/")
      parts.length == 2 && parts.forall(p => p.matches("[0-9A-F]+"))
    }

  // -- chunk framing (client.go:642-686) -------------------------------
  private val genPayload = Gen.chooseNum(0, 4096).flatMap(n =>
    Gen.containerOfN[Array, Byte](n, Gen.choose(Byte.MinValue, Byte.MaxValue)))

  property("chunk split → wire bytes → parse → concat = id") =
    Prop.forAll(genPayload, Gen.chooseNum(1, 257)) { (bytes, chunkSize) =>
      val frames = Chunking.split(7L, bytes, chunkSize)
        .map(f => Chunking.parseFrame(7L, Chunking.frameBytes(f)))
      val expected = math.max(1, math.ceil(bytes.length.toDouble / chunkSize).toInt)
      val reassembled = frames.sortBy(_.seq).flatMap(_.chunk).toArray
      (bytes.isEmpty || frames.length == expected) &&
        frames.zipWithIndex.forall { case (f, i) => f.seq == i && f.total_len == bytes.length } &&
        java.util.Arrays.equals(reassembled, bytes)
    }

  // -- pgoutput writer/reader primitives -------------------------------
  property("W/R u8·u16·u32·u64·cstr roundtrip") =
    Prop.forAll(Gen.chooseNum(0, 255), Gen.chooseNum(0, 65535),
      Gen.chooseNum(0L, 0xFFFFFFFFL), Gen.choose(Long.MinValue, Long.MaxValue),
      Gen.alphaNumStr) { (a, b, c, d, s) =>
      import PgOutput.{R, W}
      val bytes = new W().u8(a).u16(b).u32(c).u64(d).cstr(s).result()
      val r = new R(bytes)
      r.u8() == a && r.u16() == b && r.u32() == c && r.u64() == d &&
        r.cstr() == s && r.remaining == 0
    }

  // -- standby status update 'r' ---------------------------------------
  property("standby status encode∘parse = id (flush/apply = write)") =
    Prop.forAll(Gen.choose(0L, Long.MaxValue), Gen.choose(0L, Long.MaxValue),
      Gen.oneOf(true, false)) { (pos, t, reply) =>
      PgOutput.parseStandbyStatus(PgOutput.standbyStatus(pos, t, reply)) ==
        StandbyReply(pos, pos, pos, Lsn.format(pos).toString, reply)
    }

  // -- timestamptz text form -------------------------------------------
  property("timestamptz format∘parse = id over four digit years") =
    Prop.forAll(Gen.choose(0L, 250000000000000000L)) { (us: Long) =>
      PgOutput.parseTsTz(PgOutput.formatTsTz(us)) == us
    }
}
