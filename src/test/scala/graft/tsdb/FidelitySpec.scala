package graft.tsdb

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import TsdbFixtures.spark

/** Integer fidelity ABOVE 2^53 — the magnitudes where a double-valued
  * engine silently diverges from the reference's native i64/u64
  * (lib.rs:126-132). The engine must keep integer streams in LongType
  * end-to-end: storage (lvalue sidecar) → scan → aggregate/topk/V2S
  * arithmetic → typed output.
  */
class FidelitySpec extends AnyFunSuite {

  private val A = (1L << 60) + 1 // collapses onto 2^60 as a double
  private val B = (1L << 60) + 3 // ... and so does this one

  private def freshDb(): GraftDb =
    new GraftDb(spark, Files.createTempDirectory("graft_fid").toString)

  test("the test magnitudes are indistinguishable in f64") {
    assert(A.toDouble == B.toDouble, "fixture must exceed double precision")
  }

  test("u64 stream at 2^60: scan, sum, min/max, count, topk stay exact") {
    val db = freshDb()
    val sel = """big{kind = "u"}"""
    db.createStream(sel, VType.U64)
    val ins = db.inserter(sel)
    ins.insert(1L, A)
    ins.insert(2L, B)
    ins.insert(3L, 5L)
    ins.flush()

    def scalars(q: String): Seq[Long] =
      db.query(q, 0, 10).output.collect().toSeq.map(_.getLong(0))

    val scan = db.query("big", 0, 10).output.orderBy("timestamp")
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1)))
    assert(scan == Seq(1L -> A, 2L -> B, 3L -> 5L))

    assert(scalars("sum(big)") == Seq(A + B + 5L)) // 2^61 + 9, exact
    assert(scalars("min(big)") == Seq(5L))
    assert(scalars("max(big)") == Seq(B))
    assert(scalars("count(big)") == Seq(3L))
    // exact ordering: A and B differ by 2 — invisible to a double sort
    assert(scalars("topk(2, big)") == Seq(B, A))
    assert(scalars("bottomk(2, big)") == Seq(5L, A))
    // V2S with an integer scalar subquery stays in long arithmetic
    assert(db.query("big - min(big)", 0, 10).output.orderBy("timestamp")
      .collect().toSeq.map(_.getLong(1)) == Seq(A - 5L, B - 5L, 0L))
  }

  test("i64 stream at -2^60: negatives stay exact") {
    val db = freshDb()
    val sel = "neg_big"
    db.createStream(sel, VType.I64)
    val ins = db.inserter(sel)
    ins.insert(1L, -A)
    ins.insert(2L, -B)
    ins.flush()
    def scalars(q: String): Seq[Long] =
      db.query(q, 0, 10).output.collect().toSeq.map(_.getLong(0))
    assert(scalars("sum(neg_big)") == Seq(-(A + B)))
    assert(scalars("min(neg_big)") == Seq(-B))
    assert(scalars("max(neg_big)") == Seq(-A))
  }

  test("csv export + import round-trips 2^60 exactly") {
    val db = freshDb()
    val sel = "rt"
    db.createStream(sel, VType.U64)
    val ins = db.inserter(sel)
    ins.insert(1L, A)
    ins.insert(2L, B)
    ins.flush()
    val csvDir = Files.createTempDirectory("graft_fid_csv").toString + "/out"
    db.exportCsv("rt", 0, 10, csvDir)

    val db2 = freshDb()
    db2.createStream(sel, VType.U64)
    val part = new java.io.File(csvDir).listFiles()
      .find(_.getName.endsWith(".csv")).get
    db2.importCsv(sel, part.toString)
    assert(db2.query("sum(rt)", 0, 10).output.collect()
      .map(_.getLong(0)).toSeq == Seq(A + B))
  }

  test("i64 boundary: Long.MaxValue exact; above-i64 inputs rejected loudly") {
    val db = freshDb()
    db.createStream("edge", VType.U64)
    val ins = db.inserter("edge")
    ins.insert(1L, Long.MaxValue) // the last representable lvalue
    ins.flush()
    assert(db.query("max(edge)", 0, 10).output.head().getLong(0)
      == Long.MaxValue)
    // the lvalue sidecar is i64 (the reference stores native u64 —
    // documented divergence): a too-big double is rejected, never
    // silently clamped...
    intercept[IllegalArgumentException](db.inserter("edge").insert(2L, 9.3e18))
    // ...and a CSV u64 above 2^63 fails the import, never nulls out
    val dir = Files.createTempDirectory("graft_u64").toString
    val f = java.nio.file.Paths.get(dir, "big.csv")
    java.nio.file.Files.writeString(f,
      "Timestamp,Value\n3,9223372036854775808\n")
    intercept[Exception](db.importCsv("edge", f.toString))
    // nothing from the failed paths reached storage
    assert(db.query("count(edge)", 0, 10).output.head().getLong(0) == 1L)
  }

  test("division still goes through f64, as the reference does") {
    val db = freshDb()
    db.createStream("d", VType.U64)
    val ins = db.inserter("d")
    ins.insert(1L, 10L)
    ins.insert(2L, 4L)
    ins.flush()
    val res = db.query("d / sum(d)", 0, 10)
    assert(res.vtype == VType.F64)
    val vals = res.output.orderBy("timestamp").collect().map(_.getDouble(1)).toSeq
    assert(vals == Seq(10.0 / 14.0, 4.0 / 14.0))
  }
}
