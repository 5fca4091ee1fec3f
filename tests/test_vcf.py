import numpy as np

from nanocaller_tpu.io.vcf import (
    VcfReader,
    VcfRecord,
    VcfWriter,
    concat,
    standard_snp_header,
    view_filter,
    write_sorted,
)


def mk_records(contig, positions, filt="PASS"):
    return [
        VcfRecord(contig, p, "A", "T", "%.3f" % (30 + p % 7), filt,
                  info="PR=0.1,0.2,0.3,0.4;FQ=0.5",
                  format_="GT:DP", samples=["0/1:20"])
        for p in positions
    ]


HDR = standard_snp_header(["c1", "c2"], "S1")


class TestVcfRoundtrip:
    def test_write_read_plain(self, tmp_path):
        p = str(tmp_path / "x.vcf")
        with VcfWriter(p, HDR) as w:
            for r in mk_records("c1", [10, 20, 30]):
                w.write(r)
        rd = VcfReader(p)
        recs = list(rd)
        assert [r.pos for r in recs] == [10, 20, 30]
        assert rd.sample == "S1"
        assert recs[0].sample_field("DP") == "20"
        assert recs[0].sample_field("GT") == "0/1"

    def test_write_read_bgzf_indexed_fetch(self, tmp_path):
        p = str(tmp_path / "x.vcf.gz")
        positions = list(range(100, 90000, 37))
        with VcfWriter(p, HDR) as w:
            for r in mk_records("c1", positions):
                w.write(r)
            for r in mk_records("c2", [5, 50]):
                w.write(r)
        rd = VcfReader(p)
        assert len(list(rd)) == len(positions) + 2
        got = [r.pos for r in rd.fetch("c1", 40000, 41000)]
        want = [p for p in positions if 40000 <= p <= 41000]
        assert got == want
        got2 = [r.pos for r in rd.fetch("c2")]
        assert got2 == [5, 50]

    def test_view_filter(self, tmp_path):
        src = str(tmp_path / "a.vcf.gz")
        with VcfWriter(src, HDR) as w:
            for r in mk_records("c1", [10, 20]):
                w.write(r)
            for r in mk_records("c1", [15], filt="LOW"):
                w.write(r)
        dst = view_filter(src, str(tmp_path / "b.vcf.gz"),
                          lambda r: r.filter == "PASS")
        assert [r.pos for r in VcfReader(dst)] == [10, 20]

    def test_write_sorted_merge(self, tmp_path):
        s1 = mk_records("c1", [10, 30, 50]) + mk_records("c2", [5])
        s2 = mk_records("c1", [20, 40])
        p = write_sorted(str(tmp_path / "m.vcf.gz"), HDR, [iter(s1), iter(s2)])
        recs = list(VcfReader(p))
        assert [(r.chrom, r.pos) for r in recs] == [
            ("c1", 10), ("c1", 20), ("c1", 30), ("c1", 40), ("c1", 50), ("c2", 5)]

    def test_concat(self, tmp_path):
        p1 = str(tmp_path / "a.vcf.gz")
        p2 = str(tmp_path / "b.vcf.gz")
        with VcfWriter(p1, HDR) as w:
            for r in mk_records("c1", [10, 30]):
                w.write(r)
        with VcfWriter(p2, HDR) as w:
            for r in mk_records("c1", [20]):
                w.write(r)
        out = concat([p1, p2], str(tmp_path / "c.vcf.gz"))
        assert [r.pos for r in VcfReader(out)] == [10, 20, 30]


class TestVcfCorruptionFuzz:
    """Corrupt VCF shards (the distributed merge reads these back) must
    fail with clean errors, never stray exceptions."""

    def test_bitflips_and_truncation(self, tmp_path):
        import numpy as np
        from nanocaller_tpu.io.vcf import VcfReader, VcfWriter

        path = str(tmp_path / "v.vcf.gz")
        header = ["##fileformat=VCFv4.2",
                  "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS"]
        with VcfWriter(path, header) as w:
            for p in range(100, 6000, 37):
                w.write("chr_t\t%d\t.\tA\tC\t%d.5\tPASS\t.\tGT:DP\t0/1:%d\n"
                        % (p, p % 90, p % 60))
        blob = open(path, "rb").read()
        rng = np.random.default_rng(2)
        bad = str(tmp_path / "bad.vcf.gz")
        for trial in range(50):
            data = bytearray(blob)
            if trial % 2:
                for _ in range(int(rng.integers(1, 5))):
                    i = int(rng.integers(0, len(data)))
                    data[i] ^= int(rng.integers(1, 256))
            else:
                data = data[: int(rng.integers(10, len(data)))]
            with open(bad, "wb") as fh:
                fh.write(bytes(data))
            try:
                for r in VcfReader(bad):
                    _ = r.pos, r.qual_value, r.filter, r.sample_field("GT")
            except (ValueError, OSError, EOFError):
                pass
