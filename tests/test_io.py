import os
import numpy as np
import pytest

from nanocaller_tpu.io.bgzf import BgzfReader, BgzfWriter, is_bgzf
from nanocaller_tpu.io.fasta import FastaFile, write_fasta
from nanocaller_tpu.io.bam import AlignedRead, BamReader, BamWriter, reg2bin, reg2bins
from nanocaller_tpu.io.bed import BedIntervals

from fixtures import make_fixture, random_seq


class TestBgzf:
    def test_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        data = rng.integers(0, 256, size=300_000, dtype=np.uint8).tobytes()
        p = tmp_path / "x.bgz"
        with BgzfWriter(p) as w:
            for i in range(0, len(data), 9973):
                w.write(data[i : i + 9973])
        assert is_bgzf(p)
        with BgzfReader(p) as r:
            assert r.read() == data

    def test_virtual_offsets(self, tmp_path):
        p = tmp_path / "x.bgz"
        offsets = []
        with BgzfWriter(p) as w:
            for i in range(200):
                offsets.append(w.tell())
                w.write(b"line-%05d\n" % i)
        with BgzfReader(p) as r:
            for i in (0, 7, 150, 199):
                r.seek(offsets[i])
                assert r.readline() == b"line-%05d\n" % i

    def test_incompressible_large_block(self, tmp_path):
        rng = np.random.default_rng(1)
        data = rng.integers(0, 256, size=70_000, dtype=np.uint8).tobytes()
        p = tmp_path / "x.bgz"
        with BgzfWriter(p, compresslevel=0) as w:
            w.write(data)
        with BgzfReader(p) as r:
            assert r.read() == data


class TestFasta:
    def test_fetch_matches_slice(self, tmp_path):
        rng = np.random.default_rng(2)
        seqs = {"c1": random_seq(rng, 5003), "c2": random_seq(rng, 137)}
        p = str(tmp_path / "ref.fa")
        write_fasta(p, seqs)
        fa = FastaFile(p)
        assert fa.references == ["c1", "c2"]
        assert fa.get_reference_length("c1") == 5003
        for start, end in [(0, 10), (59, 61), (4990, 5003), (1234, 2345), (0, 5003)]:
            assert fa.fetch("c1", start, end) == seqs["c1"][start:end]
        assert fa.fetch("c2", 0, None) == seqs["c2"]
        assert fa.fetch("c1", -5, 3) == seqs["c1"][0:3]
        assert fa.fetch("c1", 6000, 6100) == ""


class TestBam:
    def test_roundtrip_and_fetch(self, tmp_path):
        fasta, bam, ref_seq, snps = make_fixture(tmp_path, depth=20, L=4000)
        rd = BamReader(bam)
        assert rd.references == ["chr_t"]
        assert rd.lengths == [4000]
        all_reads = list(rd)
        assert len(all_reads) > 50
        # sortedness
        poss = [r.pos for r in all_reads]
        assert poss == sorted(poss)
        # indexed fetch equals linear-scan overlap filter
        assert os.path.exists(bam + ".bai")
        window = (1500, 2500)
        expect = {r.qname for r in all_reads if r.pos < window[1] and r.reference_end > window[0]}
        got = {r.qname for r in rd.fetch("chr_t", *window)}
        assert got == expect and len(got) > 0
        # fetch without index gives same answer
        rd2 = BamReader(bam, index_path="/nonexistent")
        got2 = {r.qname for r in rd2.fetch("chr_t", *window)}
        assert got2 == expect

    def test_tags_and_cigar(self, tmp_path):
        p = str(tmp_path / "t.bam")
        r = AlignedRead(
            "q1", 16, 0, 100, 60, [(4, 5), (0, 10), (1, 3), (0, 5), (2, 4), (0, 6)],
            "ACGTACGTACGTACGTACGTACGTACGTA", np.full(29, 25, np.uint8),
            {"HP": 2, "PS": 100001, "RG": "grp1"},
        )
        with BamWriter(p, ["c"], [10000]) as w:
            w.write(r)
        back = list(BamReader(p))[0]
        assert back.qname == "q1"
        assert back.flag == 16 and back.is_reverse
        assert back.cigar == [(4, 5), (0, 10), (1, 3), (0, 5), (2, 4), (0, 6)]
        assert back.seq == r.seq
        assert back.get_tag("HP") == 2
        assert back.get_tag("PS") == 100001
        assert back.get_tag("RG") == "grp1"
        assert back.reference_end == 100 + 10 + 5 + 4 + 6

    def test_reg2bin(self):
        assert reg2bin(0, 1) == 4681
        assert 4681 in reg2bins(0, 1)
        assert reg2bin(0, 1 << 29) == 0


class TestCoverage:
    def test_get_coverage(self, tmp_path):
        from nanocaller_tpu.runtime.chunker import get_coverage

        fasta, bam, ref_seq, snps = make_fixture(tmp_path, depth=20, L=4000)
        rd = BamReader(bam)
        cov = get_coverage(rd, "chr_t", 1, 4000)
        assert 10 < cov < 30  # ~20x simulated
        cov_hi = get_coverage(rd, "chr_t", 1, 4000, mincov=1000)
        assert cov_hi == 0

    def test_bam_reader_redirects_cram(self, tmp_path):
        # BamReader itself stays BAM-only; CRAM goes through
        # open_alignment/CramReader (tests/test_cram.py)
        p = tmp_path / "x.cram"
        p.write_bytes(b"CRAM\x03\x00" + b"\x00" * 64)
        with pytest.raises(ValueError, match="open_alignment"):
            BamReader(str(p))


class TestBed:
    def test_overlaps_and_mask(self, tmp_path):
        bed = tmp_path / "ex.bed"
        bed.write_text("chr1\t100\t200\nchr1\t150\t300\nchr1\t1000\t1100\nchr2\t5\t10\n")
        b = BedIntervals(str(bed))
        assert b.overlaps("chr1", 100)
        assert b.overlaps("chr1", 250)
        assert not b.overlaps("chr1", 300)
        assert not b.overlaps("chr1", 99)
        assert not b.overlaps("chr3", 100)
        m = b.mask("chr1", np.array([50, 100, 299, 300, 1050, 2000]))
        assert m.tolist() == [False, True, True, False, True, False]

    def test_bgzipped(self, tmp_path):
        p = str(tmp_path / "ex.bed.gz")
        with BgzfWriter(p) as w:
            w.write("chrZ\t10\t20\n")
        b = BedIntervals(p)
        assert b.overlaps("chrZ", 15)
        assert not b.overlaps("chrZ", 20)


class TestCorruptionFuzz:
    """Random corruption must surface as clean ValueError/OSError (or be
    harmless), never IndexError/struct.error/KeyError — actionable
    errors are part of the IO contract (SURVEY §5.3 contrast)."""

    ACCEPT = (ValueError, OSError, EOFError)

    def _exercise(self, path, fasta):
        import numpy as np
        from nanocaller_tpu.io.bam import open_alignment
        from nanocaller_tpu.pileup.engine import (decode_reads,
                                                  deferred_decode,
                                                  indel_deferred_decode)

        obj = open_alignment(path, fasta=fasta)
        rw = decode_reads(obj, "chr_t", 0, 6000, keep_seq=True)
        # force both native and oracle paths to walk the records
        rw2 = decode_reads(obj, "chr_t", 0, 6000, keep_seq=True,
                           use_native=False)
        # the two-phase decoders re-walk stashed records independently
        dd = deferred_decode(obj, "chr_t", 0, 6000)
        if dd is not None:
            dd.finish(np.array([100, 3000, 5900], np.int64))
        idd = indel_deferred_decode(obj, "chr_t", 0, 6000)
        if idd is not None:
            idd.finish_events([100, 3000, 5900])
        return rw.n_reads + rw2.n_reads

    def test_bam_bitflips_and_truncation(self, tmp_path):
        import numpy as np
        from fixtures import make_fixture
        from nanocaller_tpu.io.fasta import FastaFile

        fasta_p, bam_p, _, _ = make_fixture(tmp_path, L=6000, depth=12,
                                            read_len=700, seed=3)
        fasta = FastaFile(fasta_p)
        blob = open(bam_p, "rb").read()
        self._exercise(bam_p, fasta)  # sanity: clean file works
        rng = np.random.default_rng(0)
        bad = str(tmp_path / "bad.bam")
        for trial in range(40):
            data = bytearray(blob)
            if trial % 2:
                # flip 1-4 random bytes
                for _ in range(int(rng.integers(1, 5))):
                    i = int(rng.integers(0, len(data)))
                    data[i] ^= int(rng.integers(1, 256))
            else:
                data = data[: int(rng.integers(10, len(data)))]
            with open(bad, "wb") as fh:
                fh.write(bytes(data))
            # also corrupt/remove the index half the time
            if trial % 4 == 0:
                open(bad + ".bai", "wb").write(b"junk")
            else:
                import shutil
                shutil.copy(bam_p + ".bai", bad + ".bai")
            try:
                self._exercise(bad, fasta)
            except self.ACCEPT:
                pass  # clean, actionable failure

    def test_cram_bitflips(self, tmp_path):
        import numpy as np
        from fixtures import make_fixture
        from nanocaller_tpu.io.bam import BamReader
        from nanocaller_tpu.io.cram import CramWriter
        from nanocaller_tpu.io.fasta import FastaFile

        fasta_p, bam_p, _, _ = make_fixture(tmp_path, L=6000, depth=12,
                                            read_len=700, seed=5)
        fasta = FastaFile(fasta_p)
        cram_p = str(tmp_path / "c.cram")
        br = BamReader(bam_p)
        with CramWriter(cram_p, br.references, br.lengths, fasta) as w:
            for rd in br.fetch("chr_t", 0, 6000):
                w.write(rd)
        self._exercise(cram_p, fasta)
        blob = open(cram_p, "rb").read()
        crai = open(cram_p + ".crai", "rb").read()
        rng = np.random.default_rng(1)
        bad = str(tmp_path / "bad.cram")
        for trial in range(40):
            data = bytearray(blob)
            if trial % 2:
                for _ in range(int(rng.integers(1, 5))):
                    i = int(rng.integers(0, len(data)))
                    data[i] ^= int(rng.integers(1, 256))
            else:
                data = data[: int(rng.integers(10, len(data)))]
            with open(bad, "wb") as fh:
                fh.write(bytes(data))
            open(bad + ".crai", "wb").write(crai)
            try:
                self._exercise(bad, fasta)
            except self.ACCEPT:
                pass
