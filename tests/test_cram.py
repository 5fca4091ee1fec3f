"""CRAM 3.0 layer tests: varints, rANS codec, round-trips, region fetch,
and BAM≡CRAM end-to-end pipeline equivalence.

The reference consumes BAM/CRAM interchangeably via pysam
(generate_SNP_pileups.py:134) and emits a haplotagged CRAM for CRAM
input (indelCaller.py:248-251); these tests pin the same capability on
our in-repo stack (io/cram.py, io/rans.py).
"""

import os
import random

import numpy as np
import pytest

from nanocaller_tpu.io import rans
from nanocaller_tpu.io.bam import AlignedRead, BamReader, open_alignment
from nanocaller_tpu.io.cram import (CramReader, CramWriter, itf8_get,
                                    itf8_put, ltf8_get, ltf8_put)
from nanocaller_tpu.io.fasta import build_fai, write_fasta

from fixtures import make_diploid_readset, make_fixture, random_seq, write_bam


class TestVarints:
    def test_itf8_round_trip(self):
        vals = [0, 1, 127, 128, 255, 16383, 16384, 2097151, 2097152,
                268435455, 268435456, 2**31 - 1, -1, -2, -2147483648]
        for v in vals:
            enc = itf8_put(v)
            dec, pos = itf8_get(enc, 0)
            assert dec == v, (v, enc)
            assert pos == len(enc)

    def test_ltf8_round_trip(self):
        vals = [0, 1, 127, 128, 2**14 - 1, 2**14, 2**21, 2**28, 2**35,
                2**42, 2**49, 2**56 - 1, 2**56, 2**63 - 1, -1]
        for v in vals:
            enc = ltf8_put(v)
            dec, pos = ltf8_get(enc, 0)
            assert dec == v, (v, enc)
            assert pos == len(enc)


class TestRans:
    CASES = None

    @classmethod
    def _cases(cls):
        if cls.CASES is None:
            rng = random.Random(5)
            cls.CASES = [
                b"", b"A", b"AB", b"ABC", b"AAAA" * 64,
                bytes(range(256)) * 3,
                bytes(rng.getrandbits(8) for _ in range(7001)),
                bytes(rng.choice(b"ACGT") for _ in range(5003)),
                bytes(rng.choice(b"!#&'()*+IJK") for _ in range(20000)),
                b"\x00" * 400,
                bytes([255] * 321 + [0] * 13 + list(range(250, 256)) * 9),
            ]
        return cls.CASES

    @pytest.mark.parametrize("order", [0, 1])
    def test_round_trip(self, order):
        for data in self._cases():
            stream = rans.compress(data, order)
            assert rans.uncompress(stream) == data

    def test_compresses_low_entropy(self):
        data = bytes(random.Random(0).choice(b"ACGT") for _ in range(50000))
        assert len(rans.compress(data, 0)) < len(data) // 3


def _mk_read(qname, rid, pos, cigar, refs, rng, flag=0, mapq=37, tags=None,
             seq=None):
    ref = refs[rid]
    if seq is None:
        s = []
        rp = pos
        for op, ln in cigar:
            if op in (0, 7, 8):
                chunk = list(ref[rp : rp + ln])
                if op == 8:
                    chunk = ["A" if c != "A" else "G" for c in chunk]
                s += chunk
                rp += ln
            elif op in (1, 4):
                s += ["ACGTN"[i % 5] for i in range(ln)]
            elif op in (2, 3):
                rp += ln
        seq = "".join(s)
    qual = rng.integers(0, 60, len(seq)).astype(np.uint8)
    return AlignedRead(qname, flag, rid, pos, mapq, cigar, seq, qual,
                       tags or {})


@pytest.fixture(scope="module")
def two_contig_ref(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cramref")
    rng = np.random.default_rng(11)
    ref1 = "".join(rng.choice(list("ACGT"), 5000))
    ref2 = "".join(rng.choice(list("ACGT"), 3000))
    fa = str(tmp / "ref.fa")
    write_fasta(fa, {"c1": ref1, "c2": ref2})
    return fa, [ref1, ref2]


def _stress_reads(refs, rng):
    reads = [
        _mk_read("r_m", 0, 10, [(0, 50)], refs, rng),
        _mk_read("r_sc", 0, 100, [(4, 7), (0, 40), (4, 3)], refs, rng),
        _mk_read("r_ins", 0, 200, [(0, 20), (1, 5), (0, 20)], refs, rng),
        _mk_read("r_ins1", 0, 250, [(0, 20), (1, 1), (0, 20)], refs, rng),
        _mk_read("r_del", 0, 300, [(0, 20), (2, 4), (0, 20)], refs, rng),
        _mk_read("r_skip", 0, 400, [(0, 20), (3, 100), (0, 20)], refs, rng),
        _mk_read("r_hard", 0, 500, [(5, 12), (0, 30), (5, 2)], refs, rng),
        _mk_read("r_pad", 0, 600, [(0, 10), (6, 3), (0, 10)], refs, rng),
        _mk_read("r_eqx", 0, 700, [(7, 15), (8, 3), (7, 10)], refs, rng),
        _mk_read("r_rev", 0, 800, [(0, 44)], refs, rng, flag=16),
        _mk_read("r_mate", 0, 900, [(0, 30)], refs, rng,
                 flag=0x1 | 0x8 | 0x20 | 0x40),
        _mk_read("r_N", 0, 1000, [(0, 30)], refs, rng,
                 seq="N" * 5 + refs[0][1005:1025] + "NNACG"),
        _mk_read("r_tags", 0, 1100, [(0, 25)], refs, rng,
                 tags={"HP": 2, "PS": 1000001, "XL": -1294967296,
                       "XF": 1.5, "XS": "hello world",
                       "XB": [1, -5, 70000]}),
        _mk_read("r_big", 0, 1200,
                 [(4, 100), (0, 900), (2, 30), (0, 800), (1, 40), (0, 500)],
                 refs, rng),
        _mk_read("r_c2", 1, 50, [(0, 60)], refs, rng),
        _mk_read("r_c2b", 1, 2900, [(0, 60)], refs, rng),
    ]
    reads.insert(5, AlignedRead("r_unmap", 0x4, 0, 1500, 0, [], "ACGTNACGT",
                                np.arange(9, dtype=np.uint8), {}))
    return reads


def _assert_reads_equal(a, b, cigar_merged=True):
    assert a.qname == b.qname
    assert a.flag == b.flag, (a.qname, a.flag, b.flag)
    assert a.ref_id == b.ref_id and a.pos == b.pos and a.mapq == b.mapq
    if a.flag & 0x4:
        assert b.cigar == []
    else:
        exp = []
        for op, ln in a.cigar:
            op = 0 if op in (7, 8) else op  # =/X decode to M
            if exp and exp[-1][0] == op:
                exp[-1] = (op, exp[-1][1] + ln)
            else:
                exp.append((op, ln))
        assert b.cigar == exp, (a.qname, exp, b.cigar)
    assert a.seq == b.seq, a.qname
    assert np.array_equal(np.asarray(a.qual), b.qual), a.qname
    assert set(a.tags) == set(b.tags), a.qname
    for k, v in a.tags.items():
        if isinstance(v, float):
            assert abs(v - b.tags[k]) < 1e-6
        else:
            assert v == b.tags[k], (a.qname, k, v, b.tags[k])


class TestCramRoundTrip:
    @pytest.mark.parametrize("compression", ["gzip", "rans", "raw"])
    def test_stress_shapes(self, two_contig_ref, tmp_path, compression):
        fa, refs = two_contig_ref
        rng = np.random.default_rng(3)
        reads = _stress_reads(refs, rng)
        path = str(tmp_path / ("s_%s.cram" % compression))
        # tiny slices force multiple containers incl. a contig switch
        with CramWriter(path, ["c1", "c2"], [5000, 3000], fa,
                        compression=compression, records_per_slice=6) as w:
            for r in reads:
                w.write(r)
        cr = CramReader(path, fasta=fa)
        back = list(cr)
        assert len(back) == len(reads)
        for a, b in zip(reads, back):
            _assert_reads_equal(a, b)

    def test_fetch_matches_bam(self, tmp_path):
        fa, bam_p, ref_seq, truth = make_fixture(tmp_path, seed=3, L=8000,
                                                 depth=25, read_len=700)
        br = BamReader(bam_p)
        reads = list(br.fetch("chr_t"))
        path = str(tmp_path / "t.cram")
        with CramWriter(path, br.references, br.lengths, fa,
                        records_per_slice=64) as w:
            for r in reads:
                w.write(r)
        assert os.path.exists(path + ".crai")
        cr = CramReader(path, fasta=fa)
        assert cr.references == br.references
        assert cr.lengths == br.lengths
        for s, e in [(0, 8000), (3000, 3500), (7900, 8000), (0, 1)]:
            got = sorted(r.qname for r in cr.fetch("chr_t", s, e))
            want = sorted(r.qname for r in br.fetch("chr_t", s, e))
            assert got == want, (s, e, len(got), len(want))
        # full-file round trip field-for-field
        for a, b in zip(reads, cr.fetch("chr_t")):
            _assert_reads_equal(a, b)
        # smaller than the BAM with the default codec
        assert os.path.getsize(path) < os.path.getsize(bam_p)

    def test_open_alignment_dispatch(self, tmp_path, two_contig_ref):
        fa, refs = two_contig_ref
        rng = np.random.default_rng(4)
        path = str(tmp_path / "d.cram")
        with CramWriter(path, ["c1", "c2"], [5000, 3000], fa) as w:
            w.write(_mk_read("r", 0, 10, [(0, 30)], refs, rng))
        obj = open_alignment(path, fasta=fa)
        assert obj.format == "CRAM"
        assert len(list(obj.fetch("c1"))) == 1
        with pytest.raises(ValueError):
            BamReader(path)

    def test_missing_fasta_is_actionable(self, tmp_path, two_contig_ref):
        fa, refs = two_contig_ref
        rng = np.random.default_rng(4)
        path = str(tmp_path / "nf.cram")
        with CramWriter(path, ["c1", "c2"], [5000, 3000], fa) as w:
            w.write(_mk_read("r", 0, 10, [(0, 30)], refs, rng))
        cr = CramReader(path)  # no fasta
        with pytest.raises(ValueError, match="FASTA"):
            list(cr.fetch("c1"))


class TestCramPipeline:
    def test_all_mode_cram_equals_bam(self, tmp_path):
        """The full pipeline on CRAM input must reproduce the BAM run and
        emit a haplotagged CRAM artifact (indelCaller.py:248-251)."""
        from nanocaller_tpu.cli import main
        from nanocaller_tpu.io.vcf import VcfReader

        rng = np.random.default_rng(12)
        L = 6000
        ref_seq = random_seq(rng, L)
        snps = []
        for i, pos in enumerate(range(400, L - 400, 330)):
            rb = ref_seq[pos]
            alt = "ACGT"[("ACGT".index(rb) + 1) % 4]
            snps.append((pos, alt, "het1" if i % 2 == 0 else "het2"))
        indels = [(2210, "del", 6, "het1")]
        reads = make_diploid_readset(rng, ref_seq, snps=snps, indels=indels,
                                     depth=35, read_len=1200,
                                     error_rate=0.02)
        fa = str(tmp_path / "ref.fa")
        write_fasta(fa, {"chr_t": ref_seq})
        bam_p = str(tmp_path / "reads.bam")
        write_bam(bam_p, "chr_t", L, reads)
        br = BamReader(bam_p)
        cram_p = str(tmp_path / "reads.cram")
        with CramWriter(cram_p, br.references, br.lengths, fa) as w:
            for r in br.fetch("chr_t"):
                w.write(r)

        def run(inp, out):
            return main(["--bam", inp, "--ref", fa, "--mode", "all",
                         "--output", str(tmp_path / out), "--prefix", "p",
                         "--sample", "S", "--phase_qual_score", "4"])

        out_bam = run(bam_p, "out_bam")
        out_cram = run(cram_p, "out_cram")
        for key in ("snps", "phased_snps", "indels", "final"):
            a = [(r.chrom, r.pos, r.ref, r.alt, tuple(r.samples))
                 for r in VcfReader(out_bam[key])]
            b = [(r.chrom, r.pos, r.ref, r.alt, tuple(r.samples))
                 for r in VcfReader(out_cram[key])]
            assert a == b, key
        assert len([1 for r in VcfReader(out_cram["snps"])]) > 5
        phased_cram = os.path.join(str(tmp_path / "out_cram"),
                                   "intermediate_phase_files",
                                   "chr_t.phased.cram")
        assert os.path.exists(phased_cram)
        tagged = [r for r in CramReader(phased_cram, fasta=fa).fetch("chr_t")
                  if "HP" in r.tags]
        assert len(tagged) > 10
        assert all("PS" in r.tags for r in tagged)


class TestNativeRans:
    def test_native_matches_python_oracle(self):
        from nanocaller_tpu.io.native import native_available

        if not native_available():
            pytest.skip("native library unavailable")
        rng = random.Random(17)
        cases = [b"", b"A", bytes(range(256)) * 3,
                 bytes(rng.getrandbits(8) for _ in range(30011)),
                 bytes(rng.choice(b"ACGT") for _ in range(70003)),
                 b"\x07" * 9999]
        for order in (0, 1):
            for data in cases:
                stream = rans.compress(data, order)
                assert rans.uncompress(stream, use_native=True) == data
                assert rans.uncompress(stream, use_native=False) == data

    def test_native_rejects_corrupt(self):
        from nanocaller_tpu.io.native import native_available

        if not native_available():
            pytest.skip("native library unavailable")
        stream = bytearray(rans.compress(b"ACGTACGTAA" * 50, 0))
        stream = stream[:14]  # truncate inside the tables/states
        with pytest.raises(ValueError):
            rans.uncompress(bytes(stream) )


class TestNativeCramDecode:
    """C++ CRAM slice→event decoder vs the Python oracle and the BAM
    decoder: identical ReadWindows from all three paths."""

    @pytest.fixture(scope="class")
    def cram_fixture(self, tmp_path_factory):
        from nanocaller_tpu.io.cram import CramWriter

        tmp = tmp_path_factory.mktemp("ncram")
        fa, bam_p, ref_seq, truth = make_fixture(tmp, seed=6, L=30000,
                                                 depth=30, read_len=2500)
        br = BamReader(bam_p)
        cram_p = str(tmp / "r.cram")
        with CramWriter(cram_p, br.references, br.lengths, fa,
                        compression="rans", records_per_slice=100) as w:
            for r in br.fetch("chr_t"):
                w.write(r)
        return fa, bam_p, cram_p

    @staticmethod
    def _compare(a, b, label):
        assert a.n_reads == b.n_reads, label
        assert a.qnames == b.qnames, label
        for f in ("flags", "strand", "read_start", "read_end", "hp", "ps",
                  "ev_rid", "ev_pos", "ev_code", "ev_qpos", "del_rid",
                  "del_start", "del_len", "ins_rid", "ins_pos", "ins_len"):
            assert np.array_equal(getattr(a, f), getattr(b, f)), (label, f)
        assert a.seqs == b.seqs, label

    def test_native_equals_oracle_and_bam(self, cram_fixture):
        from nanocaller_tpu.io.cram import CramReader
        from nanocaller_tpu.io.native import native_available
        from nanocaller_tpu.pileup.engine import decode_reads

        if not native_available():
            pytest.skip("native library unavailable")
        fa, bam_p, cram_p = cram_fixture
        cr = CramReader(cram_p, fasta=fa)
        br = BamReader(bam_p)
        for s, e in [(0, 30000), (12_000, 13_000), (29_000, 30_000)]:
            nat = decode_reads(cr, "chr_t", s, e, keep_seq=True)
            ora = decode_reads(cr, "chr_t", s, e, keep_seq=True,
                               use_native=False)
            self._compare(nat, ora, (s, e))
            bam_rw = decode_reads(br, "chr_t", s, e, keep_seq=True)
            self._compare(nat, bam_rw, ("bam", s, e))

    def test_deferred_counts_only_matches_full(self, cram_fixture):
        """Two-phase CRAM decode (SNP path): counts-only pass must equal
        column_counts of a full decode, and finish(sites) must equal the
        one-shot site-filtered decode."""
        from nanocaller_tpu.io.cram import CramReader
        from nanocaller_tpu.io.native import native_available
        from nanocaller_tpu.pileup.engine import (column_counts, decode_reads,
                                                  deferred_decode)

        if not native_available():
            pytest.skip("native library unavailable")
        fa, bam_p, cram_p = cram_fixture
        cr = CramReader(cram_p, fasta=fa)
        dd = deferred_decode(cr, "chr_t", 0, 30000)
        assert dd is not None and type(dd).__name__ == "CramDeferredWindow"
        full = decode_reads(cr, "chr_t", 0, 30000, use_native=False)
        np.testing.assert_array_equal(dd.counts(0, 30000),
                                      column_counts(full, 0, 30000))
        sites = np.arange(5000, 25000, 997)
        got = dd.finish(sites)
        want = decode_reads(cr, "chr_t", 0, 30000, sites=sites,
                            use_native=False)
        self._compare(got, want, "deferred")

    def test_snp_candidates_cram_equals_bam(self, cram_fixture):
        """get_snp_candidates (which routes through the deferred path)
        must produce identical batches from CRAM and BAM inputs."""
        from nanocaller_tpu.io.cram import CramReader
        from nanocaller_tpu.io.fasta import FastaFile
        from nanocaller_tpu.pileup.snp_features import get_snp_candidates

        fa, bam_p, cram_p = cram_fixture
        chunk = {"chrom": "chr_t", "start": 1, "end": 30000}
        a = get_snp_candidates(CramReader(cram_p, fasta=fa), FastaFile(fa),
                               chunk, seq_type="ont")
        b = get_snp_candidates(BamReader(bam_p), FastaFile(fa), chunk,
                               seq_type="ont")
        assert len(a) == len(b) > 0
        for f in ("pos", "codes", "read_mask", "col_ref", "col_valid",
                  "center_ref", "dp", "freq", "fwd_dp", "rev_dp",
                  "sampled_depth", "nbr_counts"):
            np.testing.assert_array_equal(getattr(a, f), getattr(b, f))

    def test_native_site_filtered(self, cram_fixture):
        from nanocaller_tpu.io.cram import CramReader
        from nanocaller_tpu.io.native import native_available
        from nanocaller_tpu.pileup.engine import decode_reads

        if not native_available():
            pytest.skip("native library unavailable")
        fa, bam_p, cram_p = cram_fixture
        cr = CramReader(cram_p, fasta=fa)
        sites = np.arange(5000, 25000, 997)
        nat = decode_reads(cr, "chr_t", 0, 30000, sites=sites)
        ora = decode_reads(cr, "chr_t", 0, 30000, sites=sites,
                           use_native=False)
        self._compare(nat, ora, "sites")
        assert len(nat.ev_pos) > 0
        assert set(np.unique(nat.ev_pos)) <= set(sites.tolist())
