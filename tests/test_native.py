"""Differential tests: C++ decoder (libncio) vs the pure-Python oracle."""

import numpy as np
import pytest

from nanocaller_tpu.io.bam import BamReader
from nanocaller_tpu.io.native import native_available
from nanocaller_tpu.pileup.engine import decode_reads

from fixtures import make_fixture

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native toolchain unavailable")


@pytest.fixture(scope="module")
def bam_fixture(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("native")
    indels = [(1000, "del", 5, "het1"), (2000, "ins", "TTT", "hom"),
              (3000, "ins", "GGGGGGGGG", "het2")]
    return make_fixture(tmp, depth=25, L=5000, read_len=700, seed=77,
                        indels=indels, tag_haplotypes=True, error_rate=0.02)


def assert_windows_equal(a, b):
    assert a.qnames == b.qnames
    for f in ("flags", "strand", "read_start", "read_end", "hp", "ps",
              "ev_rid", "ev_pos", "ev_code", "ev_qpos",
              "del_rid", "del_start", "del_len",
              "ins_rid", "ins_pos", "ins_len"):
        np.testing.assert_array_equal(
            getattr(a, f), getattr(b, f), err_msg=f)
    assert a.seqs == b.seqs


class TestNativeDecode:
    @pytest.mark.parametrize("window", [(0, 5000), (1200, 1300), (2950, 3050),
                                        (4400, 5000)])
    def test_matches_python(self, bam_fixture, window):
        fasta_p, bam_p, _, _ = bam_fixture
        bam = BamReader(bam_p)
        start, end = window
        py = decode_reads(bam, "chr_t", start, end, keep_seq=True,
                          use_native=False)
        nat = decode_reads(bam, "chr_t", start, end, keep_seq=True,
                           use_native=True)
        assert nat.n_reads == py.n_reads and nat.n_reads > 0
        assert_windows_equal(nat, py)

    def test_without_index(self, bam_fixture):
        fasta_p, bam_p, _, _ = bam_fixture
        bam_noidx = BamReader(bam_p, index_path="/nonexistent")
        py = decode_reads(bam_noidx, "chr_t", 500, 1500, use_native=False)
        nat = decode_reads(bam_noidx, "chr_t", 500, 1500, use_native=True)
        assert_windows_equal(nat, py)

    def test_counts_cache_matches_python(self, bam_fixture):
        from nanocaller_tpu.pileup.engine import column_counts

        fasta_p, bam_p, _, _ = bam_fixture
        bam = BamReader(bam_p)
        nat = decode_reads(bam, "chr_t", 100, 4900, use_native=True)
        assert nat.counts_cache is not None
        py = decode_reads(bam, "chr_t", 100, 4900, use_native=False)
        want = column_counts(py, 100, 4900)
        got = column_counts(nat, 100, 4900)
        np.testing.assert_array_equal(got, want)
        # sub-window slice of the cache
        np.testing.assert_array_equal(
            column_counts(nat, 1000, 2000), column_counts(py, 1000, 2000))

    def test_sites_filtered_decode(self, bam_fixture):
        """Site-filtered decode (used by whole-contig phasing) must yield
        exactly the events at the requested sites, in both native and
        oracle paths, with identical content to the full decode."""
        fasta_p, bam_p, _, _ = bam_fixture
        bam = BamReader(bam_p)
        sites = np.array([500, 1000, 1500, 2999, 3001, 4800], np.int64)
        full = decode_reads(bam, "chr_t", 0, 5000, use_native=False)
        nat = decode_reads(bam, "chr_t", 0, 5000, sites=sites)
        py = decode_reads(bam, "chr_t", 0, 5000, sites=sites,
                          use_native=False)
        assert_windows_equal(nat, py)
        # events == full decode restricted to sites
        keep = np.isin(full.ev_pos, sites)
        np.testing.assert_array_equal(nat.ev_pos, full.ev_pos[keep])
        np.testing.assert_array_equal(nat.ev_rid, full.ev_rid[keep])
        np.testing.assert_array_equal(nat.ev_code, full.ev_code[keep])
        np.testing.assert_array_equal(nat.ev_qpos, full.ev_qpos[keep])
        assert len(nat.ev_pos) < len(full.ev_pos) / 10

    def test_deferred_decode_matches_site_filtered(self, bam_fixture):
        """Two-phase deferred decode (SNP path): counts must match the
        inline-counts decode and finish(sites) must equal the one-shot
        site-filtered decode field for field."""
        from nanocaller_tpu.pileup.engine import column_counts, deferred_decode

        fasta_p, bam_p, _, _ = bam_fixture
        bam = BamReader(bam_p)
        sites = np.array([500, 1000, 1500, 2999, 3001, 4800], np.int64)
        dd = deferred_decode(bam, "chr_t", 0, 5000)
        assert dd is not None
        py = decode_reads(bam, "chr_t", 0, 5000, use_native=False)
        np.testing.assert_array_equal(dd.counts(0, 5000),
                                      column_counts(py, 0, 5000))
        got = dd.finish(sites)
        want = decode_reads(bam, "chr_t", 0, 5000, sites=sites,
                            use_native=False)
        assert_windows_equal(got, want)

    def test_deferred_decode_empty_sites_and_close(self, bam_fixture):
        from nanocaller_tpu.pileup.engine import deferred_decode

        fasta_p, bam_p, _, _ = bam_fixture
        bam = BamReader(bam_p)
        dd = deferred_decode(bam, "chr_t", 0, 5000)
        got = dd.finish(np.zeros(0, np.int64))
        assert len(got.ev_pos) == 0 and got.n_reads > 0
        dd2 = deferred_decode(bam, "chr_t", 0, 5000)
        dd2.close()  # early abandon (no candidates) must not leak/crash
        dd2.close()

    def test_truncated_bam_rejected_at_open(self, bam_fixture, tmp_path):
        """A BAM missing its BGZF EOF marker (truncated / still being
        written) must fail loudly at open — a partial pileup would mean
        silently wrong calls."""
        fasta_p, bam_p, _, _ = bam_fixture
        data = open(bam_p, "rb").read()
        trunc = str(tmp_path / "trunc.bam")
        with open(trunc, "wb") as fh:
            fh.write(data[: int(len(data) * 0.6)])
        with pytest.raises(ValueError, match="truncated"):
            BamReader(trunc)

    def test_haplotag_native_matches_python_writer(self, bam_fixture,
                                                    tmp_path):
        """C++ haplotag artifact must carry the same records (qname, pos,
        flag, cigar, seq, HP/PS) as the Python BamWriter path and be
        region-fetchable through its BAI."""
        from nanocaller_tpu.caller import write_haplotagged_bam
        from nanocaller_tpu.io.native import haplotag_native

        fasta_p, bam_p, _, _ = bam_fixture
        bam = BamReader(bam_p)
        reads = list(bam.fetch("chr_t", 0, 5000))
        tags = {}
        for i, r in enumerate(reads[::2]):
            tags[r.qname] = (1 + (i % 2), 100 + 70000 * (i % 3))  # c/s/i PS
        nat_p = str(tmp_path / "nat.phased.bam")
        py_p = str(tmp_path / "py.phased.bam")
        assert haplotag_native(bam, nat_p, "chr_t", 0, 5000, tags)
        write_haplotagged_bam(BamReader(bam_p), py_p, "chr_t", 0, 5000, tags)

        nat = list(BamReader(nat_p).fetch("chr_t", 0, 5000))
        py = list(BamReader(py_p).fetch("chr_t", 0, 5000))
        assert len(nat) == len(py) == len(reads)
        for a, b in zip(nat, py):
            assert (a.qname, a.pos, a.flag, a.cigar, a.seq) == \
                (b.qname, b.pos, b.flag, b.cigar, b.seq)
            assert a.tags.get("HP") == b.tags.get("HP")
            assert a.tags.get("PS") == b.tags.get("PS")
            if a.qname in tags:
                assert (a.tags["HP"], a.tags["PS"]) == tags[a.qname]
        # BAI-backed sub-region fetch agrees with the python artifact
        sub_n = [r.qname for r in BamReader(nat_p).fetch("chr_t", 2000, 2500)]
        sub_p = [r.qname for r in BamReader(py_p).fetch("chr_t", 2000, 2500)]
        assert sub_n == sub_p and len(sub_n) > 0
        # native decoder consumes the artifact too (indel workers do this)
        nat_rw = decode_reads(BamReader(nat_p), "chr_t", 0, 5000)
        py_rw = decode_reads(BamReader(py_p), "chr_t", 0, 5000)
        np.testing.assert_array_equal(nat_rw.hp, py_rw.hp)
        np.testing.assert_array_equal(nat_rw.ps, py_rw.ps)

    def test_phasing_same_result_with_site_decode(self, bam_fixture):
        from nanocaller_tpu.phase.mec import phase_sites

        fasta_p, bam_p, ref_seq, _ = bam_fixture
        bam = BamReader(bam_p)
        rng = np.random.default_rng(0)
        sites = np.sort(rng.choice(np.arange(200, 4800), 20, replace=False)
                        ).astype(np.int64)
        refc = rng.integers(0, 4, len(sites)).astype(np.int8)
        altc = ((refc + 1) % 4).astype(np.int8)
        full = decode_reads(bam, "chr_t", 0, 5000)
        filt = decode_reads(bam, "chr_t", 0, 5000, sites=sites)
        a = phase_sites(full, sites, refc, altc)
        b = phase_sites(filt, sites, refc, altc)
        np.testing.assert_array_equal(a.hap_allele, b.hap_allele)
        np.testing.assert_array_equal(a.block_ps, b.block_ps)
        np.testing.assert_array_equal(a.read_hp, b.read_hp)

    def test_nw_batch_matches_numpy(self):
        from nanocaller_tpu.align.nw import _codes, nw_align, score_alignment
        from nanocaller_tpu.io.native import nw_batch_native
        from test_align import rand_seq

        rng = np.random.default_rng(13)
        pairs = []
        for _ in range(40):
            r = rand_seq(rng, int(rng.integers(5, 200)))
            q = list(r)
            for _ in range(int(rng.integers(0, 6))):
                p = int(rng.integers(0, max(1, len(q) - 6)))
                k = rng.integers(0, 3)
                if k == 0:
                    q[p] = rand_seq(rng, 1)
                elif k == 1:
                    q.insert(p, rand_seq(rng, int(rng.integers(1, 5))))
                else:
                    del q[p : p + int(rng.integers(1, 5))]
            pairs.append(("".join(q), r))
        pairs.append(("", rand_seq(rng, 10)))
        pairs.append((rand_seq(rng, 10), ""))
        # (20,-10,9,1)/(5,-4,8,1) run the 16-lane int16 SIMD cohorts;
        # (500,-500,250,9) exceeds the int16 range guard and must route
        # every pair through the scalar kernel — identical either way
        for params in ((20, -10, 9, 1), (5, -4, 8, 1), (500, -500, 250, 9)):
            m, x, go, ge = params
            out = nw_batch_native([_codes(q) for q, _ in pairs],
                                  [_codes(r) for _, r in pairs], m, x, go, ge)
            assert out is not None
            cigars, scores = out
            for k, (q, r) in enumerate(pairs):
                want_s, want_c = nw_align(q, r, match=m, mismatch=x,
                                          gap_open=go, gap_extend=ge)
                assert cigars[k] == want_c, (params, k, q, r)
                assert scores[k] == want_s

    def test_no_seq_mode(self, bam_fixture):
        fasta_p, bam_p, _, _ = bam_fixture
        bam = BamReader(bam_p)
        nat = decode_reads(bam, "chr_t", 0, 5000, keep_seq=False)
        assert nat.seqs == []
        assert nat.n_reads > 0


class TestParallelDecode:
    """decode_reads_parallel (threaded split whole-contig decode) must
    be identical to the single-window decode: same read set, order, id
    space, events."""

    @pytest.mark.parametrize("n_parts", [2, 3])
    def test_split_identical(self, bam_fixture, n_parts):
        from nanocaller_tpu.pileup.engine import decode_reads_parallel

        fasta_p, bam_p, _, _ = bam_fixture
        bam = BamReader(bam_p)
        sites = np.arange(40, 5000, 37, dtype=np.int64)
        single = decode_reads(bam, "chr_t", 0, 5000, sites=sites)
        split = decode_reads_parallel(bam, "chr_t", 0, 5000, sites=sites,
                                      min_span=1, n_parts=n_parts)
        assert_windows_equal(split, single)

    def test_split_keep_seq(self, bam_fixture):
        from nanocaller_tpu.pileup.engine import decode_reads_parallel

        fasta_p, bam_p, _, _ = bam_fixture
        bam = BamReader(bam_p)
        single = decode_reads(bam, "chr_t", 100, 4700, keep_seq=True)
        split = decode_reads_parallel(bam, "chr_t", 100, 4700,
                                      keep_seq=True, min_span=1)
        assert_windows_equal(split, single)

    def test_small_window_falls_back(self, bam_fixture):
        from nanocaller_tpu.pileup.engine import decode_reads_parallel

        fasta_p, bam_p, _, _ = bam_fixture
        bam = BamReader(bam_p)
        single = decode_reads(bam, "chr_t", 0, 2000)
        out = decode_reads_parallel(bam, "chr_t", 0, 2000)  # < min_span
        assert_windows_equal(out, single)


class TestNativeMsaProject:
    """C++ star-MSA column projection vs the numpy oracle (bit-identical:
    float32 division order replicated, first-max argmax consensus)."""

    def test_differential_random(self):
        import numpy as np

        from nanocaller_tpu.align.msa import (MSA_GAP_EXTEND, MSA_GAP_OPEN,
                                              MSA_MATCH, MSA_MISMATCH,
                                              star_msa_from_cigars)
        from nanocaller_tpu.align.nw import nw_align
        from nanocaller_tpu.io.native import native_available

        if not native_available():
            import pytest

            pytest.skip("native library unavailable")
        rng = np.random.default_rng(7)

        def mutate(ref, sub=0.06, ind=0.05):
            out = []
            for ch in ref:
                r = rng.random()
                if r < sub:
                    out.append("ACGT"[rng.integers(4)])
                elif r < sub + ind / 2:
                    pass
                elif r < sub + ind:
                    out.append(ch)
                    out.append("ACGT"[rng.integers(4)])
                else:
                    out.append(ch)
            return "".join(out)

        for trial in range(25):
            L = int(rng.integers(40, 200))  # spans >128-column truncation
            ref = "".join(rng.choice(list("ACGT"), L))
            seqs = [mutate(ref) for _ in range(int(rng.integers(2, 30)))]
            if trial % 5 == 0:
                seqs[0] = seqs[0][:8] + "N" * 3 + seqs[0][11:]
            cigars = [nw_align(s, ref, match=MSA_MATCH,
                               mismatch=MSA_MISMATCH, gap_open=MSA_GAP_OPEN,
                               gap_extend=MSA_GAP_EXTEND)[1] for s in seqs]
            a = star_msa_from_cigars(seqs, cigars, ref, 2, use_native=True)
            b = star_msa_from_cigars(seqs, cigars, ref, 2, use_native=False)
            assert np.array_equal(a[2], b[2]), trial
            assert a[3] == b[3], trial  # consensus
            assert a[4] == b[4], trial  # de-gapped ref


class TestSeqlessReads:
    """SEQ '*' (l_seq=0 with a real CIGAR) is spec-legal (SAM §1.4):
    both decoders must skip such reads identically — they carry no base
    data for pileups — without flagging the window as corrupt."""

    def test_both_decoders_skip_seqless(self, tmp_path):
        from nanocaller_tpu.io.bam import AlignedRead, BamReader, BamWriter

        path = str(tmp_path / "s.bam")
        with BamWriter(path, ["chr_t"], [5000]) as w:
            w.write(AlignedRead("withseq", 0, 0, 100, 60, [(0, 50)],
                                "A" * 50, np.full(50, 30, np.uint8), {}))
            w.write(AlignedRead("noseq", 0, 0, 120, 60, [(0, 50)],
                                "", np.zeros(0, np.uint8), {}))
        bam = BamReader(path)
        nat = decode_reads(bam, "chr_t", 0, 5000, keep_seq=True)
        py = decode_reads(bam, "chr_t", 0, 5000, keep_seq=True,
                          use_native=False)
        assert nat.qnames == ["withseq"]
        assert py.qnames == ["withseq"]
        assert_windows_equal_rw(nat, py)


def assert_windows_equal_rw(a, b):
    assert a.qnames == b.qnames
    np.testing.assert_array_equal(a.ev_pos, b.ev_pos)
    np.testing.assert_array_equal(a.ev_code, b.ev_code)
    np.testing.assert_array_equal(a.ev_qpos, b.ev_qpos)
    np.testing.assert_array_equal(a.read_start, b.read_start)
    np.testing.assert_array_equal(a.read_end, b.read_end)
