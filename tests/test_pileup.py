import numpy as np
import pytest

from nanocaller_tpu.io.bam import BamReader
from nanocaller_tpu.io.fasta import FastaFile
from nanocaller_tpu.pileup.engine import (
    SiteCodes,
    column_counts,
    decode_reads,
    _ragged_arange,
)
from nanocaller_tpu.pileup.snp_features import (
    BAND_SCHEDULES,
    CENTER,
    WIDTH,
    SnpBatch,
    assemble_matrices_np,
    get_snp_candidates,
    select_neighbors,
)

from fixtures import make_fixture


def brute_force_pileup(reads, start, end):
    """Direct per-read pileup: returns {pos: {qname: code}} and del spans."""
    code_map = {"A": 0, "G": 1, "T": 2, "C": 3}
    cols = {}
    for qname, pos, seq, cigar, hap in reads:
        rpos, qpos = pos, 0
        for op, l in cigar:
            if op == "M":
                for k in range(l):
                    p = rpos + k
                    if start <= p < end:
                        cols.setdefault(p, {})[qname] = code_map.get(seq[qpos + k], 4)
                rpos += l
                qpos += l
            elif op == "I":
                qpos += l
            elif op == "D":
                for k in range(l):
                    p = rpos + k
                    if start <= p < end:
                        cols.setdefault(p, {})[qname] = "DEL"
                rpos += l
            elif op == "S":
                qpos += l
    return cols


class TestEngine:
    def test_ragged_arange(self):
        out = _ragged_arange(np.array([3, 1, 2]))
        assert out.tolist() == [0, 1, 2, 0, 0, 1]

    def test_column_counts_vs_bruteforce(self, tmp_path):
        fasta, bam, ref_seq, snps = make_fixture(
            tmp_path, depth=15, L=3000, indels=[(1000, "del", 5, "het1"), (2000, "ins", "TTT", "hom")]
        )
        rd = BamReader(bam)
        rw = decode_reads(rd, "chr_t", 0, 3000)
        counts = column_counts(rw, 0, 3000)

        # brute force from the BAM itself
        reads = []
        for r in BamReader(bam):
            cig = [("MIDNSHP=X"[op], l) for op, l in r.cigar]
            reads.append((r.qname, r.pos, r.seq, cig, 0))
        cols = brute_force_pileup(reads, 0, 3000)
        for p in (0, 500, 999, 1000, 1002, 1500, 2000, 2999):
            entries = cols.get(p, {})
            n_del = sum(1 for v in entries.values() if v == "DEL")
            n_al = len(entries) - n_del
            assert counts[p, :5].sum() == n_al, p
            assert counts[p, 5] == n_del, p
            for b in range(4):
                assert counts[p, b] == sum(1 for v in entries.values() if v == b), (p, b)

    def test_site_codes(self, tmp_path):
        fasta, bam, ref_seq, snps = make_fixture(tmp_path, depth=12, L=2500,
                                                 indels=[(700, "del", 4, "hom")])
        rd = BamReader(bam)
        rw = decode_reads(rd, "chr_t", 0, 2500)
        sites = np.array([100, 701, 702, 1500, 2400])
        sc = SiteCodes(rw, sites)
        reads = []
        for r in BamReader(bam):
            cig = [("MIDNSHP=X"[op], l) for op, l in r.cigar]
            reads.append((r.qname, r.pos, r.seq, cig, 0))
        cols = brute_force_pileup(reads, 0, 2500)
        for i, p in enumerate(sites):
            rids, codes = sc.at(i)
            got = {rw.qnames[rid]: int(c) for rid, c in zip(rids, codes)}
            want = {q: (4 if v == "DEL" else v) for q, v in cols.get(int(p), {}).items()}
            assert got == want, p


def ref_get_cnd_pos(v_pos, cnd_pos, seq):
    """Independent spec transcription of get_cnd_pos (generate_SNP_pileups.py:6-101)."""
    w = {"ont": 50000, "short_ont": 50000, "ul_ont": 100000,
         "ul_ont_extreme": 300000, "pacbio": 20000}[seq]
    ls = cnd_pos[np.abs(cnd_pos - v_pos) < w]
    spec = {
        "ont": ([(-2000, 0, 2, 0), (-5000, -2000, 3, 1), (-10000, -5000, 4, 1),
                 (-20000, -10000, 5, 1), (None, -20000, 6, 1)],
                [(0, 2000, 2, 1), (2000, 5000, 3, 0), (5000, 10000, 4, 0),
                 (10000, 20000, 5, 0), (20000, None, 6, 0)]),
        "short_ont": ([(-2000, 0, 5, 1), (-5000, -2000, 10, 1), (None, -5000, 5, 1)],
                      [(0, 2000, 5, 0), (2000, 5000, 10, 0), (5000, None, 5, 0)]),
        "ul_ont": ([(-2000, 0, 2, 0), (-5000, -2000, 2, 1), (-10000, -5000, 3, 1),
                    (-20000, -10000, 3, 1), (-40000, -20000, 4, 1),
                    (-50000, -40000, 3, 1), (None, -50000, 3, 1)],
                   [(0, 2000, 2, 1), (2000, 5000, 2, 0), (5000, 10000, 3, 0),
                    (10000, 20000, 3, 0), (20000, 40000, 4, 0),
                    (40000, 50000, 3, 0), (50000, None, 3, 0)]),
        "ul_ont_extreme": ([(-10000, 0, 2, 0), (-20000, -10000, 2, 1),
                            (-50000, -20000, 3, 1), (-75000, -50000, 3, 1),
                            (-100000, -75000, 4, 1), (-200000, -100000, 4, 1),
                            (None, -200000, 2, 1)],
                           [(0, 10000, 2, 1), (10000, 20000, 2, 0),
                            (20000, 50000, 3, 0), (50000, 75000, 3, 0),
                            (75000, 100000, 4, 0), (100000, 200000, 4, 0),
                            (200000, None, 2, 0)]),
        "pacbio": ([(-2000, 0, 4, 0), (-5000, -2000, 5, 1), (-10000, -5000, 5, 1),
                    (None, -10000, 6, 1)],
                   [(0, 2000, 4, 1), (2000, 5000, 5, 0), (5000, 10000, 5, 0),
                    (10000, None, 6, 0)]),
    }
    left_bands, right_bands = spec[seq]
    left = []
    for lo, hi, k, last in left_bands:
        band = [p for p in ls
                if (lo is None or p >= v_pos + lo) and p < v_pos + hi]
        left += band[-k:] if last else band[:k]
    right = []
    for lo, hi, k, last in right_bands:
        band = [p for p in ls
                if p > v_pos + lo and (hi is None or p <= v_pos + hi)]
        right += band[-k:] if last else band[:k]
    return sorted(left), sorted(right)


class TestNeighborSelection:
    @pytest.mark.parametrize("seq", list(BAND_SCHEDULES))
    def test_matches_reference_spec(self, seq):
        rng = np.random.default_rng(11)
        nbr = np.unique(rng.integers(0, 800_000, size=3000))
        cands = np.sort(rng.choice(nbr, size=100, replace=False))
        idx_mat, n_left, n_right = select_neighbors(cands, nbr, seq)
        for i, v in enumerate(cands):
            want_l, want_r = ref_get_cnd_pos(int(v), nbr, seq)
            got_cols = idx_mat[i]
            got_l = [int(nbr[j]) for j in got_cols[:CENTER] if j >= 0]
            got_r = [int(nbr[j]) for j in got_cols[CENTER + 1 :] if j >= 0]
            assert got_l == want_l, (seq, v)
            assert got_r == want_r, (seq, v)
            assert n_left[i] == len(want_l) and n_right[i] == len(want_r)
            # alignment: left block ends at column 19
            filled = [w for w in range(CENTER) if got_cols[w] >= 0]
            if filled:
                assert filled == list(range(CENTER - len(want_l), CENTER))

    def test_sparse_and_empty(self):
        nbr = np.array([100, 200, 100000])
        idx_mat, nl, nr = select_neighbors(np.array([150]), nbr, "ont")
        got = [int(nbr[j]) for j in idx_mat[0] if j >= 0]
        assert got == [100, 200]
        idx_mat, nl, nr = select_neighbors(np.array([500_000]), nbr, "ont")
        assert nl[0] == 0 and nr[0] == 0


def reference_matrix(tmp_mat, ls1_len, ls2_len, total_rlist, center_ref):
    """Direct transcription of generate_SNP_pileups.py:221-254 for testing."""
    mat = np.dstack(
        [np.sum(np.eye(5)[tmp_mat[tmp_mat[:, ls1_len] == i]], axis=0) for i in range(4)]
    ).transpose(2, 0, 1)[:, :, :4]
    total_ref = np.eye(5)[total_rlist.astype(int)]
    total_ref[:, 4] = 0
    total_ref = total_ref[np.newaxis, :]
    mat = np.dstack([mat, np.zeros([4, mat.shape[1]]) + np.eye(4)[center_ref][:, np.newaxis]])
    data = np.vstack([total_ref, np.multiply(mat, 1 - 2 * total_ref)])
    data = np.hstack(
        [np.zeros([5, 20 - ls1_len, 5]), data, np.zeros([5, 20 - ls2_len, 5])]
    )
    return data.astype(np.float32)


class TestTensorAssembly:
    def test_matches_reference_formula(self):
        rng = np.random.default_rng(5)
        B = 7
        for trial in range(B):
            R = int(rng.integers(3, 40))
            ls1 = int(rng.integers(0, 21))
            ls2 = int(rng.integers(0, 21))
            W = ls1 + 1 + ls2
            tmp = rng.integers(0, 5, size=(R, W)).astype(np.int64)
            rlist = rng.integers(0, 4, size=W)
            center_ref = int(rlist[ls1])
            want = reference_matrix(tmp, ls1, ls2, rlist, center_ref)

            codes = np.full((1, R, WIDTH), 4, np.int8)
            codes[0, :, CENTER - ls1 : CENTER + 1 + ls2] = tmp
            col_ref = np.full((1, WIDTH), 4, np.int8)
            col_ref[0, CENTER - ls1 : CENTER + 1 + ls2] = rlist
            col_valid = np.zeros((1, WIDTH), bool)
            col_valid[0, CENTER - ls1 : CENTER + 1 + ls2] = True
            batch = SnpBatch(
                contig="x",
                pos=np.array([0]),
                codes=codes,
                read_mask=np.ones((1, R), bool),
                col_ref=col_ref,
                col_valid=col_valid,
                center_ref=np.array([center_ref], np.int8),
                dp=np.array([R], np.int32),
                freq=np.zeros(1, np.float32),
                fwd_dp=np.zeros((1, 4), np.int32),
                rev_dp=np.zeros((1, 4), np.int32),
                sampled_depth=np.array([R], np.int32),
                nbr_counts=np.array([W], np.int32),
            )
            got = assemble_matrices_np(batch)[0]
            np.testing.assert_allclose(got, want, atol=1e-6, err_msg=str(trial))


class TestEndToEndScan:
    def test_candidates_found_at_planted_snps(self, tmp_path):
        fasta_p, bam_p, ref_seq, snps = make_fixture(tmp_path, depth=30, L=6000)
        bam = BamReader(bam_p)
        fasta = FastaFile(fasta_p)
        chunk = {"chrom": "chr_t", "start": 1, "end": 6000}
        batch = get_snp_candidates(bam, fasta, chunk, seq_type="ont",
                                   mincov=4, maxcov=160)
        got_pos = set(batch.pos.tolist())
        planted = {p for p, alt, gt in snps}
        # every planted SNP with adequate coverage should be a candidate
        missing = {p for p in planted if 300 < p < 5700} - got_pos
        assert not missing, missing
        # frequencies sane: hom ~1.0, het ~0.5
        for i, p in enumerate(batch.pos):
            if int(p) in planted:
                assert batch.freq[i] > 0.3
        assert batch.coverage > 10
        # center column of matrix is populated
        mats = assemble_matrices_np(batch)
        assert mats.shape[1:] == (5, 41, 5)
        assert np.abs(mats[:, 1:, CENTER, :4]).sum() > 0

    def test_haploid_threshold(self, tmp_path):
        fasta_p, bam_p, ref_seq, snps = make_fixture(tmp_path, depth=30, L=6000)
        bam = BamReader(bam_p)
        fasta = FastaFile(fasta_p)
        chunk = {"chrom": "chr_t", "start": 1, "end": 6000}
        b = get_snp_candidates(bam, fasta, chunk, ploidy="haploid")
        assert len(b) > 0
