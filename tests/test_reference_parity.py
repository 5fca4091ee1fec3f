"""Differential parity: run the REFERENCE feature generator unmodified
(via the pysam shim) against our vectorized implementation on identical
inputs, and require identical candidate sets and tensors.

This is the strongest available parity evidence in an environment with
no real pysam/HG002 data: the reference's own Python code executes its
per-column logic over our I/O stack, and every derived quantity is
diffed bit-for-bit (tensor) / exactly (positions, depths, freqs,
strand-split depths).
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

REF_SRC = "/root/reference/nanocaller_src/generate_SNP_pileups.py"
pytestmark = pytest.mark.skipif(not os.path.exists(REF_SRC),
                                reason="reference sources unavailable")

from nanocaller_tpu.io.bam import BamReader
from nanocaller_tpu.io.fasta import FastaFile
from nanocaller_tpu.pileup.snp_features import (
    assemble_matrices_np,
    get_snp_candidates,
)

from fixtures import make_fixture


class _FakeIntervalModule:
    class Interval:
        def __init__(self, begin, end, data=None):
            self.begin = begin
            self.end = end

    class IntervalTree:
        def __init__(self, intervals=()):
            self._ivs = list(intervals)

        def overlaps(self, pos):
            return any(iv.begin <= pos < iv.end for iv in self._ivs)


@pytest.fixture(scope="module")
def reference_module():
    import pysam_shim

    sys.modules["pysam"] = pysam_shim
    sys.modules["intervaltree"] = _FakeIntervalModule
    spec = importlib.util.spec_from_file_location("ref_snp_pileups", REF_SRC)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def parity_fixture(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("refparity")
    # depth safely below maxcov so the reference's unseeded downsampling
    # branch (its only nondeterminism) never triggers
    return make_fixture(tmp, depth=30, L=20000, read_len=2500, seed=42,
                        error_rate=0.06)


@pytest.mark.parametrize("seq_type", ["ont", "short_ont", "ul_ont",
                                      "ul_ont_extreme", "pacbio"])
@pytest.mark.parametrize("window", [(1, 20000), (4001, 9000)])
def test_snp_candidates_and_tensors_identical(reference_module,
                                              parity_fixture, seq_type,
                                              window):
    fasta_p, bam_p, ref_seq, snps = parity_fixture
    start, end = window
    dct = {
        "exclude_bed": None,
        "sam_path": bam_p,
        "fasta_path": fasta_p,
        "threshold": [0.4, 0.6],
        "mincov": 4,
        "maxcov": 160,
        "min_allele_freq": 0.15,
        "min_nbr_sites": 1,
        "seq": seq_type,
        "supplementary": False,
    }
    region = {"chrom": "chr_t", "start": start, "end": end,
              "ploidy": "diploid"}
    (r_pos, r_ref, r_mat, r_dp, r_freq, r_depth,
     r_fwd, r_rev) = reference_module.get_snp_testing_candidates(dct, region)

    bam = BamReader(bam_p)
    fasta = FastaFile(fasta_p)
    batch = get_snp_candidates(
        bam, fasta, region, seq_type=seq_type, mincov=4, maxcov=160,
        min_allele_freq=0.15, min_nbr_sites=1, threshold=(0.4, 0.6))

    assert len(r_pos) > 5, "fixture produced too few reference candidates"
    # candidate positions (reference is 1-based)
    np.testing.assert_array_equal(np.asarray(r_pos), batch.pos + 1)
    # per-candidate scalars
    np.testing.assert_array_equal(np.asarray(r_dp), batch.dp)
    np.testing.assert_allclose(np.asarray(r_freq), batch.freq, atol=1e-9)
    # strand-split depths
    np.testing.assert_array_equal(np.asarray(r_fwd), batch.fwd_dp)
    np.testing.assert_array_equal(np.asarray(r_rev), batch.rev_dp)
    # region coverage scalar
    assert abs(r_depth - batch.coverage) < 1e-9
    # reference one-hot
    ours_ref = np.eye(4)[batch.center_ref.astype(int)]
    np.testing.assert_array_equal(np.asarray(r_ref), ours_ref)
    # THE tensors
    ours_mat = assemble_matrices_np(batch)
    np.testing.assert_array_equal(np.asarray(r_mat).astype(np.float32),
                                  ours_mat)


class _FakeParasail:
    @staticmethod
    def matrix_create(*a, **k):
        return None

    @staticmethod
    def nw_trace(*a, **k):
        raise NotImplementedError


@pytest.fixture(scope="module")
def reference_indel_module():
    import pysam_shim

    sys.modules["pysam"] = pysam_shim
    sys.modules["intervaltree"] = _FakeIntervalModule
    sys.modules["parasail"] = _FakeParasail
    path = "/root/reference/nanocaller_src/generate_indel_pileups.py"
    spec = importlib.util.spec_from_file_location("ref_indel_pileups", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_indel_candidate_scan_parity(reference_indel_module, tmp_path_factory):
    """The sliding-window distinct-read indel scan (the subtlest
    vectorization, SURVEY.md §7.4.6): run the reference's pass 1
    unmodified with a recording MSA stub and require the identical
    candidate anchor set."""
    tmp = tmp_path_factory.mktemp("indelscan")
    indels = [(3000, "del", 6, "het1"), (7000, "ins", "TTTTT", "hom"),
              (11000, "ins", "GATC", "het2"), (15000, "del", 4, "het2")]
    fasta_p, bam_p, ref_seq, _ = make_fixture(
        tmp, depth=30, L=20000, read_len=2500, seed=11, snps=[],
        indels=indels, tag_haplotypes=True, error_rate=0.02)

    mod = reference_indel_module
    recorded = []
    recorded_windows = []
    def recording_msa(seq_list, ref, v_pos, mincov, maxcov):
        recorded.append(int(v_pos))
        recorded_windows.append((int(v_pos), dict(seq_list), ref))
        return (0, 0, None, None, None)
    orig_msa = mod.msa
    mod.msa = recording_msa
    try:
        dct = {"seq": "ont", "fasta_path": fasta_p, "win_size": 40,
               "small_win_size": 4, "mincov": 4, "maxcov": 160,
               "ins_t": 0.4, "del_t": 0.6, "exclude_bed": None,
               "supplementary": False, "impute_indel_phase": False}
        chunk = {"chrom": "chr_t", "start": 1, "end": 20000,
                 "sam_path": bam_p}
        mod.get_indel_testing_candidates(dct, chunk)
    finally:
        mod.msa = orig_msa
    ref_candidates = sorted(set(recorded))
    assert len(ref_candidates) >= len(indels)

    from nanocaller_tpu.pileup.engine import decode_reads
    from nanocaller_tpu.pileup.indel_features import scan_indel_candidates

    bam = BamReader(bam_p)
    rw = decode_reads(bam, "chr_t", 0, 20000, keep_seq=True)
    variants, extra = scan_indel_candidates(
        rw, np.arange(0, 20000), win_size=40, small_win_size=4, mincov=4,
        ins_t=0.4, del_t=0.6)
    ours = sorted(v + 1 for v in variants)
    assert ours == ref_candidates

    # window extraction parity: the reference's per-candidate read
    # windows (hap0/hap1/all, incl. deletion-spanning reads via
    # query_position_or_next) must match extract_candidate_windows
    from nanocaller_tpu.pileup.indel_features import (
        _ColumnView, extract_candidate_windows)

    cview = _ColumnView(rw)
    hap1_set = set(np.flatnonzero(rw.hp == 1).tolist())
    hap2_set = set(np.flatnonzero(rw.hp == 2).tolist())
    # reference msa() calls per candidate: hap0, hap1, then all-reads
    by_cand = {}
    for v1, seqs, ref_win in recorded_windows:
        by_cand.setdefault(v1, []).append((seqs, ref_win))
    checked = 0
    for v1, calls in by_cand.items():
        assert len(calls) == 3
        d, _ = extract_candidate_windows(rw, cview, v1 - 1, 160,
                                         hap1_set, hap2_set)
        assert calls[0][0] == d["h0"], v1
        assert calls[1][0] == d["h1"], v1
        assert calls[2][0] == d["tot"], v1
        checked += 1
    assert checked == len(ref_candidates)


@pytest.fixture(scope="module")
def reference_haploid_indel_module():
    import pysam_shim

    sys.modules["pysam"] = pysam_shim
    sys.modules["intervaltree"] = _FakeIntervalModule
    sys.modules["parasail"] = _FakeParasail
    path = "/root/reference/nanocaller_src/generate_indel_pileups_haploid.py"
    spec = importlib.util.spec_from_file_location("ref_hap_indel", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_haploid_indel_candidate_scan_parity(reference_haploid_indel_module,
                                             tmp_path_factory):
    """Haploid scan (single read-set windows, total-coverage gate,
    generate_indel_pileups_haploid.py:184-244) vs our haploid=True scan."""
    tmp = tmp_path_factory.mktemp("hapscan")
    indels = [(2500, "del", 5, "hom"), (6000, "ins", "AACC", "hom"),
              (9500, "del", 7, "hom")]
    fasta_p, bam_p, ref_seq, _ = make_fixture(
        tmp, depth=28, L=12000, read_len=1800, seed=19, snps=[],
        indels=indels, error_rate=0.02)

    mod = reference_haploid_indel_module
    recorded = []
    def recording_msa(seq_list, ref, v_pos, mincov, maxcov):
        recorded.append(int(v_pos))
        return (0, 0, None, None, None)
    orig = mod.msa
    mod.msa = recording_msa
    try:
        dct = {"seq": "ont", "fasta_path": fasta_p, "win_size": 40,
               "small_win_size": 4, "mincov": 4, "maxcov": 160,
               "ins_t": 0.4, "del_t": 0.6, "exclude_bed": None,
               "supplementary": False}
        chunk = {"chrom": "chr_t", "start": 1, "end": 12000,
                 "sam_path": bam_p}
        mod.get_indel_testing_candidates_haploid(dct, chunk)
    finally:
        mod.msa = orig
    ref_candidates = sorted(set(recorded))
    assert len(ref_candidates) >= len(indels)

    from nanocaller_tpu.pileup.engine import decode_reads
    from nanocaller_tpu.pileup.indel_features import scan_indel_candidates

    bam = BamReader(bam_p)
    rw = decode_reads(bam, "chr_t", 0, 12000)
    variants, _ = scan_indel_candidates(
        rw, np.arange(0, 12000), win_size=40, small_win_size=4, mincov=4,
        ins_t=0.4, del_t=0.6, haploid=True)
    assert sorted(v + 1 for v in variants) == ref_candidates


@pytest.fixture(scope="module")
def reference_training_module():
    import pysam_shim

    sys.modules["pysam"] = pysam_shim
    sys.modules["intervaltree"] = _FakeIntervalModule
    path = "/root/reference/misc/training/generate_SNP_pileups.py"
    spec = importlib.util.spec_from_file_location("ref_train_pileups", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_snp_training_positive_examples_parity(reference_training_module,
                                               tmp_path_factory):
    """Run the reference TRAINING feature generator unmodified and diff
    the truth-site (positive) records — (gt, allele1, allele2, ref) labels
    and both neighbor-variant tensors — against our training generator.
    (Negative sampling uses unseeded RNG in the reference and is excluded.)
    """
    from nanocaller_tpu.io.vcf import VcfRecord, VcfWriter, VcfReader
    from nanocaller_tpu.io.bgzf import BgzfWriter
    from nanocaller_tpu.train.data import (
        generate_snp_training_examples, truth_snps)

    tmp = tmp_path_factory.mktemp("trainparity")
    fasta_p, bam_p, ref_seq, snps = make_fixture(
        tmp, depth=25, L=20000, read_len=2500, seed=5, error_rate=0.05)
    # truth VCF
    vcf_p = str(tmp / "truth.vcf.gz")
    hdr = ["##fileformat=VCFv4.2", "##contig=<ID=chr_t>",
           '##FORMAT=<ID=GT,Number=1,Type=String,Description="g">',
           "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS"]
    with VcfWriter(vcf_p, hdr) as w:
        for pos, alt, gt in snps:
            gt_str = "1/1" if gt == "hom" else "0/1"
            w.write(VcfRecord("chr_t", pos + 1, ref_seq[pos], alt, "50",
                              "PASS", format_="GT", samples=[gt_str]))
    # include bed = whole region; exclude bed = far-away dummy interval
    include_bed = str(tmp / "inc.bed.gz")
    with BgzfWriter(include_bed) as w:
        w.write("chr_t\t0\t20000\n")
    exclude_bed = str(tmp / "exc.bed.gz")
    with BgzfWriter(exclude_bed) as w:
        w.write("chr_t\t25000\t26000\n")

    start, end = 2001, 18000
    dct = {"chrom": "chr_t", "start": start, "end": end,
           "sam_path": bam_p, "fasta_path": fasta_p, "vcf_path": vcf_p,
           "include_bed": include_bed, "exclude_bed": exclude_bed,
           "threshold": [0.4, 0.6], "mincov": 8, "maxcov": 160,
           "seq": "ont", "type": "train"}
    pileup_list, _ = reference_training_module.get_snp_training_pileups(dct)
    ref_pos_records = pileup_list["pos"]
    assert len(ref_pos_records) >= 8  # ≥4 truth sites × 2 nbr variants

    # reference emits per truth site: (freq-nbr record, gtruth-nbr record)
    ref_by_key = {}
    seen = {}
    for v_pos, gt, a1, a2, rb, data in ref_pos_records:
        variant = seen.get(v_pos, 0)
        seen[v_pos] = variant + 1
        ref_by_key[(v_pos, variant)] = (gt, a1, a2, rb,
                                        np.asarray(data, dtype=np.int8))
    assert all(v == 2 for v in seen.values())

    from nanocaller_tpu.io.bam import BamReader
    from nanocaller_tpu.io.fasta import FastaFile

    bam = BamReader(bam_p)
    fasta = FastaFile(fasta_p)
    # truth must cover the ±50kb halo (matching the reference's
    # get_nbr fetch range incl. its off-by-one start+1 behavior)
    truth = truth_snps(VcfReader(vcf_p), "chr_t",
                       max(1, start - 50000) + 1, end + 50000)
    ex = generate_snp_training_examples(
        bam, fasta, truth, {"chrom": "chr_t", "start": start, "end": end},
        seq_type="ont", mincov=8, maxcov=160, nbr_threshold=(0.4, 0.6))

    # our records: first all sites with freq-nbrs (variant 0), then all
    # with truth-nbrs (variant 1); keep only truth-site entries
    ours_by_key = {}
    seen_ours = {}
    for k in range(len(ex["pos"])):
        p1 = int(ex["pos"][k]) + 1
        if (p1 - 1) not in truth:
            continue
        variant = seen_ours.get(p1, 0)
        seen_ours[p1] = variant + 1
        ours_by_key[(p1, variant)] = (
            int(ex["gt"][k]), int(ex["allele1"][k]), int(ex["allele2"][k]),
            int(ex["ref"][k]), ex["x"][k])

    assert set(ref_by_key) == set(ours_by_key)
    for key in ref_by_key:
        rg, ra1, ra2, rr, rmat = ref_by_key[key]
        og, oa1, oa2, orf, omat = ours_by_key[key]
        assert (rg, ra1, ra2, rr) == (og, oa1, oa2, orf), key
        np.testing.assert_array_equal(rmat, omat, err_msg=str(key))


def test_haploid_threshold_parity(reference_module, parity_fixture):
    fasta_p, bam_p, ref_seq, snps = parity_fixture
    dct = {
        "exclude_bed": None, "sam_path": bam_p, "fasta_path": fasta_p,
        "threshold": [0.4, 0.6], "mincov": 4, "maxcov": 160,
        "min_allele_freq": 0.15, "min_nbr_sites": 1, "seq": "ont",
        "supplementary": False,
    }
    region = {"chrom": "chr_t", "start": 2001, "end": 12000,
              "ploidy": "haploid"}
    r = reference_module.get_snp_testing_candidates(dct, region)
    bam = BamReader(bam_p)
    fasta = FastaFile(fasta_p)
    batch = get_snp_candidates(
        bam, fasta, region, seq_type="ont", ploidy="haploid")
    np.testing.assert_array_equal(np.asarray(r[0]), batch.pos + 1)
    np.testing.assert_array_equal(
        np.asarray(r[2]).astype(np.float32), assemble_matrices_np(batch))
