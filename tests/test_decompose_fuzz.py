"""Adversarial property battery for decompose_record (VERDICT r2 item 8).

rtg vcfdecompose (reference: indelCaller.py:391) has no in-image oracle,
so the transcription is pinned by properties instead: re-applying the
decomposed primitives to the reference haplotype must reconstruct the
alt allele exactly, per haplotype for 1|2 records; plus the documented
rtg-default invariants (MNP retention, ORP/ORL provenance, pass-through
of already-primitive records, non-overlapping position-sorted output).
"""

import numpy as np
import pytest

from nanocaller_tpu.indel_caller import decompose_record, primitives_of
from nanocaller_tpu.io.vcf import VcfRecord

BASES = "ACGT"


def apply_primitives(ref, prims):
    """Apply (off, pref, palt) primitives to ref, right to left.

    Primitives may share an anchor base (a deletion and an insertion
    anchored on the same preserved base — rtg emits these too); at equal
    offsets the longer-pref primitive (the deletion) must apply first so
    the anchor-only insertion still sees its base."""
    def is_prepend(pref, palt):
        # r0==0 insertion: anchor base at the END of palt
        return palt.endswith(pref) and not palt.startswith(pref)

    s = ref
    for off, pref, palt in sorted(
            prims, key=lambda t: (-t[0], -len(t[1]), is_prepend(t[1], t[2]))):
        assert s[off:off + len(pref)] == pref, (s, off, pref)
        s = s[:off] + palt + s[off + len(pref):]
    return s


def random_alt(rng, ref):
    """Random edit of ref: substitutions, insertions, deletions."""
    out = []
    i = 0
    while i < len(ref):
        r = rng.random()
        if r < 0.25:  # substitute
            out.append(BASES[int(rng.integers(4))])
            i += 1
        elif r < 0.35:  # delete 1-3
            i += int(rng.integers(1, 4))
        elif r < 0.45:  # insert 1-4
            out.append("".join(BASES[int(b)]
                               for b in rng.integers(0, 4, int(rng.integers(1, 5)))))
        else:  # keep
            out.append(ref[i])
            i += 1
    alt = "".join(out)
    return alt


def mk_rec(ref, alt, gt="0/1", pos=101, info=".", gq="33", ps=None):
    fmt = "GT:GQ" + (":PS" if ps else "")
    sample = "%s:%s" % (gt, gq) + ((":%s" % ps) if ps else "")
    return VcfRecord("chr_t", pos, ref, alt, "50.0", "PASS", info=info,
                     format_=fmt, samples=[sample])


class TestReconstruction:
    @pytest.mark.parametrize("seed", range(40))
    def test_single_alt_roundtrip(self, seed):
        rng = np.random.default_rng(seed)
        n = int(rng.integers(2, 18))
        ref = "".join(BASES[int(b)] for b in rng.integers(0, 4, n))
        alt = random_alt(rng, ref)
        if not alt or alt == ref:
            alt = ref[:-1] + ("A" if ref[-1] != "A" else "C") + "TT"
        rec = mk_rec(ref, alt)
        out = decompose_record(rec)
        prims = [(r.pos - rec.pos, r.ref, r.alt) for r in out]
        assert apply_primitives(ref, prims) == alt
        # emitted records must be position-sorted (anchor bases may be
        # shared between adjacent primitives; apply_primitives asserts
        # every primitive still sees its reference bases)
        assert [r.pos for r in out] == sorted(r.pos for r in out)

    @pytest.mark.parametrize("seed", range(25))
    def test_het_1_2_per_haplotype_roundtrip(self, seed):
        """For 1|2 records, hap1 must reconstruct alt1 (primitives with
        GT 1|1 or 1|0) and hap2 alt2 (1|1 or 0|1)."""
        rng = np.random.default_rng(1000 + seed)
        n = int(rng.integers(3, 14))
        ref = "".join(BASES[int(b)] for b in rng.integers(0, 4, n))
        alt1 = random_alt(rng, ref)
        alt2 = random_alt(rng, ref)
        if not alt1 or alt1 == ref:
            alt1 = ref + "A"
        if not alt2 or alt2 in (ref, alt1):
            alt2 = "T" + ref
        rec = mk_rec(ref, "%s,%s" % (alt1, alt2), gt="1|2")
        out = decompose_record(rec)
        for hap, want in ((1, alt1), (2, alt2)):
            prims = []
            for r in out:
                gt = r.sample_field("GT")
                carried = (gt == "1|1" or
                           (hap == 1 and gt == "1|0") or
                           (hap == 2 and gt == "0|1"))
                if carried:
                    prims.append((r.pos - rec.pos, r.ref, r.alt))
            assert apply_primitives(ref, prims) == want, (ref, alt1, alt2)


class TestRtgDefaultSemantics:
    def test_mnp_retained_not_split(self):
        # rtg default keeps MNPs whole (no --break-mnps)
        rec = mk_rec("ACG", "TCA", pos=50)  # pos1+pos3 differ, pos2 matches
        out = decompose_record(rec)
        # match anchor at the middle base splits it into two SNPs; a
        # contiguous MNP (all positions differing) stays whole:
        rec2 = mk_rec("AC", "TG", pos=50)
        out2 = decompose_record(rec2)
        assert len(out2) == 1 and (out2[0].ref, out2[0].alt) == ("AC", "TG")
        assert [o.pos for o in out] == [50, 52]

    def test_primitive_passthrough_untouched(self):
        for ref, alt in (("A", "T"), ("AC", "GT"), ("A", "ATT"),
                         ("ATT", "A")):
            rec = mk_rec(ref, alt, info="FOO=1")
            out = decompose_record(rec)
            assert len(out) == 1
            assert out[0] is rec  # verbatim pass-through, info untouched
            assert "ORP" not in (out[0].info or "")

    def test_orp_orl_provenance(self):
        rec = mk_rec("AAACGT", "AAATTT", pos=200, info="X=2")
        out = decompose_record(rec)
        assert len(out) >= 1 and out[0] is not rec
        for r in out:
            assert "ORP=200" in r.info and "ORL=6" in r.info
            assert r.info.startswith("X=2;")

    def test_gq_and_ps_propagate(self):
        rec = mk_rec("AAACGT", "AAATTT", pos=200, gq="17", ps="4711")
        for r in decompose_record(rec):
            assert r.sample_field("GQ") == "17"
            assert r.sample_field("PS") == "4711"

    def test_shared_primitive_becomes_hom(self):
        # both alts carry the same SNP → 1|1 for the shared primitive
        rec = mk_rec("AAT", "CAT,CAG", gt="1|2", pos=10)
        out = decompose_record(rec)
        gts = {(r.pos, r.ref, r.alt): r.sample_field("GT") for r in out}
        assert gts[(10, "A", "C")] == "1|1"
        assert gts[(12, "T", "G")] == "0|1"
