import numpy as np
import pytest

from nanocaller_tpu.config import Config
from nanocaller_tpu.runtime.chunker import get_chunks, get_regions_list


class FakeBam:
    def __init__(self, refs):
        self.refs = refs  # {name: length}

    @property
    def references(self):
        return list(self.refs)

    def is_valid_reference_name(self, n):
        return n in self.refs

    def get_reference_length(self, n):
        return self.refs[n]


HUMANISH = {("chr%d" % i): 1_000_000 for i in range(1, 23)}
HUMANISH.update({"chrX": 900_000, "chrY": 500_000, "chrM": 16_000})


class TestRegions:
    def test_wgs_contigs_chr_prefix(self):
        cfg = Config(wgs_contigs="chr1-22XY")
        regions = get_regions_list(cfg, FakeBam(HUMANISH))
        names = [r[0] for r in regions]
        assert names == ["chr%d" % i for i in range(1, 23)] + ["chrX", "chrY"]
        ploidy = {r[0]: r[3] for r in regions}
        assert ploidy["chrY"] == "haploid"  # always haploid (utils.py:55-58)
        assert ploidy["chrX"] == "diploid"  # without --haploid_X
        assert ploidy["chr1"] == "diploid"

    def test_haploid_flags(self):
        cfg = Config(wgs_contigs="chr1-22XY", haploid_X=True)
        ploidy = {r[0]: r[3] for r in get_regions_list(cfg, FakeBam(HUMANISH))}
        assert ploidy["chrX"] == "haploid"
        cfg2 = Config(regions=["chr5", "chrM"], haploid_genome=True)
        regions = get_regions_list(cfg2, FakeBam(HUMANISH))
        assert all(r[3] == "haploid" for r in regions)

    def test_region_strings(self):
        cfg = Config(regions=["chr3", "chr6:1000-5000", "chrNOPE"])
        regions = get_regions_list(cfg, FakeBam(HUMANISH))
        assert ("chr3", 1, 1_000_000, "diploid") in regions
        assert ("chr6", 1000, 5000, "diploid") in regions
        assert not any(r[0] == "chrNOPE" for r in regions)

    def test_bed(self, tmp_path):
        bed = tmp_path / "r.bed"
        bed.write_text("chr1\t100\t200\nchrZZ\t1\t2\nchr2\t5\t50\n")
        cfg = Config(bed=str(bed))
        regions = get_regions_list(cfg, FakeBam(HUMANISH))
        assert regions == [("chr1", 100, 200, "diploid"),
                           ("chr2", 5, 50, "diploid")]

    def test_default_all_contigs(self):
        cfg = Config()
        regions = get_regions_list(cfg, FakeBam({"a": 100, "b": 200}))
        assert [r[0] for r in regions] == ["a", "b"]

    def test_no_regions_raises(self):
        with pytest.raises(ValueError):
            get_regions_list(Config(regions=["nope"]), FakeBam({"a": 10}))


class TestChunks:
    def test_chunk_size_policy(self):
        # min(500k, max(10k, total/cpu+1)) — utils.py:67-83
        regions = [("c", 1, 3_000_000, "diploid")]
        chunks = get_chunks(regions, cpu=4)
        sizes = {c["end"] - c["start"] for c in chunks[:-1]}
        assert sizes == {500_000}  # capped at max
        chunks2 = get_chunks(regions, cpu=100)
        assert chunks2[0]["end"] - chunks2[0]["start"] == 3_000_000 // 100 + 1
        chunks3 = get_chunks([("c", 1, 20_000, "diploid")], cpu=100)
        assert chunks3[0]["end"] - chunks3[0]["start"] == 10_000  # floor

    def test_chunks_cover_region(self):
        regions = [("c", 501, 44_000, "haploid")]
        chunks = get_chunks(regions, cpu=3)
        assert chunks[0]["start"] == 501
        assert chunks[-1]["end"] == 44_000
        assert all(c["ploidy"] == "haploid" for c in chunks)
        for a, b in zip(chunks[:-1], chunks[1:]):
            assert b["start"] == a["end"]
