"""Test fixtures — re-exports the package simulator (nanocaller_tpu/sim.py)."""

from nanocaller_tpu.sim import (  # noqa: F401
    BASES,
    make_diploid_readset,
    make_fixture,
    random_seq,
    write_bam,
    write_bam_multi,
)
