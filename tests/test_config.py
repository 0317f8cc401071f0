"""Level geometry: mirrors reference ComputeLevelNums (cpp:112-135)."""

from precond_tpu.config import SchwarzConfig


def test_num_levels_matches_reference_rule():
    cfg = SchwarzConfig()
    # Reference: levelSz=ceil32(N); while >32: levelSz=ceil32(levelSz/32).
    def ref_levels(n):
        lv, sz = 1, (n + 31) // 32 * 32
        while sz > 32:
            sz = (sz // 32 + 31) // 32 * 32
            lv += 1
        return lv

    for n in (1, 31, 32, 33, 1024, 1025, 4096, 65536, 1_000_000):
        assert cfg.num_levels(n) == ref_levels(n), n


def test_capacities_are_bank_aligned_and_monotone():
    cfg = SchwarzConfig()
    for n in (5, 100, 4096, 70000):
        caps = cfg.level_capacities(n)
        assert len(caps) == cfg.num_levels(n)
        assert caps[0] == (n + 31) // 32 * 32
        for c in caps:
            assert c % 32 == 0 and c >= 32
        offs = cfg.level_offsets(n)
        assert offs[-1] == sum(caps) == cfg.total_capacity(n)
        assert cfg.num_blocks(n) * 32 == cfg.total_capacity(n)
