"""Native mmCIF tokenizer vs the pure-Python parser."""
import time

import numpy as np
import pytest

from se3_diffusion_tpu.data import mmcif, mmcif_native
from tests.helpers import build_backbone, to_mmcif


@pytest.fixture(scope="module", autouse=True)
def built():
    if mmcif_native.build_library() is None:
        pytest.skip("g++ unavailable")


def test_fast_path_matches_python():
    atom37, mask = build_backbone(60)
    text = to_mmcif(atom37, mask)
    fast = mmcif.parse_mmcif_string(text, use_native=True)
    slow = mmcif.parse_mmcif_string(text, use_native=False)
    assert fast.resolution == slow.resolution == 2.0
    assert set(fast.chains) == set(slow.chains)
    a, b = fast.chains["A"], slow.chains["A"]
    np.testing.assert_array_equal(a.aatype, b.aatype)
    np.testing.assert_array_equal(a.residue_index, b.residue_index)
    np.testing.assert_allclose(a.atom_positions, b.atom_positions, atol=1e-4)
    np.testing.assert_array_equal(a.atom_mask, b.atom_mask)
    np.testing.assert_allclose(a.b_factors, b.b_factors, atol=1e-4)


def test_hetatm_altloc_filters_match():
    atom37, mask = build_backbone(6)
    text = to_mmcif(atom37, mask)
    text += "HETATM 900 CA HOH A 99 0 0 0 1.0 . 1\n"
    text += "ATOM 901 CA ALA A 99 1 1 1 1.0 B 1\n"   # altloc B -> dropped
    text += "ATOM 902 CA ALA A 99 1 1 1 1.0 . 2\n"   # model 2 -> dropped
    fast = mmcif.parse_mmcif_string(text, use_native=True)
    slow = mmcif.parse_mmcif_string(text, use_native=False)
    assert fast.chains["A"].atom_positions.shape[0] == 6
    assert slow.chains["A"].atom_positions.shape[0] == 6


def test_speedup_on_large_chain():
    atom37, mask = build_backbone(500)
    text = to_mmcif(atom37, mask) * 1  # ~2000 atoms
    t0 = time.perf_counter()
    mmcif.parse_mmcif_string(text, use_native=False)
    t_py = time.perf_counter() - t0
    t0 = time.perf_counter()
    mmcif.parse_mmcif_string(text, use_native=True)
    t_nat = time.perf_counter() - t0
    # The native path should be clearly faster on atom-heavy files.
    assert t_nat < t_py, (t_nat, t_py)
