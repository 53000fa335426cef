"""Native TM-score extension vs numpy implementation."""
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from se3_diffusion_tpu.evaluation import metrics, tmalign
from tests.helpers import build_backbone


@pytest.fixture(scope="module", autouse=True)
def built():
    tmalign.build_library()


def _ca(n, phi=-57, psi=-47, seed=0):
    atom37, _ = build_backbone(n, phi=phi, psi=psi)
    rng = np.random.RandomState(seed)
    return atom37[:, 1] + rng.randn(n, 3) * 0.05


class TestNative:
    def test_identity(self):
        ca = _ca(80)
        t1, t2 = tmalign.tm_score_pair(ca, ca)
        assert t1 > 0.99 and t2 > 0.99

    def test_rigid_motion(self):
        ca = _ca(80)
        rot = Rotation.from_rotvec([1.0, -0.5, 0.7]).as_matrix()
        moved = ca @ rot.T + np.asarray([10.0, -4.0, 2.0])
        t1, t2 = tmalign.tm_score_pair(moved, ca)
        assert t1 > 0.99
        assert tmalign.aligned_rmsd(moved, ca) < 1e-2

    def test_matches_numpy_fallback(self):
        a = _ca(60, seed=1)
        # A partially-perturbed copy: half aligned, half displaced.
        b = a.copy()
        b[30:] += np.asarray([6.0, 0.0, 0.0])
        native, _ = tmalign.tm_score_pair(a, b)
        fallback = metrics.tm_score_fixed_alignment(a, b)
        assert abs(native - fallback) < 0.05, (native, fallback)
        assert 0.3 < native < 0.95

    def test_discriminates_folds(self):
        helix = _ca(60, phi=-57, psi=-47)
        strand = _ca(60, phi=-120, psi=120)
        t1, _ = tmalign.tm_score_pair(helix, strand)
        assert t1 < 0.5

    def test_length_normalization(self):
        a = _ca(60)
        b = _ca(90)
        t1, t2 = tmalign.tm_score_pair(a, b)
        # Normalizing by the longer chain gives the smaller score.
        assert t2 <= t1 + 1e-9

    def test_metrics_prefers_native(self):
        # calc_tm_score should route through the built native library.
        ca = _ca(50)
        t1, t2 = metrics.calc_tm_score(ca, ca)
        assert t1 > 0.99


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
