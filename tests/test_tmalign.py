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


def _mixed_fold(seed=0, segs=((-57, -47, 22), (-120, 120, 12),
                              (-57, -47, 18), (-120, 120, 12),
                              (-75, -30, 20), (-120, 120, 16))):
    """A multi-segment helix/strand fold (per-residue dihedrals via NERF) —
    enough tertiary signature for alignment tests to be non-degenerate."""
    from tests import helpers as h

    phis, psis = [], []
    rng = np.random.RandomState(seed)
    for phi, psi, ln in segs:
        phis += list(phi + rng.randn(ln) * 3.0)
        psis += list(psi + rng.randn(ln) * 3.0)
    num = len(phis)
    n = np.array([0.0, 0.0, 0.0])
    ca = np.array([h.B_N_CA, 0.0, 0.0])
    c = h._place(n + [0, 1, 0], n, ca, h.B_CA_C, h.A_N_CA_C, 0.0)
    cas = []
    for i in range(num):
        cas.append(ca.copy())
        if i < num - 1:
            n_next = h._place(n, ca, c, h.B_C_N, h.A_CA_C_N, psis[i])
            ca_next = h._place(ca, c, n_next, h.B_N_CA, h.A_C_N_CA, 180.0)
            c_next = h._place(c, n_next, ca_next, h.B_CA_C, h.A_N_CA_C,
                              phis[i + 1])
            n, ca, c = n_next, ca_next, c_next
    return np.asarray(cas, np.float64)


class TestTMAlign:
    """Sequence-independent TM-align (`tmalign.tm_align_pair`)."""

    def test_rigid_motion_full_length(self):
        ca = _mixed_fold()
        rot = Rotation.from_rotvec([0.4, 1.2, -0.3]).as_matrix()
        moved = ca @ rot.T + np.asarray([5.0, 17.0, -3.0])
        t1, t2 = tmalign.tm_align_pair(moved, ca)
        assert t1 > 0.98 and t2 > 0.98

    def test_truncation(self):
        # b is the first 60% of a: aligned TM normalized by the short chain
        # should be ~1; the identity alignment already handles this case and
        # the two must agree.
        ca = _mixed_fold()
        short = ca[: int(len(ca) * 0.6)]
        t1, t2 = tmalign.tm_align_pair(ca, short)
        assert t2 > 0.95  # normalized by the short chain
        assert t1 < t2  # long-chain normalization penalizes the unmatched tail

    def test_shifted_pair_identity_fails_aligned_succeeds(self):
        # b is a WINDOW OFFSET by 15 residues: under the identity alignment
        # residue i is compared against residue i+15 — garbage — while the
        # alignment search recovers the true correspondence.
        ca = _mixed_fold()
        a = ca[15:95]
        b = ca[0:80]
        t_id, _ = tmalign.tm_score_pair(a, b)
        t_al, _ = tmalign.tm_align_pair(a, b)
        # Only 65 of the 80 residues have a counterpart (the windows overlap
        # by 65), so the best achievable score is 65/80 = 0.8125; the search
        # should get essentially all of it.
        assert t_al > 0.80, t_al
        assert t_al > t_id + 0.3, (t_al, t_id)

    def test_internal_insertion_needs_gaps(self):
        # b = a with a 14-residue loop spliced into the middle: gapless
        # threading can match only one side; the DP alignment bridges both.
        ca = _mixed_fold()
        loop = _mixed_fold(seed=7, segs=((-75, 145, 14),))
        mid = len(ca) // 2
        anchor = ca[mid - 1]
        loop_shifted = loop - loop[0] + anchor + np.asarray([3.8, 0, 0])
        b = np.concatenate([ca[:mid], loop_shifted, ca[mid:]])
        t_id, _ = tmalign.tm_score_pair(ca, b)
        t1, t2 = tmalign.tm_align_pair(ca, b)
        assert t1 > 0.85, t1
        assert t1 > t_id + 0.2, (t1, t_id)

    def test_same_length_agrees_with_identity(self):
        # When chains share correspondence, the alignment search must find
        # (at least) the identity alignment's score.
        a = _mixed_fold(seed=1)
        b = a + np.random.RandomState(3).randn(*a.shape) * 0.4
        t_id, _ = tmalign.tm_score_pair(a, b)
        t_al, _ = tmalign.tm_align_pair(a, b)
        assert t_al > t_id - 0.02, (t_al, t_id)

    def test_unrelated_folds_low(self):
        a = _mixed_fold(seed=2)
        b = _mixed_fold(
            seed=9,
            segs=((-120, 120, 25), (-57, -47, 30), (-120, 120, 25),
                  (-57, -47, 20)),
        )
        t1, t2 = tmalign.tm_align_pair(a, b)
        assert max(t1, t2) < 0.6, (t1, t2)

    def test_alignment_output(self):
        ca = _mixed_fold()
        a = ca[15:95]
        b = ca[0:80]
        t1, _, ali = tmalign.tm_align_pair(a, b, return_alignment=True)
        matched = ali >= 0
        assert matched.sum() >= 55
        # The true correspondence is a[i] <-> b[i + 15].
        shifts = ali[matched] - np.nonzero(matched)[0]
        assert np.median(shifts) == 15

    def test_metrics_calc_tm_align_routes_native(self):
        a = _mixed_fold(seed=4)
        t1, t2 = metrics.calc_tm_align(a, a[10:])
        assert t2 > 0.9

    def test_python_threading_fallback(self):
        ca = _mixed_fold()
        a, b = ca[15:95], ca[0:80]
        t1, t2 = metrics._tm_align_threading_fallback(a, b)
        # Upper bound is overlap/len = 65/80 = 0.8125 (see the shifted-pair
        # test above); the threading fallback recovers the full overlap.
        assert t1 > 0.80, t1

    def test_diversity_uses_alignment(self):
        # Three windows of the same fold at different offsets/lengths should
        # collapse into ONE cluster under aligned TM (identity TM would see
        # them as distinct, inflating diversity).
        ca = _mixed_fold()
        samples = [ca[0:80], ca[10:90], ca[5:95]]
        out = metrics.diversity(samples)
        assert out["num_clusters"] == 1, out


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
