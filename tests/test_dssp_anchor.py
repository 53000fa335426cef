"""DSSP-lite anchor fixtures: pinned per-residue assignments.

The reference uses mdtraj's C DSSP (`analysis/metrics.py:55-69`,
`data/process_pdb_dataset.py:200-229`); mdtraj is absent from this
environment, so `evaluation/secondary_structure.py` re-implements
Kabsch-Sander. Strand%/helix% steer the training curriculum, so these
tests pin EXACT assignments on structures whose true 3-state DSSP output
is known analytically — drift insurance for the curriculum signal:

* An ideal alpha-helix (phi=-57, psi=-47): the complete i -> i+4 H-bond
  ladder and the canonical C + H*(n-2) + C pattern (DSSP's 4-turn rule
  never marks the first/last residue of the ladder helical in the
  3-state reduction).
* An antiparallel hairpin with real H-bond registry: strand interiors E,
  turn + chain termini C (a bridge at i needs residues i-1/i+1).
* A golden mixed alpha/beta structure (frozen seed): full string snapshot.

No real-PDB coordinates exist in this environment (no network, no
mounted archives — see DATA_READINESS.md), so analytic truths + a golden
snapshot are the strongest available external anchor.
"""
import numpy as np

from se3_diffusion_tpu.data import synthetic as syn
from se3_diffusion_tpu.evaluation import secondary_structure as ss_lib
from tests.helpers import build_backbone


class TestIdealHelixAnchor:
    def test_hbond_ladder_is_exactly_i_to_i_plus_4(self):
        a37, mask = build_backbone(20, phi=-57, psi=-47)
        hb = ss_lib.kabsch_sander_hbonds(
            a37[:, 0], a37[:, 1], a37[:, 2], a37[:, 4], np.ones(20)
        )
        i, j = np.nonzero(hb)
        pairs = set(zip(i.tolist(), j.tolist()))
        want = {(k, k + 4) for k in range(16)}
        assert pairs == want, pairs ^ want

    def test_exact_boundary_pattern(self):
        # True 3-state DSSP for a perfect helix: the 4-turn pair rule
        # (two consecutive turns -> residues i+1..i+4) covers 1..n-2 and
        # never the chain termini.
        a37, mask = build_backbone(20, phi=-57, psi=-47)
        ss = "".join(ss_lib.assign_secondary_structure(a37, mask))
        assert ss == "C" + "H" * 18 + "C", ss

    def test_length_invariance_of_boundaries(self):
        for n in (8, 12, 30, 50):
            a37, mask = build_backbone(n, phi=-57, psi=-47)
            ss = "".join(ss_lib.assign_secondary_structure(a37, mask))
            assert ss == "C" + "H" * (n - 2) + "C", (n, ss)

    def test_three_ten_helix_not_alpha(self):
        # 3-10 helix dihedrals (-49, -26) H-bond i -> i+3, not i -> i+4:
        # the alpha 4-turn rule must not fire (3-state: coil).
        a37, mask = build_backbone(16, phi=-49, psi=-26)
        ss = "".join(ss_lib.assign_secondary_structure(a37, mask))
        assert "H" not in ss, ss


class TestHairpinAnchor:
    def test_exact_assignment_with_registry(self):
        # 2x6 antiparallel hairpin, H-bond registry built by the sheet
        # sampler. True DSSP: strand interiors E; the turn residues and
        # the chain termini (no i-1 / i+1 bridge partner) stay C.
        rng = np.random.RandomState(3)
        phis, psis, chars = syn.sample_sheet_dihedrals(rng, 14)
        assert "".join(chars) == "EEEEEETTEEEEEE"
        a37, mask = syn.build_backbone_from_dihedrals(phis, psis)
        ss = "".join(ss_lib.assign_secondary_structure(a37, mask))
        assert ss == "CEEEEECCEEEEEC", ss

    def test_isolated_strand_is_coil(self):
        # Extended dihedrals WITHOUT a paired partner: no bridge, so no E
        # (the reason the synthetic curriculum builds sheets as blocks).
        a37, mask = build_backbone(15, phi=-120, psi=125)
        ss = "".join(ss_lib.assign_secondary_structure(a37, mask))
        assert "E" not in ss and "H" not in ss, ss


class TestGoldenMixedAnchor:
    GOLDEN = (
        "CCCCCCHHHHHHHHHHHHHEEEEECCEEEEECEEECCEEECHHHHHHHHHHHHHHHHHHC"
    )

    def test_frozen_seed_snapshot(self):
        # Full-string snapshot of a mixed alpha/beta synthetic structure:
        # any change to H-placement, the energy threshold, turn/bridge
        # rules, or the builder shows up as a diff here.
        rng = np.random.RandomState(11)
        a37, mask = syn.sample_structure(rng, 60, compact_steps=100)
        ss = "".join(ss_lib.assign_secondary_structure(a37, mask))
        assert ss == self.GOLDEN, ss

    def test_percentages_consistent_with_string(self):
        rng = np.random.RandomState(11)
        a37, mask = syn.sample_structure(rng, 60, compact_steps=100)
        pct = ss_lib.ss_percentages(a37, mask)
        n = len(self.GOLDEN)
        assert pct["helix_percent"] == self.GOLDEN.count("H") / n
        assert pct["strand_percent"] == self.GOLDEN.count("E") / n
        assert pct["coil_percent"] == self.GOLDEN.count("C") / n
