"""Golden numerical parity against the REFERENCE'S OWN torch code.

Unlike tests/test_torch_convert.py (which compares against torch replicas
authored in this repo), these tests import the actual reference modules
from /root/reference — `model/score_network.py`, `model/ipa_pytorch.py`,
`openfold/utils/rigid_utils.py`, `data/{so3,r3,se3}_diffuser.py`,
`ProteinMPNN/protein_mpnn_utils.py` — random-init them at reference dims,
convert the state dicts with se3_diffusion_tpu.interop, and assert forward
parity. A shared misreading of the reference cannot pass here.

The only import blockers in this environment are `Bio` and `omegaconf`
(verified: nothing else in the closure is missing); tiny stubs unblock
them. Everything runs on CPU torch + CPU jax.

This is the closest achievable stand-in for BASELINE configs 1/3 while
`weights/paper_weights.pth` remains a missing blob
(reference `.MISSING_LARGE_BLOBS:9-10`).
"""
import os
import sys
import types
from types import SimpleNamespace as NS

import numpy as np
import pytest

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "model")),
    reason="reference repo not mounted",
)

torch = pytest.importorskip("torch")


def _install_stubs():
    """Stub Bio and omegaconf — the only missing imports in the closure."""
    if "Bio" not in sys.modules:
        bio = types.ModuleType("Bio")
        pdb = types.ModuleType("Bio.PDB")
        chain_mod = types.ModuleType("Bio.PDB.Chain")

        class Chain:  # placeholder: only used as a type annotation
            pass

        class PDBParser:  # placeholder: only used by unexercised parsers
            pass

        chain_mod.Chain = Chain
        pdb.Chain = chain_mod
        pdb.PDBParser = PDBParser
        bio.PDB = pdb
        sys.modules["Bio"] = bio
        sys.modules["Bio.PDB"] = pdb
        sys.modules["Bio.PDB.Chain"] = chain_mod
    if "omegaconf" not in sys.modules:
        oc = types.ModuleType("omegaconf")

        class OmegaConf:
            @staticmethod
            def to_yaml(conf):
                return str(conf)

        oc.OmegaConf = OmegaConf
        sys.modules["omegaconf"] = oc


@pytest.fixture(scope="module")
def ref():
    """Imports the reference packages; returns a namespace of modules."""
    _install_stubs()
    for p in (REFERENCE, os.path.join(REFERENCE, "ProteinMPNN")):
        if p not in sys.path:
            sys.path.append(p)  # append: never shadow this repo's modules
    import importlib

    mods = NS()
    mods.rigid_utils = importlib.import_module("openfold.utils.rigid_utils")
    mods.so3_diffuser = importlib.import_module("data.so3_diffuser")
    mods.r3_diffuser = importlib.import_module("data.r3_diffuser")
    mods.se3_diffuser = importlib.import_module("data.se3_diffuser")
    mods.du = importlib.import_module("data.utils")
    mods.score_network = importlib.import_module("model.score_network")
    mods.ipa_pytorch = importlib.import_module("model.ipa_pytorch")
    mods.mpnn = importlib.import_module("protein_mpnn_utils")
    mods.of_loss = importlib.import_module("openfold.utils.loss")
    mods.of_rc = importlib.import_module("openfold.np.residue_constants")
    return mods


# --------------------------------------------------------------------------
# Shared configs: reduced IGSO3 grid (identical on both sides) for speed.
# --------------------------------------------------------------------------
NUM_SIGMA, NUM_OMEGA = 100, 500


def _ref_so3_conf(tmpdir):
    return NS(
        num_omega=NUM_OMEGA,
        num_sigma=NUM_SIGMA,
        min_sigma=0.1,
        max_sigma=1.5,
        schedule="logarithmic",
        cache_dir=str(tmpdir),
        use_cached_score=False,
    )


def _ref_r3_conf():
    return NS(min_b=0.1, max_b=20.0, coordinate_scaling=0.1)


def _our_so3_cfg():
    from se3_diffusion_tpu.config import SO3Config

    return SO3Config(
        num_omega=NUM_OMEGA, num_sigma=NUM_SIGMA, cache_dir="", series_l=1000
    )


@pytest.fixture(scope="module")
def ref_cache_dir(tmp_path_factory):
    """One shared cache dir so the reference's IGSO3 tables build once."""
    return tmp_path_factory.mktemp("igso3_cache")


@pytest.fixture(scope="module")
def ref_so3(ref, ref_cache_dir):
    return ref.so3_diffuser.SO3Diffuser(_ref_so3_conf(ref_cache_dir))


@pytest.fixture(scope="module")
def our_tables():
    from se3_diffusion_tpu.diffusion import igso3

    return igso3.build_tables(_our_so3_cfg(), cache_dir="")


# --------------------------------------------------------------------------
# IGSO3 / SO3 diffuser
# --------------------------------------------------------------------------


def test_igso3_tables_match_reference(ref_so3, our_tables):
    """pdf/cdf/score-norm/score-scaling tables vs reference SO3Diffuser."""
    np.testing.assert_allclose(
        np.asarray(our_tables.omega_grid, np.float64),
        ref_so3.discrete_omega,
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(our_tables.sigma_grid, np.float64),
        ref_so3.discrete_sigma,
        rtol=1e-6,
    )
    # Tables are built fp64 on both sides with the same series; ours are
    # stored fp32 on device, so compare at fp32 resolution.
    np.testing.assert_allclose(
        np.asarray(our_tables.pdf), ref_so3._pdf, rtol=2e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(our_tables.cdf), ref_so3._cdf, rtol=2e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(our_tables.score_norms),
        ref_so3._score_norms,
        rtol=2e-4,
        atol=2e-3,
    )
    np.testing.assert_allclose(
        np.asarray(our_tables.score_scaling),
        ref_so3._score_scaling,
        rtol=2e-5,
    )


def _grid_times(k_indices):
    """t values sitting just above sigma-grid points so the reference's
    t_to_idx snap (digitize) resolves to the same sigma our continuous
    sigma(t) uses."""
    ts = np.linspace(0.0, 1.0, NUM_SIGMA)
    return np.asarray([ts[k] + 1e-9 for k in k_indices])


def test_so3_score_parity(ref, ref_so3, our_tables):
    """torch_score (live series path, the reference default) vs our score.

    Angles are sampled within ~4 sigma of each time's marginal: that is
    the domain the diffusion actually evaluates scores on (rotvec_0t of
    IGSO3-sampled perturbations). In the far tail (omega >> sigma at
    small sigma) the density underflows fp32 and the score — a ratio of
    two underflowed series — is meaningless on any fp32 device path;
    the reference itself only reaches those cells in fp64 numpy.
    """
    import dataclasses

    from se3_diffusion_tpu.diffusion import so3

    rng = np.random.default_rng(0)
    k_idx = [5, 30, 60, 95]
    t = _grid_times(k_idx)
    sigmas = ref_so3.discrete_sigma[np.asarray(k_idx)]
    axis = rng.normal(size=(4, 32, 3))
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    hi = np.minimum(4.0 * sigmas, np.pi - 0.05)
    mag = rng.uniform(0.05, hi[:, None], size=(4, 32))
    vec = (axis * mag[..., None]).astype(np.float32)

    ref_score = ref_so3.torch_score(
        torch.tensor(vec), torch.tensor(t)
    ).numpy()

    cfg = _our_so3_cfg()
    ours_interp = np.asarray(so3.score(our_tables, cfg, vec, t))
    cfg_series = dataclasses.replace(cfg, score_impl="series")
    ours_series = np.asarray(so3.score(our_tables, cfg_series, vec, t))

    # series-vs-series should be tight; interp adds omega-grid interpolation
    # error over a 500-point grid.
    np.testing.assert_allclose(ours_series, ref_score, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(ours_interp, ref_score, rtol=2e-2, atol=5e-3)


def test_so3_schedule_parity(ref_so3, our_tables):
    from se3_diffusion_tpu.diffusion import so3

    cfg = _our_so3_cfg()
    t = np.linspace(0.01, 1.0, 17)
    np.testing.assert_allclose(
        np.asarray(so3.sigma(cfg, t)), ref_so3.sigma(t), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(so3.diffusion_coef(cfg, t)),
        ref_so3.diffusion_coef(t),
        rtol=1e-6,
    )
    t_snap = _grid_times([3, 50, 77])
    np.testing.assert_allclose(
        np.asarray(so3.score_scaling(our_tables, cfg, t_snap)),
        ref_so3.score_scaling(t_snap),
        rtol=1e-4,
    )


# --------------------------------------------------------------------------
# R3 diffuser
# --------------------------------------------------------------------------


def test_r3_parity(ref):
    from se3_diffusion_tpu.config import R3Config
    from se3_diffusion_tpu.diffusion import r3

    ref_r3 = ref.r3_diffuser.R3Diffuser(_ref_r3_conf())
    cfg = R3Config()
    rng = np.random.default_rng(1)
    t = np.asarray([0.05, 0.3, 0.8])
    x0 = rng.normal(size=(3, 11, 3)).astype(np.float64) * 8.0
    xt = rng.normal(size=(3, 11, 3)).astype(np.float64) * 8.0

    np.testing.assert_allclose(
        np.asarray(r3.marginal_b_t(cfg, t)), ref_r3.marginal_b_t(t), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(r3.diffusion_coef(cfg, t)),
        ref_r3.diffusion_coef(t),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(r3.conditional_var(cfg, t)),
        ref_r3.conditional_var(t),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(r3.score_scaling(cfg, t)),
        ref_r3.score_scaling(t),
        rtol=1e-5,
    )
    # Reference score() operates in SCALED coordinates per-example.
    for i, ti in enumerate(t):
        ref_s = ref_r3.score(
            ref_r3._scale(xt[i]), ref_r3._scale(x0[i]), ti, scale=False
        )
        ours = np.asarray(
            r3.score(cfg, xt[i], x0[i], np.asarray(ti), scale_inputs=True)
        )
        np.testing.assert_allclose(ours, ref_s, rtol=1e-4, atol=1e-5)


# --------------------------------------------------------------------------
# rigid_utils geometry
# --------------------------------------------------------------------------


def test_rot_to_quat_parity(ref):
    """Our branchless Shepperd rot->quat vs reference eigh path (up to sign)."""
    from scipy.spatial.transform import Rotation as sR

    from se3_diffusion_tpu.geometry import quat as ql

    rots = sR.random(64, random_state=7).as_matrix()
    ref_q = ref.rigid_utils.rot_to_quat(torch.tensor(rots, dtype=torch.float32))
    ref_q = ref_q.numpy()
    ours = np.asarray(ql.rotmat_to_quat(rots.astype(np.float32)))
    sign = np.sign(np.sum(ours * ref_q, axis=-1, keepdims=True))
    np.testing.assert_allclose(ours * sign, ref_q, atol=2e-5)


def test_quat_to_rotvec_parity(ref):
    from scipy.spatial.transform import Rotation as sR

    from se3_diffusion_tpu.geometry import quat as ql

    q_xyzw = sR.random(64, random_state=8).as_quat()
    q_wxyz = np.roll(q_xyzw, 1, axis=-1).astype(np.float32)
    ref_v = ref.du.quat_to_rotvec(torch.tensor(q_wxyz)).numpy()
    ours = np.asarray(ql.quat_to_rotvec(q_wxyz))
    np.testing.assert_allclose(ours, ref_v, atol=1e-5)


def test_compose_q_update_vec_parity(ref):
    from scipy.spatial.transform import Rotation as sR

    from se3_diffusion_tpu.geometry.rigid import Rigid

    rng = np.random.default_rng(9)
    n = 32
    q = np.roll(sR.random(n, random_state=10).as_quat(), 1, -1).astype(np.float32)
    trans = rng.normal(size=(n, 3)).astype(np.float32)
    update = rng.normal(size=(n, 6)).astype(np.float32)

    t7 = np.concatenate([q, trans], axis=-1)
    ref_rigid = ref.rigid_utils.Rigid.from_tensor_7(
        torch.tensor(t7), normalize_quats=False
    )
    ref_out = ref_rigid.compose_q_update_vec(torch.tensor(update)).to_tensor_7()
    ref_out = ref_out.numpy()

    ours = (
        Rigid.from_tensor_7(t7).compose_q_update_vec(update).to_tensor_7()
    )
    ours = np.asarray(ours)
    sign = np.sign(np.sum(ours[..., :4] * ref_out[..., :4], -1, keepdims=True))
    np.testing.assert_allclose(ours[..., :4] * sign, ref_out[..., :4], atol=2e-5)
    np.testing.assert_allclose(ours[..., 4:], ref_out[..., 4:], atol=2e-4)


def test_from_3_points_parity(ref):
    from se3_diffusion_tpu.geometry.rigid import Rigid

    rng = np.random.default_rng(11)
    p1, p2, p3 = (rng.normal(size=(16, 3)).astype(np.float32) for _ in range(3))
    ref_rigid = ref.rigid_utils.Rigid.from_3_points(
        torch.tensor(p1), torch.tensor(p2), torch.tensor(p3)
    )
    ref_rot = ref_rigid.get_rots().get_rot_mats().numpy()
    ref_trans = ref_rigid.get_trans().numpy()
    ours = Rigid.from_3_points(p1, p2, p3)
    np.testing.assert_allclose(np.asarray(ours.rot_mats()), ref_rot, atol=2e-5)
    np.testing.assert_allclose(np.asarray(ours.trans), ref_trans, atol=2e-5)


def test_calc_rot_score_parity(ref, ref_so3, our_tables, ref_cache_dir):
    """SE3Diffuser.calc_rot_score: quat-algebra path vs reference."""
    from scipy.spatial.transform import Rotation as sR

    from se3_diffusion_tpu.config import DiffuserConfig
    from se3_diffusion_tpu.diffusion.se3 import SE3Diffuser

    ref_se3 = ref.se3_diffuser.SE3Diffuser(
        NS(
            diffuse_rot=True,
            diffuse_trans=True,
            so3=_ref_so3_conf(ref_cache_dir),
            r3=_ref_r3_conf(),
        )
    )
    our = SE3Diffuser.create(
        DiffuserConfig(so3=_our_so3_cfg()), cache_dir=""
    )

    n = 12
    q_t = np.roll(sR.random(n, random_state=12).as_quat(), 1, -1).astype(np.float32)
    q_0 = np.roll(sR.random(n, random_state=13).as_quat(), 1, -1).astype(np.float32)
    t = _grid_times([40])  # single batch time

    rot_t = ref.rigid_utils.Rotation(quats=torch.tensor(q_t)[None], normalize_quats=True)
    rot_0 = ref.rigid_utils.Rotation(quats=torch.tensor(q_0)[None], normalize_quats=True)
    ref_score = ref_se3.calc_rot_score(
        rot_t, rot_0, torch.tensor(t)
    ).numpy()

    ours = np.asarray(
        our.calc_rot_score(q_t[None], q_0[None], t.astype(np.float32))
    )
    np.testing.assert_allclose(ours, ref_score[0] if ours.ndim == 2 else ref_score, rtol=2e-3, atol=5e-3)


# --------------------------------------------------------------------------
# Full model: Embedder + ScoreNetwork forward with converted weights
# --------------------------------------------------------------------------


def _ref_model_conf():
    return NS(
        node_embed_size=256,
        edge_embed_size=128,
        dropout=0.0,
        embed=NS(
            index_embed_size=32,
            aatype_embed_size=64,
            embed_self_conditioning=True,
            num_bins=22,
            min_bin=1e-5,
            max_bin=20.0,
        ),
        ipa=NS(
            c_s=256,
            c_z=128,
            c_hidden=256,
            c_skip=64,
            no_heads=8,
            no_qk_points=8,
            no_v_points=12,
            seq_tfmr_num_heads=4,
            seq_tfmr_num_layers=2,
            num_blocks=4,
            coordinate_scaling=0.1,
        ),
    )


def _make_batch(b=2, n=24, seed=21):
    from scipy.spatial.transform import Rotation as sR

    rng = np.random.default_rng(seed)
    q = np.roll(
        sR.random(b * n, random_state=seed).as_quat(), 1, -1
    ).reshape(b, n, 4).astype(np.float32)
    trans = (rng.normal(size=(b, n, 3)) * 6.0).astype(np.float32)
    return {
        "rigids_t": np.concatenate([q, trans], -1).astype(np.float32),
        "t": _grid_times([37, 72])[:b].astype(np.float32),
        "seq_idx": np.tile(np.arange(n)[None], (b, 1)),
        "res_mask": np.ones((b, n), np.float32),
        "fixed_mask": np.zeros((b, n), np.float32),
        "sc_ca_t": (rng.normal(size=(b, n, 3)) * 5.0).astype(np.float32),
        "torsion_angles_sin_cos": rng.normal(size=(b, n, 7, 2)).astype(
            np.float32
        ),
    }


@pytest.fixture(scope="module")
def ref_score_model(ref, ref_so3, ref_cache_dir):
    """Reference ScoreNetwork, random-init at reference dims, eval mode."""
    conf = _ref_model_conf()
    ref_diff = ref.se3_diffuser.SE3Diffuser(
        NS(
            diffuse_rot=True,
            diffuse_trans=True,
            so3=_ref_so3_conf(ref_cache_dir),
            r3=_ref_r3_conf(),
        )
    )
    torch.manual_seed(42)
    model = ref.score_network.ScoreNetwork(conf, ref_diff)
    model.eval()
    return model


@pytest.fixture(scope="module")
def converted(ref_score_model):
    from se3_diffusion_tpu.config import ModelConfig
    from se3_diffusion_tpu.interop.torch_convert import convert_state_dict

    model_conf = ModelConfig()
    params = convert_state_dict(ref_score_model.state_dict(), model_conf)
    return model_conf, params


@pytest.mark.slow
def test_embedder_parity(ref_score_model, converted):
    import jax.numpy as jnp

    from se3_diffusion_tpu.models.embedder import Embedder

    model_conf, params = converted
    batch = _make_batch()
    with torch.no_grad():
        ref_node, ref_edge = ref_score_model.embedding_layer(
            seq_idx=torch.tensor(batch["seq_idx"]),
            t=torch.tensor(batch["t"]),
            fixed_mask=torch.tensor(batch["fixed_mask"]),
            self_conditioning_ca=torch.tensor(batch["sc_ca_t"]),
        )
    node, edge = Embedder(model_conf).apply(
        {"params": params["embedder"]},
        seq_idx=jnp.asarray(batch["seq_idx"]),
        t=jnp.asarray(batch["t"]),
        fixed_mask=jnp.asarray(batch["fixed_mask"]),
        self_conditioning_ca=jnp.asarray(batch["sc_ca_t"]),
    )
    np.testing.assert_allclose(
        np.asarray(node), ref_node.numpy(), atol=1e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(edge), ref_edge.numpy(), atol=1e-4, rtol=1e-4
    )


@pytest.mark.slow
def test_score_network_forward_parity(ref_score_model, converted, our_tables):
    """Full forward (psi, scores, rigids, atom37) vs the reference network."""
    import jax

    from se3_diffusion_tpu.config import DiffuserConfig
    from se3_diffusion_tpu.diffusion.se3 import SE3Diffuser
    from se3_diffusion_tpu.models.score_network import (
        ScoreNetwork,
        score_network_forward,
    )

    model_conf, params = converted
    diffuser = SE3Diffuser.create(
        DiffuserConfig(so3=_our_so3_cfg()), cache_dir=""
    )
    batch = _make_batch()

    with torch.no_grad():
        ref_out = ref_score_model(
            {k: torch.tensor(v) for k, v in batch.items()}
        )

    model = ScoreNetwork(model_conf)
    feats = {k: jax.numpy.asarray(v) for k, v in batch.items()}
    out = score_network_forward(model, params, feats, diffuser)

    np.testing.assert_allclose(
        np.asarray(out["psi"]), ref_out["psi"].numpy(), atol=1e-4, rtol=1e-3
    )
    ours_r = np.asarray(out["rigids"])
    ref_r = ref_out["rigids"].numpy()
    sign = np.sign(np.sum(ours_r[..., :4] * ref_r[..., :4], -1, keepdims=True))
    np.testing.assert_allclose(
        ours_r[..., :4] * sign, ref_r[..., :4], atol=2e-4
    )
    np.testing.assert_allclose(ours_r[..., 4:], ref_r[..., 4:], atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(out["trans_score"]),
        ref_out["trans_score"].numpy(),
        atol=2e-3,
        rtol=1e-3,
    )
    # rot_score passes through the IGSO3 series (reference) vs interp (ours):
    # grid-snap times make sigma identical; interp error dominates.
    np.testing.assert_allclose(
        np.asarray(out["rot_score"]),
        ref_out["rot_score"].numpy(),
        atol=2e-2,
        rtol=2e-3,
    )
    np.testing.assert_allclose(
        np.asarray(out["atom37"]), ref_out["atom37"].numpy(), atol=2e-3
    )


# --------------------------------------------------------------------------
# AF2 structural violations (atom14 suite)
# --------------------------------------------------------------------------


def test_atom14_dists_bounds_parity(ref):
    from se3_diffusion_tpu.proteins import residue_constants as our_rc

    ours = our_rc.make_atom14_dists_bounds(1.5, 12.0)
    theirs = ref.of_rc.make_atom14_dists_bounds(
        overlap_tolerance=1.5, bond_length_tolerance_factor=12.0
    )
    for k in ("lower_bound", "upper_bound", "stddev"):
        np.testing.assert_allclose(ours[k], theirs[k], atol=1e-5, err_msg=k)


def test_structural_violations_parity(ref):
    """find_structural_violations + compute_violation_metrics vs reference
    torch implementations on a random structure with real violations."""
    from se3_diffusion_tpu.evaluation import violations as V
    from se3_diffusion_tpu.proteins import residue_constants as our_rc

    rng = np.random.default_rng(5)
    n = 24
    aatype = rng.integers(0, 20, size=n)
    exists = our_rc.atom14_exists_and_radius()[0][aatype]
    # A compressed random walk: consecutive residues ~2.5A apart, so the
    # structure has genuine clashes and bond violations.
    centers = np.cumsum(rng.normal(size=(n, 1, 3)) * 1.5, axis=0)
    atom14_pos = (centers + rng.normal(size=(n, 14, 3)) * 0.8).astype(
        np.float64
    ) * exists[..., None]
    residue_index = np.arange(n, dtype=np.int64)
    residue_index[12:] += 1  # one chain break

    # residx_atom14_to_atom37 from the reference's own tables.
    a14_to_a37 = np.zeros((n, 14), np.int64)
    for i, aa in enumerate(aatype):
        names = ref.of_rc.restype_name_to_atom14_names[
            ref.of_rc.restype_1to3[ref.of_rc.restypes[aa]]
        ]
        a14_to_a37[i] = [
            ref.of_rc.atom_order[nm] if nm else 0 for nm in names
        ]
    batch = {
        "atom14_atom_exists": exists.astype(np.float64),
        "residue_index": residue_index,
        "aatype": aatype,
        "residx_atom14_to_atom37": a14_to_a37,
        "seq_mask": np.ones(n, np.float64),
    }
    config = {
        "violation_tolerance_factor": 12.0,
        "clash_overlap_tolerance": 1.5,
    }
    ref_v = ref.of_loss.find_structural_violations_np(
        batch, atom14_pos, config
    )
    ours_v = V.find_structural_violations(
        atom14_pos,
        aatype,
        residue_index,
        exists,
        violation_tolerance_factor=12.0,
        clash_overlap_tolerance=1.5,
    )

    def _cmp(a, b, name):
        np.testing.assert_allclose(
            np.asarray(a, np.float64),
            np.asarray(b, np.float64),
            atol=1e-5,
            rtol=1e-5,
            err_msg=name,
        )

    for k in ref_v["between_residues"]:
        _cmp(ours_v["between_residues"][k], ref_v["between_residues"][k], k)
    for k in ref_v["within_residues"]:
        _cmp(ours_v["within_residues"][k], ref_v["within_residues"][k], k)
    _cmp(
        ours_v["total_per_residue_violations_mask"],
        ref_v["total_per_residue_violations_mask"],
        "total_mask",
    )
    # Sanity: the random structure actually violates things.
    assert ref_v["total_per_residue_violations_mask"].sum() > 0

    ref_m = ref.of_loss.compute_violation_metrics_np(
        batch, atom14_pos, ref_v
    )
    ours_m = V.compute_violation_metrics(
        atom14_pos, aatype, residue_index, violations=ours_v
    )
    for k, v in ours_m.items():
        np.testing.assert_allclose(v, float(ref_m[k]), atol=1e-6, err_msg=k)


# --------------------------------------------------------------------------
# ProteinMPNN
# --------------------------------------------------------------------------


@pytest.mark.slow
def test_protein_mpnn_logits_parity(ref):
    import jax.numpy as jnp

    from se3_diffusion_tpu.interop.mpnn_convert import convert_mpnn_state_dict
    from se3_diffusion_tpu.models.protein_mpnn import (
        MPNNConfig,
        ProteinMPNN,
    )

    cfg = MPNNConfig(k_neighbors=24, augment_eps=0.0)
    torch.manual_seed(7)
    ref_model = ref.mpnn.ProteinMPNN(
        num_letters=cfg.num_letters,
        node_features=cfg.node_features,
        edge_features=cfg.edge_features,
        hidden_dim=cfg.hidden_dim,
        num_encoder_layers=cfg.num_encoder_layers,
        num_decoder_layers=cfg.num_decoder_layers,
        k_neighbors=cfg.k_neighbors,
        augment_eps=0.0,
        dropout=0.0,
    )
    ref_model.eval()

    b, n = 2, 40
    rng = np.random.default_rng(3)
    # Plausible backbone-ish coordinates: random walk so k-NN is nontrivial.
    x = np.cumsum(rng.normal(size=(b, n, 1, 3)), axis=1) + rng.normal(
        size=(b, n, 4, 3)
    )
    x = x.astype(np.float32)
    seq = rng.integers(0, 21, size=(b, n))
    mask = np.ones((b, n), np.float32)
    mask[1, -5:] = 0.0
    residue_idx = np.tile(np.arange(n)[None], (b, 1))
    chain_labels = np.zeros((b, n), np.int64)
    randn = rng.normal(size=(b, n)).astype(np.float32)
    chain_m = mask.copy()
    decoding_order = np.argsort((chain_m + 1e-4) * np.abs(randn), axis=-1)

    with torch.no_grad():
        ref_lp = ref_model(
            torch.tensor(x),
            torch.tensor(seq),
            torch.tensor(mask),
            torch.tensor(chain_m),
            torch.tensor(residue_idx),
            torch.tensor(chain_labels),
            torch.tensor(randn),
            use_input_decoding_order=True,
            decoding_order=torch.tensor(decoding_order),
        ).numpy()

    params = convert_mpnn_state_dict(ref_model.state_dict(), cfg)
    model = ProteinMPNN(cfg)
    ours = np.asarray(
        model.apply(
            {"params": params},
            jnp.asarray(x),
            jnp.asarray(seq),
            jnp.asarray(mask),
            jnp.asarray(residue_idx),
            jnp.asarray(chain_labels),
            jnp.asarray(decoding_order),
        )
    )
    # Compare log-probs on valid positions.
    valid = mask.astype(bool)
    np.testing.assert_allclose(
        ours[valid], ref_lp[valid], atol=2e-4, rtol=1e-3
    )


def test_protein_mpnn_ca_only_parity(ref):
    """CA-only model (reference CLI `--ca_only`, `CA_ProteinFeatures`
    `protein_mpnn_utils.py:719-897`): converted random weights must give
    the same teacher-forced log-probs. Step lengths sit inside the
    3.6<|dCA|<4.0 chain-continuity window except two planted breaks (a
    2 A compression and a 9 A jump), which the gate zeroes EXACTLY on
    both sides — near-window step lengths are deliberately avoided
    because a noise-level cross product flips the sign convention of the
    reference's quaternion feature (sign(R21-R12) of an ~1e-8 value),
    making bitwise parity ill-posed at degenerate frames (an instability
    the reference itself has). A masked tail exercises the padded-row
    path."""
    import jax.numpy as jnp

    from se3_diffusion_tpu.interop.mpnn_convert import convert_mpnn_state_dict
    from se3_diffusion_tpu.models.protein_mpnn import MPNNConfig, ProteinMPNN

    cfg = MPNNConfig(k_neighbors=16, augment_eps=0.0, ca_only=True)
    torch.manual_seed(21)
    ref_model = ref.mpnn.ProteinMPNN(
        num_letters=cfg.num_letters, node_features=cfg.node_features,
        edge_features=cfg.edge_features, hidden_dim=cfg.hidden_dim,
        num_encoder_layers=cfg.num_encoder_layers,
        num_decoder_layers=cfg.num_decoder_layers,
        k_neighbors=cfg.k_neighbors, augment_eps=0.0, dropout=0.0,
        ca_only=True,
    )
    ref_model.eval()
    params = convert_mpnn_state_dict(ref_model.state_dict(), cfg)
    model = ProteinMPNN(cfg)

    b, n = 2, 40
    rng = np.random.default_rng(31)
    steps = rng.normal(size=(b, n, 3))
    steps = steps / np.linalg.norm(steps, axis=-1, keepdims=True)
    steps *= rng.uniform(3.65, 3.95, size=(b, n, 1))
    steps[:, 10] *= 2.0 / 3.8   # planted break: too short
    steps[:, 25] *= 9.0 / 3.8   # planted break: too long
    ca = np.cumsum(steps, axis=1).astype(np.float32)   # [B, N, 3]
    seq = rng.integers(0, 21, size=(b, n))
    mask = np.ones((b, n), np.float32)
    mask[1, -6:] = 0.0
    residue_idx = np.tile(np.arange(n)[None], (b, 1))
    chain_labels = np.zeros((b, n), np.int64)
    randn = rng.normal(size=(b, n)).astype(np.float32)
    decoding_order = np.argsort((mask + 1e-4) * np.abs(randn), axis=-1)

    with torch.no_grad():
        ref_lp = ref_model(
            torch.tensor(ca), torch.tensor(seq), torch.tensor(mask),
            torch.tensor(mask), torch.tensor(residue_idx),
            torch.tensor(chain_labels), torch.tensor(randn),
            use_input_decoding_order=True,
            decoding_order=torch.tensor(decoding_order),
        ).numpy()

    ours = np.asarray(
        model.apply(
            {"params": params}, jnp.asarray(ca), jnp.asarray(seq),
            jnp.asarray(mask), jnp.asarray(residue_idx),
            jnp.asarray(chain_labels), jnp.asarray(decoding_order),
        )
    )
    valid = mask.astype(bool)
    np.testing.assert_allclose(ours[valid], ref_lp[valid], atol=2e-4, rtol=1e-3)


def _mpnn_pair(ref, seed=7, k=24):
    """Random-init reference ProteinMPNN + converted flax params."""
    from se3_diffusion_tpu.interop.mpnn_convert import convert_mpnn_state_dict
    from se3_diffusion_tpu.models.protein_mpnn import MPNNConfig, ProteinMPNN

    cfg = MPNNConfig(k_neighbors=k, augment_eps=0.0)
    torch.manual_seed(seed)
    ref_model = ref.mpnn.ProteinMPNN(
        num_letters=cfg.num_letters, node_features=cfg.node_features,
        edge_features=cfg.edge_features, hidden_dim=cfg.hidden_dim,
        num_encoder_layers=cfg.num_encoder_layers,
        num_decoder_layers=cfg.num_decoder_layers,
        k_neighbors=cfg.k_neighbors, augment_eps=0.0, dropout=0.0,
    )
    ref_model.eval()
    params = convert_mpnn_state_dict(ref_model.state_dict(), cfg)
    return cfg, ref_model, ProteinMPNN(cfg), params


def _mpnn_inputs(rng, b, n):
    x = np.cumsum(rng.normal(size=(b, n, 1, 3)), axis=1) + rng.normal(
        size=(b, n, 4, 3)
    )
    return {
        "x": x.astype(np.float32),
        "mask": np.ones((b, n), np.float32),
        "residue_idx": np.tile(np.arange(n)[None], (b, 1)),
        "chain_labels": np.zeros((b, n), np.int64),
    }


def test_protein_mpnn_sample_bias_omit_parity(ref):
    """Low-temperature sampling with global bias-AA + omit-AA must produce
    the exact sequence the reference `sample` produces
    (`protein_mpnn_utils.py:1083-1170`): at T=1e-3 both samplers reduce to
    argmax(logits + bias_aa + bias_by_res) over non-omitted letters, so any
    operator-ordering or bias-scaling mismatch flips tokens."""
    import jax
    import jax.numpy as jnp

    from se3_diffusion_tpu.models.protein_mpnn import (
        MPNN_ALPHABET,
        sample_sequences,
    )

    cfg, ref_model, model, params = _mpnn_pair(ref)
    rng = np.random.default_rng(5)
    b, n = 2, 36
    inp = _mpnn_inputs(rng, b, n)
    randn = rng.normal(size=(b, n)).astype(np.float32)
    order = np.argsort((inp["mask"] + 1e-4) * np.abs(randn), axis=-1)

    bias_aa = (0.5 * rng.normal(size=21)).astype(np.float32)
    bias_by_res = (0.5 * rng.normal(size=(b, n, 21))).astype(np.float32)
    omit = np.zeros(21, np.float32)
    for letter in "CWX":
        omit[MPNN_ALPHABET.index(letter)] = 1.0
    temp = 1e-3

    with torch.no_grad():
        got_ref = ref_model.sample(
            torch.tensor(inp["x"]), torch.tensor(randn),
            torch.zeros(b, n, dtype=torch.long),
            torch.tensor(inp["mask"]),
            torch.tensor(inp["chain_labels"]),
            torch.tensor(inp["residue_idx"]),
            mask=torch.tensor(inp["mask"]), temperature=temp,
            omit_AAs_np=omit, bias_AAs_np=bias_aa,
            chain_M_pos=torch.tensor(inp["mask"]),
            omit_AA_mask=None, pssm_coef=None, pssm_bias=None,
            pssm_multi=None, pssm_log_odds_flag=False,
            pssm_log_odds_mask=None, pssm_bias_flag=False,
            bias_by_res=torch.tensor(bias_by_res),
        )

    out = sample_sequences(
        model, params, jax.random.PRNGKey(0),
        jnp.asarray(inp["x"]), jnp.asarray(inp["mask"]),
        jnp.asarray(inp["residue_idx"]), jnp.asarray(inp["chain_labels"]),
        temperature=temp, omit_x=False,
        bias_aa=jnp.asarray(bias_aa), bias_by_res=jnp.asarray(bias_by_res),
        omit_aa=jnp.asarray(omit),
        decoding_order=jnp.asarray(order),
    )
    ours = np.asarray(out["seq"])
    theirs = got_ref["S"].numpy()
    np.testing.assert_array_equal(ours, theirs)
    assert not np.isin(ours, [MPNN_ALPHABET.index(c) for c in "CWX"]).any()


def test_protein_mpnn_tied_sample_parity(ref):
    """Tied-position sampling must match the reference `tied_sample`
    (`protein_mpnn_utils.py:1175-1280`) exactly at low temperature: same
    group-contiguous decoding order, same summed group logits, same token
    committed to every member."""
    import jax
    import jax.numpy as jnp

    from se3_diffusion_tpu.models.protein_mpnn import sample_sequences

    cfg, ref_model, model, params = _mpnn_pair(ref, seed=9)
    rng = np.random.default_rng(11)
    b, n = 1, 30
    inp = _mpnn_inputs(rng, b, n)
    randn = rng.normal(size=(b, n)).astype(np.float32)
    base_order = np.argsort((inp["mask"] + 1e-4) * np.abs(randn), axis=-1)

    groups = [[3, 17, 24], [5, 9]]
    # Within-group processing order: the reference walks each tied_pos
    # list as given; our sampler keeps base-rank order. Present the lists
    # base-rank-ordered so both walks coincide.
    rank = np.argsort(base_order[0])
    groups = [sorted(g, key=lambda p: rank[p]) for g in groups]
    tie_rep = np.arange(n, dtype=np.int32)
    for g in groups:
        for p in g:
            tie_rep[p] = min(g)
    tied_beta = np.ones(n, np.float32)
    temp = 1e-3

    with torch.no_grad():
        got_ref = ref_model.tied_sample(
            torch.tensor(inp["x"]), torch.tensor(randn),
            torch.zeros(b, n, dtype=torch.long),
            torch.tensor(inp["mask"]),
            torch.tensor(inp["chain_labels"]),
            torch.tensor(inp["residue_idx"]),
            mask=torch.tensor(inp["mask"]), temperature=temp,
            omit_AAs_np=np.zeros(21, np.float32),
            bias_AAs_np=np.zeros(21, np.float32),
            chain_M_pos=torch.tensor(inp["mask"]),
            omit_AA_mask=None, pssm_coef=None, pssm_bias=None,
            pssm_multi=None, pssm_log_odds_flag=False,
            pssm_log_odds_mask=None, pssm_bias_flag=False,
            tied_pos=groups, tied_beta=torch.tensor(tied_beta),
            bias_by_res=torch.zeros(b, n, 21),
        )

    out = sample_sequences(
        model, params, jax.random.PRNGKey(0),
        jnp.asarray(inp["x"]), jnp.asarray(inp["mask"]),
        jnp.asarray(inp["residue_idx"]), jnp.asarray(inp["chain_labels"]),
        temperature=temp, omit_x=False,
        tie_rep=jnp.asarray(tie_rep), tied_beta=jnp.asarray(tied_beta),
        decoding_order=jnp.asarray(base_order),
    )
    ours = np.asarray(out["seq"])
    theirs = got_ref["S"].numpy()
    for g in groups:  # every member shares one token
        assert len(set(ours[0, p] for p in g)) == 1
    np.testing.assert_array_equal(ours, theirs)


def test_protein_mpnn_per_position_omit():
    """omit_aa_mask bans letters at specific positions only (additive
    -1e8 == the reference's zero+renormalize, `protein_mpnn_utils.py:1160`)."""
    import jax
    import jax.numpy as jnp

    from se3_diffusion_tpu.models.protein_mpnn import (
        MPNNConfig,
        ProteinMPNN,
        sample_sequences,
    )

    cfg = MPNNConfig(k_neighbors=12, augment_eps=0.0)
    model = ProteinMPNN(cfg)
    rng = np.random.default_rng(3)
    b, n = 2, 20
    inp = _mpnn_inputs(rng, b, n)
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(inp["x"]),
        jnp.zeros((b, n), jnp.int32), jnp.asarray(inp["mask"]),
        jnp.asarray(inp["residue_idx"]), jnp.asarray(inp["chain_labels"]),
        jnp.tile(jnp.arange(n)[None], (b, 1)),
    )["params"]

    omit_mask = np.zeros((b, n, 21), np.float32)
    banned_positions = [0, 5, 11]
    omit_mask[:, banned_positions, :10] = 1.0  # ban letters 0..9 there
    out = sample_sequences(
        model, params, jax.random.PRNGKey(1),
        jnp.asarray(inp["x"]), jnp.asarray(inp["mask"]),
        jnp.asarray(inp["residue_idx"]), jnp.asarray(inp["chain_labels"]),
        temperature=1.0, omit_aa_mask=jnp.asarray(omit_mask),
    )
    seq = np.asarray(out["seq"])
    assert (seq[:, banned_positions] >= 10).all()
    # Un-banned positions still explore the full alphabet head.
    assert (seq < 10).any()


def test_protein_mpnn_pssm_bias_parity(ref):
    """PSSM bias sampling must match the reference `sample` pssm branch
    (`protein_mpnn_utils.py`, pssm_bias_flag): probs are blended on the
    simplex, `(1-multi*coef)*p + multi*coef*pssm_bias`, AFTER the
    softmax. With multi=1 and one-hot bias rows at coef=1 positions the
    blend is exactly the bias row, so tokens are deterministic and both
    samplers must agree exactly; coef=0 positions reduce to greedy
    decoding at T=1e-3. The per-step `probs` output is compared too
    (the reference CLI's --save_probs payload)."""
    import jax
    import jax.numpy as jnp

    from se3_diffusion_tpu.models.protein_mpnn import sample_sequences

    cfg, ref_model, model, params = _mpnn_pair(ref)
    rng = np.random.default_rng(17)
    b, n = 2, 36
    inp = _mpnn_inputs(rng, b, n)
    randn = rng.normal(size=(b, n)).astype(np.float32)
    order = np.argsort((inp["mask"] + 1e-4) * np.abs(randn), axis=-1)

    pssm_letters = rng.integers(0, 20, size=(b, n))
    pssm_bias = np.zeros((b, n, 21), np.float32)
    pssm_bias[np.arange(b)[:, None], np.arange(n)[None], pssm_letters] = 1.0
    pssm_coef = np.zeros((b, n), np.float32)
    pssm_coef[:, ::2] = 1.0  # pssm pins even positions; odd stay greedy
    temp = 1e-3

    with torch.no_grad():
        got_ref = ref_model.sample(
            torch.tensor(inp["x"]), torch.tensor(randn),
            torch.zeros(b, n, dtype=torch.long),
            torch.tensor(inp["mask"]),
            torch.tensor(inp["chain_labels"]),
            torch.tensor(inp["residue_idx"]),
            mask=torch.tensor(inp["mask"]), temperature=temp,
            omit_AAs_np=np.zeros(21, np.float32),
            bias_AAs_np=np.zeros(21, np.float32),
            chain_M_pos=torch.tensor(inp["mask"]),
            omit_AA_mask=None,
            pssm_coef=torch.tensor(pssm_coef),
            pssm_bias=torch.tensor(pssm_bias),
            pssm_multi=1.0, pssm_log_odds_flag=False,
            pssm_log_odds_mask=None, pssm_bias_flag=True,
            bias_by_res=torch.zeros(b, n, 21),
        )

    out = sample_sequences(
        model, params, jax.random.PRNGKey(0),
        jnp.asarray(inp["x"]), jnp.asarray(inp["mask"]),
        jnp.asarray(inp["residue_idx"]), jnp.asarray(inp["chain_labels"]),
        temperature=temp, omit_x=False,
        pssm_coef=jnp.asarray(pssm_coef), pssm_bias=jnp.asarray(pssm_bias),
        pssm_multi=1.0, pssm_bias_flag=True,
        decoding_order=jnp.asarray(order),
    )
    ours = np.asarray(out["seq"])
    np.testing.assert_array_equal(ours, got_ref["S"].numpy())
    assert (ours[:, ::2] == pssm_letters[:, ::2]).all()
    np.testing.assert_allclose(
        np.asarray(out["probs"]), got_ref["probs"].numpy(), atol=1e-4
    )


def test_protein_mpnn_pssm_log_odds_and_omit_order_parity(ref):
    """pssm_log_odds masking (`p' = (p*m + 0.001p)/sum`) plus the
    post-pssm per-position omit renormalization must match the
    reference's operator ORDER: softmax -> pssm blend -> log-odds mask
    -> omit mask -> multinomial. The pssm bias (multi=1, 0.9-one-hot +
    0.1-uniform rows) concentrates ~0.9999 mass on the mask-allowed
    letter after the leakage term, so sampling is deterministic at the
    fixed seeds and the per-step probs carry non-trivial leakage values
    that any reordering or leakage-constant mistake would change."""
    import jax
    import jax.numpy as jnp

    from se3_diffusion_tpu.models.protein_mpnn import sample_sequences

    cfg, ref_model, model, params = _mpnn_pair(ref, seed=13)
    rng = np.random.default_rng(29)
    b, n = 2, 30
    inp = _mpnn_inputs(rng, b, n)
    randn = rng.normal(size=(b, n)).astype(np.float32)
    order = np.argsort((inp["mask"] + 1e-4) * np.abs(randn), axis=-1)

    allowed = rng.integers(0, 20, size=(b, n))
    onehot = np.zeros((b, n, 21), np.float32)
    onehot[np.arange(b)[:, None], np.arange(n)[None], allowed] = 1.0
    pssm_bias = 0.9 * onehot + 0.1 / 21.0
    pssm_coef = np.ones((b, n), np.float32)
    log_odds_mask = onehot.copy()
    # Per-position omit of one letter != allowed: must be applied AFTER
    # the pssm ops (zero + renorm), removing its leakage mass.
    omit_mask = np.zeros((b, n, 21), np.float32)
    omit_letters = (allowed + 1) % 20
    omit_mask[np.arange(b)[:, None], np.arange(n)[None], omit_letters] = 1.0
    temp = 0.5

    with torch.no_grad():
        got_ref = ref_model.sample(
            torch.tensor(inp["x"]), torch.tensor(randn),
            torch.zeros(b, n, dtype=torch.long),
            torch.tensor(inp["mask"]),
            torch.tensor(inp["chain_labels"]),
            torch.tensor(inp["residue_idx"]),
            mask=torch.tensor(inp["mask"]), temperature=temp,
            omit_AAs_np=np.zeros(21, np.float32),
            bias_AAs_np=np.zeros(21, np.float32),
            chain_M_pos=torch.tensor(inp["mask"]),
            omit_AA_mask=torch.tensor(omit_mask),
            pssm_coef=torch.tensor(pssm_coef),
            pssm_bias=torch.tensor(pssm_bias),
            pssm_multi=1.0,
            pssm_log_odds_flag=True,
            pssm_log_odds_mask=torch.tensor(log_odds_mask),
            pssm_bias_flag=True,
            bias_by_res=torch.zeros(b, n, 21),
        )

    out = sample_sequences(
        model, params, jax.random.PRNGKey(2),
        jnp.asarray(inp["x"]), jnp.asarray(inp["mask"]),
        jnp.asarray(inp["residue_idx"]), jnp.asarray(inp["chain_labels"]),
        temperature=temp, omit_x=False,
        omit_aa_mask=jnp.asarray(omit_mask),
        pssm_coef=jnp.asarray(pssm_coef), pssm_bias=jnp.asarray(pssm_bias),
        pssm_multi=1.0, pssm_bias_flag=True,
        pssm_log_odds_mask=jnp.asarray(log_odds_mask),
        pssm_log_odds_flag=True,
        decoding_order=jnp.asarray(order),
    )
    ours = np.asarray(out["seq"])
    np.testing.assert_array_equal(ours, got_ref["S"].numpy())
    assert (ours == allowed).all()  # mask-allowed letter always wins
    np.testing.assert_allclose(
        np.asarray(out["probs"]), got_ref["probs"].numpy(), atol=1e-4
    )


def test_protein_mpnn_unconditional_probs_parity(ref):
    """Structure-only one-shot log-probs match the reference's
    `unconditional_probs` (`protein_mpnn_utils.py:1332-1362`, CLI
    `--unconditional_probs_only`)."""
    import jax.numpy as jnp

    from se3_diffusion_tpu.models.protein_mpnn import unconditional_probs

    cfg, ref_model, model, params = _mpnn_pair(ref)
    rng = np.random.default_rng(11)
    b, n = 2, 36
    inp = _mpnn_inputs(rng, b, n)
    inp["mask"][1, -4:] = 0.0

    with torch.no_grad():
        ref_lp = ref_model.unconditional_probs(
            torch.tensor(inp["x"]), torch.tensor(inp["mask"]),
            torch.tensor(inp["residue_idx"]),
            torch.tensor(inp["chain_labels"]),
        ).numpy()
    ours = np.asarray(
        unconditional_probs(
            model, params, jnp.asarray(inp["x"]), jnp.asarray(inp["mask"]),
            jnp.asarray(inp["residue_idx"]),
            jnp.asarray(inp["chain_labels"]),
        )
    )
    valid = inp["mask"].astype(bool)
    np.testing.assert_allclose(ours[valid], ref_lp[valid], atol=2e-4,
                               rtol=1e-3)


@pytest.mark.parametrize("backbone_only", [False, True])
def test_protein_mpnn_conditional_probs_parity(ref, backbone_only):
    """Per-position conditionals match the reference's `conditional_probs`
    (`protein_mpnn_utils.py:1272-1330`, CLI `--conditional_probs_only` /
    `--conditional_probs_only_backbone`) given the same order noise."""
    import jax.numpy as jnp

    from se3_diffusion_tpu.models.protein_mpnn import conditional_probs

    cfg, ref_model, model, params = _mpnn_pair(ref)
    rng = np.random.default_rng(13)
    b, n = 2, 24
    inp = _mpnn_inputs(rng, b, n)  # all-ones mask: ref loops every idx
    seq = rng.integers(0, 21, size=(b, n))
    randn = rng.normal(size=(b, n)).astype(np.float32)

    with torch.no_grad():
        ref_lp = ref_model.conditional_probs(
            torch.tensor(inp["x"]), torch.tensor(seq),
            torch.tensor(inp["mask"]), torch.tensor(inp["mask"]),
            torch.tensor(inp["residue_idx"]),
            torch.tensor(inp["chain_labels"]), torch.tensor(randn),
            backbone_only=backbone_only,
        ).numpy()
    ours = np.asarray(
        conditional_probs(
            model, params, jnp.asarray(inp["x"]), jnp.asarray(seq),
            jnp.asarray(inp["mask"]), jnp.asarray(inp["residue_idx"]),
            jnp.asarray(inp["chain_labels"]), jnp.asarray(randn),
            backbone_only=backbone_only,
        )
    )
    np.testing.assert_allclose(ours, ref_lp, atol=2e-4, rtol=1e-3)


def test_protein_mpnn_score_sequences_parity(ref):
    """`score_sequences` reproduces the reference CLI's `--score_only`
    reduction (`protein_mpnn_utils.py:18-26` `_scores`: masked mean NLL
    of the teacher-forced forward)."""
    import jax.numpy as jnp

    from se3_diffusion_tpu.models.protein_mpnn import score_sequences

    cfg, ref_model, model, params = _mpnn_pair(ref)
    rng = np.random.default_rng(17)
    b, n = 2, 36
    inp = _mpnn_inputs(rng, b, n)
    inp["mask"][0, -6:] = 0.0
    seq = rng.integers(0, 21, size=(b, n))
    randn = rng.normal(size=(b, n)).astype(np.float32)
    order = np.argsort((inp["mask"] + 1e-4) * np.abs(randn), axis=-1)
    # Score only a sub-span, like the reference's mask_for_loss =
    # mask * chain_M * chain_M_pos.
    design_mask = np.zeros((b, n), np.float32)
    design_mask[:, 4:30] = 1.0

    with torch.no_grad():
        ref_lp = ref_model(
            torch.tensor(inp["x"]), torch.tensor(seq),
            torch.tensor(inp["mask"]), torch.tensor(inp["mask"]),
            torch.tensor(inp["residue_idx"]),
            torch.tensor(inp["chain_labels"]), torch.tensor(randn),
            use_input_decoding_order=True,
            decoding_order=torch.tensor(order),
        )
        ref_scores = ref.mpnn._scores(
            torch.tensor(seq), ref_lp,
            torch.tensor(inp["mask"] * design_mask),
        ).numpy()

    out = score_sequences(
        model, params, jnp.asarray(inp["x"]), jnp.asarray(seq),
        jnp.asarray(inp["mask"]), jnp.asarray(inp["residue_idx"]),
        jnp.asarray(inp["chain_labels"]), jnp.asarray(order),
        score_mask=jnp.asarray(design_mask),
    )
    np.testing.assert_allclose(
        np.asarray(out["score"]), ref_scores, atol=2e-4, rtol=1e-3
    )


@pytest.mark.parametrize("ca_only", [True, False])
def test_protein_mpnn_short_row_knn(ref, ca_only):
    """Padded rows with fewer valid residues than k_neighbors (the regime
    the round-4 parity tests never exercised): the masked-pair fill must be
    the row's max VALID distance (reference `_dist`, `protein_mpnn_utils.py
    :818-826`/`:916-924`), so the selected masked edges carry RBF(D_max),
    not RBF(huge)=0. Exact assertions: the k-NN *distances* match the
    reference bitwise, and every valid neighbor is selected. The neighbor
    *indices* are NOT asserted equal — the short row makes top_k tie at
    D_max across all masked edges (plus any valid edge at D_max), and
    torch.topk's pick among ties is implementation-defined (its CPU choice
    can drop a valid neighbor in favor of masked edges); lax.top_k's stable
    lowest-index tie-break keeps every valid neighbor deterministically.
    The resulting log-prob divergence is tie-order noise, bounded loosely
    here to quantify it (measured ~0.5 at 10 valid vs k=16)."""
    import jax
    import jax.numpy as jnp

    from se3_diffusion_tpu.interop.mpnn_convert import convert_mpnn_state_dict
    from se3_diffusion_tpu.models.protein_mpnn import MPNNConfig, ProteinMPNN

    cfg = MPNNConfig(k_neighbors=16, augment_eps=0.0, ca_only=ca_only)
    torch.manual_seed(21)
    ref_model = ref.mpnn.ProteinMPNN(
        num_letters=cfg.num_letters, node_features=cfg.node_features,
        edge_features=cfg.edge_features, hidden_dim=cfg.hidden_dim,
        num_encoder_layers=cfg.num_encoder_layers,
        num_decoder_layers=cfg.num_decoder_layers,
        k_neighbors=cfg.k_neighbors, augment_eps=0.0, dropout=0.0,
        ca_only=ca_only,
    )
    ref_model.eval()
    params = convert_mpnn_state_dict(ref_model.state_dict(), cfg)
    model = ProteinMPNN(cfg)

    b, n, n_valid = 2, 40, 10
    rng = np.random.default_rng(77)
    steps = rng.normal(size=(b, n, 3))
    steps /= np.linalg.norm(steps, axis=-1, keepdims=True)
    steps *= rng.uniform(3.65, 3.95, size=(b, n, 1))
    ca = np.cumsum(steps, axis=1).astype(np.float32)
    x = ca if ca_only else (
        ca[:, :, None]
        + rng.normal(scale=0.8, size=(b, n, 4, 3)).astype(np.float32)
    )
    seq = rng.integers(0, 21, size=(b, n))
    mask = np.ones((b, n), np.float32)
    mask[1, n_valid:] = 0.0  # row 1: 10 valid residues < k_neighbors = 16
    residue_idx = np.tile(np.arange(n)[None], (b, 1))
    chain_labels = np.zeros((b, n), np.int64)
    randn = rng.normal(size=(b, n)).astype(np.float32)
    decoding_order = np.argsort((mask + 1e-4) * np.abs(randn), axis=-1)

    # k-NN selection parity on the short row: distances bitwise, all valid
    # neighbors kept.
    ca_t = torch.tensor(ca)
    m_t = torch.tensor(mask)
    mask_2d = m_t.unsqueeze(1) * m_t.unsqueeze(2)
    d_ref = mask_2d * torch.sqrt(
        torch.sum((ca_t.unsqueeze(1) - ca_t.unsqueeze(2)) ** 2, 3) + 1e-6
    )
    d_max, _ = torch.max(d_ref, -1, keepdim=True)
    dn_ref, _ = torch.topk(
        d_ref + (1.0 - mask_2d) * d_max, 16, dim=-1, largest=False
    )
    m2 = mask[:, :, None] * mask[:, None, :]
    d = m2 * np.sqrt(
        ((ca[:, :, None] - ca[:, None, :]) ** 2).sum(-1) + 1e-6
    )
    neg_d, e_idx = jax.lax.top_k(
        jnp.asarray(-(d + (1.0 - m2) * d.max(-1, keepdims=True))), 16
    )
    np.testing.assert_allclose(
        -np.asarray(neg_d), dn_ref.numpy(), atol=1e-6
    )
    for i in range(n_valid):
        assert set(range(n_valid)) <= set(np.asarray(e_idx)[1, i].tolist())

    with torch.no_grad():
        ref_lp = ref_model(
            torch.tensor(x), torch.tensor(seq), torch.tensor(mask),
            torch.tensor(mask), torch.tensor(residue_idx),
            torch.tensor(chain_labels), torch.tensor(randn),
            use_input_decoding_order=True,
            decoding_order=torch.tensor(decoding_order),
        ).numpy()
    ours = np.asarray(
        model.apply(
            {"params": params}, jnp.asarray(x), jnp.asarray(seq),
            jnp.asarray(mask), jnp.asarray(residue_idx),
            jnp.asarray(chain_labels), jnp.asarray(decoding_order),
        )
    )
    # Full row: exact parity (no ties in play).
    v0 = mask[0].astype(bool)
    np.testing.assert_allclose(
        ours[0][v0], ref_lp[0][v0], atol=2e-4, rtol=1e-3
    )
    # Short row: tie-order noise only — quantified bound, not bitwise.
    v1 = mask[1].astype(bool)
    assert np.abs(ours[1][v1] - ref_lp[1][v1]).max() < 1.5
