"""Geometry core tests: quaternion algebra, rotvec maps, Rigid transforms.

Validated against scipy.spatial.transform.Rotation as the independent
oracle (same oracle the reference uses for its diffusers).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as ScipyRot

from se3_diffusion_tpu.geometry import (
    Rigid,
    compose_rotvec,
    quat_multiply,
    quat_to_rotmat,
    quat_to_rotvec,
    rotmat_to_quat,
    rotmat_to_rotvec,
    rotvec_to_quat,
    rotvec_to_rotmat,
)

RNG = np.random.RandomState(0)


def random_quats(n):
    q = RNG.randn(n, 4)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def to_scipy(q_wxyz):
    """wxyz -> scipy's xyzw."""
    return np.concatenate([q_wxyz[..., 1:], q_wxyz[..., :1]], axis=-1)


class TestQuat:
    def test_quat_to_rotmat_matches_scipy(self):
        q = random_quats(64)
        ours = np.asarray(quat_to_rotmat(jnp.asarray(q)))
        theirs = ScipyRot.from_quat(to_scipy(q)).as_matrix()
        np.testing.assert_allclose(ours, theirs, atol=1e-5)

    def test_rotmat_to_quat_roundtrip(self):
        q = random_quats(64)
        # Canonical sign w>=0 on both sides.
        q_canon = q * np.where(q[..., :1] < 0, -1.0, 1.0)
        back = np.asarray(rotmat_to_quat(quat_to_rotmat(jnp.asarray(q))))
        np.testing.assert_allclose(back, q_canon, atol=1e-5)

    def test_rotmat_to_quat_near_pi(self):
        # 180-degree rotations exercise the non-trace Shepperd branches.
        for axis in np.eye(3):
            m = ScipyRot.from_rotvec(axis * np.pi).as_matrix()
            q = np.asarray(rotmat_to_quat(jnp.asarray(m)))
            m_back = np.asarray(quat_to_rotmat(jnp.asarray(q)))
            np.testing.assert_allclose(m_back, m, atol=1e-5)

    def test_quat_multiply_matches_scipy(self):
        q1, q2 = random_quats(32), random_quats(32)
        ours = np.asarray(quat_multiply(jnp.asarray(q1), jnp.asarray(q2)))
        theirs = ScipyRot.from_quat(to_scipy(q1)) * ScipyRot.from_quat(to_scipy(q2))
        np.testing.assert_allclose(
            quat_to_rotmat(jnp.asarray(ours)), theirs.as_matrix(), atol=1e-5
        )

    def test_quat_to_rotvec_matches_scipy(self):
        q = random_quats(64)
        ours = np.asarray(quat_to_rotvec(jnp.asarray(q)))
        theirs = ScipyRot.from_quat(to_scipy(q)).as_rotvec()
        np.testing.assert_allclose(ours, theirs, atol=1e-4)

    def test_rotvec_small_angle_branches(self):
        vecs = np.array([[0.0, 0.0, 0.0], [1e-6, 0, 0], [0, 5e-4, 0], [1e-8, 1e-8, 1e-8]])
        q = rotvec_to_quat(jnp.asarray(vecs, dtype=jnp.float32))
        back = np.asarray(quat_to_rotvec(q))
        np.testing.assert_allclose(back, vecs, atol=1e-6)
        m = rotvec_to_rotmat(jnp.asarray(vecs, dtype=jnp.float32))
        np.testing.assert_allclose(
            np.asarray(m), ScipyRot.from_rotvec(vecs).as_matrix(), atol=1e-6
        )

    def test_rotvec_rotmat_roundtrip_near_pi(self):
        angles = np.array([np.pi - 1e-4, np.pi - 1e-2, 3.0])
        axes = RNG.randn(3, 3)
        axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
        vecs = axes * angles[:, None]
        m = rotvec_to_rotmat(jnp.asarray(vecs, dtype=jnp.float32))
        back = np.asarray(rotmat_to_rotvec(m))
        # fp32 axis recovery near theta=pi is conditioned like 1/sin(theta);
        # 5e-3 absolute is the fp32 limit (fp64 reference is exact).
        np.testing.assert_allclose(back, vecs, atol=5e-3)

    def test_compose_rotvec_matches_scipy(self):
        r1 = RNG.randn(32, 3)
        r2 = RNG.randn(32, 3)
        ours = np.asarray(compose_rotvec(jnp.asarray(r1), jnp.asarray(r2)))
        theirs = (ScipyRot.from_rotvec(r1) * ScipyRot.from_rotvec(r2)).as_rotvec()
        np.testing.assert_allclose(ours, theirs, atol=1e-4)

    def test_gradients_finite_at_small_angles(self):
        def f(v):
            return jnp.sum(quat_to_rotvec(rotvec_to_quat(v)) ** 2)

        g = jax.grad(f)(jnp.array([1e-7, 0.0, 0.0]))
        assert np.all(np.isfinite(np.asarray(g)))

        def h(v):
            return jnp.sum(rotvec_to_rotmat(v))

        g2 = jax.grad(h)(jnp.zeros(3))
        assert np.all(np.isfinite(np.asarray(g2)))


class TestRigid:
    def test_identity(self):
        r = Rigid.identity((5,))
        pts = jnp.asarray(RNG.randn(5, 3), dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(r.apply(pts)), np.asarray(pts), atol=1e-6)

    def test_tensor7_roundtrip(self):
        q = jnp.asarray(random_quats(8), dtype=jnp.float32)
        t = jnp.asarray(RNG.randn(8, 3), dtype=jnp.float32)
        r = Rigid(quat=q, trans=t)
        r2 = Rigid.from_tensor_7(r.to_tensor_7())
        np.testing.assert_allclose(np.asarray(r2.quat), np.asarray(q), atol=1e-6)

    def test_apply_invert_apply(self):
        q = jnp.asarray(random_quats(8), dtype=jnp.float32)
        t = jnp.asarray(RNG.randn(8, 3), dtype=jnp.float32)
        r = Rigid(quat=q, trans=t)
        pts = jnp.asarray(RNG.randn(8, 3), dtype=jnp.float32)
        back = r.invert_apply(r.apply(pts))
        np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-4)

    def test_compose_vs_matrix(self):
        qa, qb = random_quats(8), random_quats(8)
        ta, tb = RNG.randn(8, 3), RNG.randn(8, 3)
        ra = Rigid(jnp.asarray(qa, jnp.float32), jnp.asarray(ta, jnp.float32))
        rb = Rigid(jnp.asarray(qb, jnp.float32), jnp.asarray(tb, jnp.float32))
        rc = ra.compose(rb)
        ma = ScipyRot.from_quat(to_scipy(qa)).as_matrix()
        mb = ScipyRot.from_quat(to_scipy(qb)).as_matrix()
        np.testing.assert_allclose(
            np.asarray(rc.rot_mats()), ma @ mb, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(rc.trans), np.einsum("nij,nj->ni", ma, tb) + ta, atol=1e-4
        )

    def test_invert(self):
        q = jnp.asarray(random_quats(8), dtype=jnp.float32)
        t = jnp.asarray(RNG.randn(8, 3), dtype=jnp.float32)
        r = Rigid(quat=q, trans=t)
        ident = r.compose(r.invert())
        np.testing.assert_allclose(
            np.asarray(ident.rot_mats()),
            np.broadcast_to(np.eye(3), (8, 3, 3)),
            atol=1e-5,
        )
        np.testing.assert_allclose(np.asarray(ident.trans), np.zeros((8, 3)), atol=1e-5)

    def test_from_3_points_orthonormal(self):
        n = jnp.asarray(RNG.randn(16, 3), dtype=jnp.float32)
        ca = jnp.asarray(RNG.randn(16, 3), dtype=jnp.float32)
        c = jnp.asarray(RNG.randn(16, 3), dtype=jnp.float32)
        r = Rigid.from_3_points(n, ca, c)
        m = np.asarray(r.rot_mats())
        np.testing.assert_allclose(
            np.einsum("nij,nkj->nik", m, m),
            np.broadcast_to(np.eye(3), (16, 3, 3)),
            atol=1e-5,
        )
        dets = np.linalg.det(m)
        np.testing.assert_allclose(dets, np.ones(16), atol=1e-5)
        np.testing.assert_allclose(np.asarray(r.trans), np.asarray(ca), atol=1e-6)
        # AF2 convention: x-axis along N->CA, so C lies in the xy-plane
        # (z = 0) with positive y component.
        local_c = np.asarray(r.invert_apply(c))
        np.testing.assert_allclose(local_c[:, 2], np.zeros(16), atol=1e-5)
        assert np.all(local_c[:, 1] > 0)

    def test_compose_q_update_vec(self):
        q = jnp.asarray(random_quats(8), dtype=jnp.float32)
        t = jnp.asarray(RNG.randn(8, 3), dtype=jnp.float32)
        r = Rigid(quat=q, trans=t)
        upd = jnp.asarray(RNG.randn(8, 6) * 0.1, dtype=jnp.float32)
        out = r.compose_q_update_vec(upd)
        # Semantics check against the mathematical definition:
        # new_quat ~ normalize(q + q*(0,b,c,d)); new_trans = t + R @ tvec.
        b = np.asarray(upd[..., :3])
        expected_q = np.asarray(q) + np.asarray(
            quat_multiply(q, jnp.concatenate([jnp.zeros((8, 1)), upd[..., :3]], -1))
        )
        expected_q /= np.linalg.norm(expected_q, axis=-1, keepdims=True)
        np.testing.assert_allclose(np.asarray(out.quat), expected_q, atol=1e-5)
        m = ScipyRot.from_quat(to_scipy(np.asarray(q))).as_matrix()
        expected_t = np.asarray(t) + np.einsum("nij,nj->ni", m, np.asarray(upd[..., 3:]))
        np.testing.assert_allclose(np.asarray(out.trans), expected_t, atol=1e-4)

    def test_compose_q_update_vec_masked(self):
        q = jnp.asarray(random_quats(4), dtype=jnp.float32)
        t = jnp.asarray(RNG.randn(4, 3), dtype=jnp.float32)
        r = Rigid(quat=q, trans=t)
        upd = jnp.asarray(RNG.randn(4, 6), dtype=jnp.float32)
        mask = jnp.asarray([[1.0], [0.0], [1.0], [0.0]])
        out = r.compose_q_update_vec(upd, update_mask=mask)
        # Masked rows unchanged (quats stay unit).
        np.testing.assert_allclose(np.asarray(out.quat[1]), np.asarray(q[1]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(out.trans[3]), np.asarray(t[3]), atol=1e-6)

    def test_rigid_is_pytree(self):
        r = Rigid.identity((4,))
        leaves = jax.tree_util.tree_leaves(r)
        assert len(leaves) == 2

        @jax.jit
        def f(rr: Rigid) -> Rigid:
            return rr.compose(rr)

        out = f(r)
        assert out.shape == (4,)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
