"""Native voxelizer / rulebook builder + JAX sparse conv tests.

Correctness strategy (SURVEY.md §2.4): the dense 3-D convolution is the
oracle — a submanifold conv equals the dense conv evaluated at active sites
(inactive inputs are zero), a strided sparse conv equals the dense strided
conv at its active output sites."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddp_tpu import native

pytestmark = pytest.mark.slow
from ddp_tpu.nn.sparse_conv import (SparseEncoder, build_sparse_encoder_rulebooks,
                                    mean_voxel_features, sparse_conv_gather_gemm)


def rand_coords(rng, n, shape):
    pts = set()
    while len(pts) < n:
        pts.add(tuple(rng.integers(0, s) for s in shape))
    return np.asarray(sorted(pts), np.int32)


class TestNative:
    def test_native_compiles(self):
        assert native.have_native(), "g++ build of sparse_ops.cpp failed"

    def test_voxelize_native_matches_numpy(self):
        rng = np.random.default_rng(0)
        pts = rng.uniform(-5, 5, (500, 5)).astype(np.float32)
        args = ((-4, -4, -4, 4, 4, 4), (0.5, 0.5, 0.5), 4, 64)
        vn, cn, nn_, n1 = native.hard_voxelize(pts, *args, use_native=True)
        vf, cf, nf, n2 = native.hard_voxelize(pts, *args, use_native=False)
        assert n1 == n2
        np.testing.assert_array_equal(cn[:n1], cf[:n1])
        np.testing.assert_array_equal(nn_[:n1], nf[:n1])
        np.testing.assert_allclose(vn[:n1], vf[:n1])

    def test_subm_rulebook_native_matches_numpy(self):
        rng = np.random.default_rng(1)
        coords = rand_coords(rng, 40, (6, 6, 4))
        a = native.build_subm_rulebook(coords, len(coords), 48, use_native=True)
        b = native.build_subm_rulebook(coords, len(coords), 48, use_native=False)
        np.testing.assert_array_equal(a, b)

    def test_sparse_rulebook_native_matches_numpy(self):
        rng = np.random.default_rng(2)
        coords = rand_coords(rng, 30, (8, 8, 6))
        a = native.build_sparse_rulebook(coords, len(coords), (8, 8, 6), 3, 2, 1,
                                         64, use_native=True)
        b = native.build_sparse_rulebook(coords, len(coords), (8, 8, 6), 3, 2, 1,
                                         64, use_native=False)
        assert a[2] == b[2]
        np.testing.assert_array_equal(a[0][:a[2]], b[0][:b[2]])
        np.testing.assert_array_equal(a[1], b[1])


def dense_conv3d(dense, w_dense, stride=1, pad=1):
    """lax 3-D conv oracle, NHWDC."""
    return jax.lax.conv_general_dilated(
        dense[None], w_dense, (stride,) * 3, [(pad, pad)] * 3,
        dimension_numbers=("NXYZC", "XYZIO", "NXYZC"))[0]


class TestSparseConvCorrectness:
    def _setup(self, seed=3, shape=(6, 6, 5), n=25, cin=4, cout=6):
        rng = np.random.default_rng(seed)
        coords = rand_coords(rng, n, shape)
        feats = rng.normal(size=(n, cin)).astype(np.float32)
        # weight [K=27, Cin, Cout] with offset order (dx, dy, dz) row-major
        w = rng.normal(size=(27, cin, cout)).astype(np.float32) * 0.1
        dense = np.zeros(shape + (cin,), np.float32)
        dense[coords[:, 0], coords[:, 1], coords[:, 2]] = feats
        # dense kernel [kx, ky, kz, Cin, Cout]
        w_dense = w.reshape(3, 3, 3, cin, cout)
        return coords, feats, w, dense, w_dense

    def test_subm_equals_dense_at_active_sites(self):
        coords, feats, w, dense, w_dense = self._setup()
        n = len(coords)
        gather = native.build_subm_rulebook(coords, n, n)
        out = sparse_conv_gather_gemm(jnp.asarray(feats), jnp.asarray(gather),
                                      jnp.asarray(w))
        ref = dense_conv3d(jnp.asarray(dense), jnp.asarray(w_dense))
        ref_at = np.asarray(ref)[coords[:, 0], coords[:, 1], coords[:, 2]]
        # offset ordering check: subm gather offset k=(dx,dy,dz) must pair
        # with dense kernel flipped? conv vs correlation: lax conv is
        # cross-correlation, gather uses coords[o]+offset as INPUT of the
        # kernel tap at (dx+1, dy+1, dz+1)... so w[k] maps input at
        # out+(dx,dy,dz) — cross-correlation tap index (dx+1) reads input
        # out+(dx+1-1): same convention.
        np.testing.assert_allclose(np.asarray(out), ref_at, rtol=1e-4, atol=1e-5)

    def test_strided_equals_dense_at_out_sites(self):
        coords, feats, w, dense, w_dense = self._setup(shape=(8, 8, 5), n=30)
        n = len(coords)
        out_coords, gather, n_out = native.build_sparse_rulebook(
            coords, n, (8, 8, 5), 3, 2, 1, 64)
        out = sparse_conv_gather_gemm(jnp.asarray(feats), jnp.asarray(gather),
                                      jnp.asarray(w))
        ref = dense_conv3d(jnp.asarray(dense), jnp.asarray(w_dense), stride=2)
        ref_at = np.asarray(ref)[out_coords[:n_out, 0], out_coords[:n_out, 1],
                                 out_coords[:n_out, 2]]
        np.testing.assert_allclose(np.asarray(out[:n_out]), ref_at,
                                   rtol=1e-4, atol=1e-5)
        # dense ref must be zero everywhere the rulebook produced no site
        mask = np.zeros(ref.shape[:3], bool)
        mask[out_coords[:n_out, 0], out_coords[:n_out, 1], out_coords[:n_out, 2]] = True
        assert np.abs(np.asarray(ref)[~mask]).max() < 1e-5

    def test_gather_gemm_grad(self):
        coords, feats, w, *_ = self._setup()
        gather = native.build_subm_rulebook(coords, len(coords), len(coords))

        def f(fe, we):
            return sparse_conv_gather_gemm(fe, jnp.asarray(gather), we).sum()

        gf, gw = jax.grad(f, argnums=(0, 1))(jnp.asarray(feats), jnp.asarray(w))
        assert np.isfinite(np.asarray(gf)).all() and np.isfinite(np.asarray(gw)).all()
        assert float(jnp.abs(gw).max()) > 0


class TestSparseEncoder:
    def test_forward_shapes(self):
        rng = np.random.default_rng(5)
        sparse_shape = (32, 32, 41)
        n = 200
        cap0 = 256
        coords = np.zeros((cap0, 3), np.int32)
        coords[:n] = rand_coords(rng, n, sparse_shape)
        rulebooks = build_sparse_encoder_rulebooks(
            coords, n, sparse_shape, caps=(cap0, 128, 64, 48, 48))
        feats = np.zeros((cap0, 5), np.float32)
        feats[:n] = rng.normal(size=(n, 5))

        enc = SparseEncoder(dense_hw=4, dense_z=2)
        variables = enc.init({"params": jax.random.PRNGKey(0)},
                             jnp.asarray(feats),
                             {k: jnp.asarray(v) for k, v in rulebooks.items()},
                             train=False)
        out = enc.apply(variables, jnp.asarray(feats),
                        {k: jnp.asarray(v) for k, v in rulebooks.items()},
                        train=False)
        assert out.shape == (4, 4, 2 * 128)
        assert np.isfinite(np.asarray(out)).all()

    def test_mean_voxel_features(self):
        voxels = np.zeros((3, 4, 2), np.float32)
        voxels[0, :2] = [[2, 2], [4, 4]]
        counts = np.array([2, 0, 0], np.int32)
        m = mean_voxel_features(voxels, counts)
        np.testing.assert_allclose(m[0], [3, 3])
        np.testing.assert_allclose(m[1], [0, 0])
