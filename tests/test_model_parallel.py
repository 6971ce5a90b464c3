"""Decoder token-axis (model-parallel) sharding — the spatial-sharding
capability SURVEY §5 names as this framework's long-context equivalent.
Runs on the 8-virtual-device CPU mesh: a [data=2, model=4] layout shards the
flattened token dim of the time-FiLM deformable decoder; results must match
the unsharded run (GSPMD inserts the value all-gather)."""
import jax
import jax.numpy as jnp
import numpy as np

from ddp_tpu.nn.heads import DeformableHeadWithTime
from ddp_tpu.parallel.mesh import make_mesh, replicated, token_sharding


def _setup(attn):
    head = DeformableHeadWithTime(5, embed_dims=32, num_layers=2, num_heads=4,
                                  ffn_dim=64, attn_type=attn)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 32), jnp.float32)
    t = jnp.asarray(np.random.RandomState(1).randn(2, 128), jnp.float32)
    v = head.init({"params": jax.random.PRNGKey(0)}, x, t)
    return head, v, x, t


def _run_sharded(head, v, x, t):
    mesh = make_mesh(n_data=2, n_model=4)
    rep = replicated(mesh)
    tok = token_sharding(mesh)

    @jax.jit
    def fwd(v, x, t):
        b, h, w, c = x.shape
        q = x.reshape(b, h * w, c)
        q = jax.lax.with_sharding_constraint(q, tok)
        q = q.reshape(b, h, w, c)
        return head.apply(v, q, t)

    with mesh:
        out = fwd(jax.device_put(v, rep), jax.device_put(x, rep),
                  jax.device_put(t, rep))
    return np.asarray(out)


def test_token_sharded_decoder_matches_unsharded():
    for attn in ("msda", "window"):
        head, v, x, t = _setup(attn)
        want = np.asarray(head.apply(v, x, t))
        got = _run_sharded(head, v, x, t)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_token_sharding_spec():
    mesh = make_mesh(n_data=2, n_model=4)
    s = token_sharding(mesh)
    assert s.spec == jax.sharding.PartitionSpec("data", "model", None)
