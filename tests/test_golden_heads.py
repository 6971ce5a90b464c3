"""Golden-value oracle tests for the trickiest CUDA-op re-derivations
(VERDICT r2 weak #8): CC criss-cross attention, EMA expectation-maximization
attention, K-Net kernel update, PSA compact attention.

Each test recomputes the module's forward in plain numpy with EXPLICIT
per-pixel loops, directly from the published algorithm (CCNet eq.2-4,
EMANet alg.1, K-Net eq.3-5, PSANet compact form) — a structurally different
code path from the repo's dense einsums — and checks agreement to f32
precision. A silent index/transpose error in the einsum re-derivations
fails these even though shape tests pass.

References (behavioral parity targets, not code sources):
  mmseg/models/decode_heads/{cc_head,ema_head,knet_head,psa_head}.py
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddp_tpu.nn.compat_heads2 import (_CrissCrossAttention, _EMAModule,
                                      _KernelUpdator, PSAHead)


def _dense(x, kernel, bias=None):
    y = x @ kernel
    return y + bias if bias is not None else y


def _softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def _layernorm(x, scale, bias, eps=1e-6):
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * scale + bias


def test_crisscross_attention_oracle():
    b, h, w, c = 2, 5, 7, 8
    rng = np.random.RandomState(0)
    x = rng.randn(b, h, w, c).astype(np.float32)
    mod = _CrissCrossAttention(reduction=4)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    # gamma initializes to 0 (output == x, trivially passing) — set it live
    params = jax.device_get(variables["params"])
    params["gamma"] = np.float32(0.7)
    out = np.asarray(mod.apply({"params": params}, jnp.asarray(x)))

    # numpy oracle: per query (i,j), keys = column ∪ row, joint softmax with
    # the column self-logit masked (CCNet's INF trick)
    pq = params["query"]
    pk = params["key"]
    pv = params["value"]
    q = _dense(x, pq["kernel"][0, 0], pq["bias"])
    k = _dense(x, pk["kernel"][0, 0], pk["bias"])
    v = _dense(x, pv["kernel"][0, 0], pv["bias"])
    ref = np.empty_like(x)
    for bi in range(b):
        for i in range(h):
            for j in range(w):
                e_col = np.array([
                    -np.inf if u == i else q[bi, i, j] @ k[bi, u, j]
                    for u in range(h)])
                e_row = np.array([q[bi, i, j] @ k[bi, i, u]
                                  for u in range(w)])
                a = _softmax(np.concatenate([e_col, e_row]))
                ctx = sum(a[u] * v[bi, u, j] for u in range(h)) + \
                    sum(a[h + u] * v[bi, i, u] for u in range(w))
                ref[bi, i, j] = x[bi, i, j] + 0.7 * ctx
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_ema_module_oracle():
    b, h, w, c, K, stages = 2, 4, 5, 6, 8, 3
    rng = np.random.RandomState(1)
    x = rng.randn(b, h, w, c).astype(np.float32)
    mod = _EMAModule(channels=c, num_bases=K, num_stages=stages)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    bases0 = np.asarray(jax.device_get(variables["batch_stats"]["bases"]))
    out = np.asarray(mod.apply(variables, jnp.asarray(x), train=False))

    # numpy oracle of EMANet alg.1 + the reference's recon convention:
    # reuse the LAST in-loop attention (pre-update bases) with the
    # POST-update bases (ema_head.py:55-66)
    feats = x.reshape(b, h * w, c)
    ref = np.empty((b, h * w, c), np.float32)
    for bi in range(b):
        bases = bases0.copy()  # [K, c]
        attn = None
        for _ in range(stages):
            logits = np.array([[feats[bi, n] @ bases[kk] for kk in range(K)]
                               for n in range(h * w)])
            attn = _softmax(logits, axis=-1)  # [N, K]
            attn_n = attn / (attn.sum(axis=0, keepdims=True) + 1e-12)
            bases = attn_n.T @ feats[bi]  # [K, c]
            bases = bases / (np.linalg.norm(bases, axis=-1, keepdims=True)
                             + 1e-12)
        ref[bi] = attn @ bases
    np.testing.assert_allclose(out, ref.reshape(b, h, w, c),
                               rtol=2e-5, atol=2e-5)


def test_kernel_updator_oracle():
    b, K, c = 2, 5, 16
    rng = np.random.RandomState(2)
    kernels = rng.randn(b, K, c).astype(np.float32)
    group = rng.randn(b, K, c).astype(np.float32)
    mod = _KernelUpdator(channels=c)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(kernels),
                         jnp.asarray(group))
    p = jax.device_get(variables["params"])
    out = np.asarray(mod.apply(variables, jnp.asarray(kernels),
                               jnp.asarray(group)))

    f = _dense(group, p["feat_in"]["kernel"], p["feat_in"]["bias"])
    k = _dense(kernels, p["kernel_in"]["kernel"], p["kernel_in"]["bias"])
    f_param, f_gate = f[..., :c], f[..., c:]
    k_param, k_gate = k[..., :c], k[..., c:]
    gsum = f_gate + k_gate
    gate_f = 1 / (1 + np.exp(-_layernorm(gsum, p["fg_norm"]["scale"],
                                         p["fg_norm"]["bias"])))
    gate_k = 1 / (1 + np.exp(-_layernorm(gsum, p["kg_norm"]["scale"],
                                         p["kg_norm"]["bias"])))
    new = (gate_f * _layernorm(f_param, p["f_norm"]["scale"],
                               p["f_norm"]["bias"])
           + gate_k * _layernorm(k_param, p["k_norm"]["scale"],
                                 p["k_norm"]["bias"]))
    ref = np.maximum(_layernorm(
        _dense(new, p["fc_out"]["kernel"], p["fc_out"]["bias"]),
        p["out_norm"]["scale"], p["out_norm"]["bias"]), 0.0)
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_psa_head_oracle():
    """Full PSAHead forward (norm=None, shrink=1, eval mode) vs a per-pixel
    numpy pipeline — pins the compact collect/distribute attention
    orientation (collect TRANSPOSES its [N,N] map: each position gathers)."""
    b, h, w, cin, ch, ncls = 1, 4, 4, 6, 8, 3
    rng = np.random.RandomState(3)
    x = rng.randn(b, h, w, cin).astype(np.float32)
    head = PSAHead(num_classes=ncls, channels=ch, shrink_factor=1,
                   norm=None, dropout=0.0)
    variables = head.init(jax.random.PRNGKey(0), [jnp.asarray(x)])
    p = jax.device_get(variables["params"])
    out = np.asarray(head.apply(variables, [jnp.asarray(x)], train=False))

    n = h * w

    def conv1x1(inp, name, relu=True, bias=True):
        q = p[name]
        y = _dense(inp, q["Conv_0"]["kernel"][0, 0] if "Conv_0" in q
                   else q["kernel"][0, 0],
                   (q["Conv_0"]["bias"] if "Conv_0" in q else
                    q.get("bias")) if bias else None)
        return np.maximum(y, 0) if relu else y

    def branch(name):
        y = conv1x1(x, f"{name}_reduce")
        a = conv1x1(y, f"{name}_attn0")
        a = _dense(a, p[f"{name}_attn1"]["kernel"][0, 0])  # no bias
        return y.reshape(b, n, ch), a.reshape(b, n, n)

    xc, ac = branch("collect")
    xd, ad = branch("distribute")
    ac = np.transpose(ac, (0, 2, 1))  # compact collect transposes
    ac = _softmax(ac, axis=-1)
    ad = _softmax(ad, axis=-1)
    yc = np.einsum("bqk,bkc->bqc", ac, xc)
    yd = np.einsum("bqk,bkc->bqc", ad, xd)
    y = np.concatenate([yc, yd], -1).reshape(b, h, w, 2 * ch)
    y = conv1x1(y, "proj")  # back to cin channels, relu
    cat = np.concatenate([x, y], axis=-1)
    # 3x3 bottleneck conv, SAME padding, explicit loops
    q = p["bottleneck"]
    kern, bias = q["Conv_0"]["kernel"], q["Conv_0"]["bias"]
    pad = np.pad(cat, ((0, 0), (1, 1), (1, 1), (0, 0)))
    bott = np.empty((b, h, w, ch), np.float32)
    for i in range(h):
        for j in range(w):
            patch = pad[:, i:i + 3, j:j + 3, :]
            bott[:, i, j] = np.einsum("bxyc,xyco->bo", patch, kern) + bias
    bott = np.maximum(bott, 0)
    ref = _dense(bott, p["out"]["conv_seg"]["kernel"][0, 0],
                 p["out"]["conv_seg"]["bias"])
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)
