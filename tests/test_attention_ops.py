"""Fused-attention dispatch tests (CPU: einsum fallback; flash parity is
exercised on TPU in the verify drives and at import via interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from agacs_tpu.ops.attention import einsum_mha, fused_mha


def _rand(shape, seed):
    return jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)


def test_einsum_matches_manual_softmax():
    q, k, v = _rand((2, 4, 16, 8), 0), _rand((2, 4, 16, 8), 1), _rand((2, 4, 16, 8), 2)
    out = einsum_mha(q, k, v, causal=False, sm_scale=0.5)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * 0.5
    ref = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, -1), v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_causal_masking():
    q, k, v = _rand((1, 2, 8, 4), 0), _rand((1, 2, 8, 4), 1), _rand((1, 2, 8, 4), 2)
    out = fused_mha(q, k, v, causal=True, backend="einsum")
    # row 0 attends only to key 0 -> equals v[0]
    np.testing.assert_allclose(
        np.asarray(out)[:, :, 0], np.asarray(v)[:, :, 0], atol=1e-5
    )


def test_auto_on_cpu_is_einsum():
    q, k, v = _rand((1, 2, 256, 64), 0), _rand((1, 2, 256, 64), 1), _rand((1, 2, 256, 64), 2)
    a = fused_mha(q, k, v, backend="auto")
    e = fused_mha(q, k, v, backend="einsum")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(e))


def test_pick_block():
    from agacs_tpu.ops.attention import _pick_block

    assert _pick_block(768) == (384, 768)
    assert _pick_block(750) == (384, 768)
    assert _pick_block(1536) == (512, 1536)
    assert _pick_block(1500) == (512, 1536)
    b, pad = _pick_block(130)
    assert pad >= 130 and pad % b == 0


def test_streaming_lse_matches_full_softmax():
    """streaming_lse + analytic columns == full-map softmax columns
    (the need_probs path with no (T,T) materialization)."""
    import jax.numpy as jnp

    from agacs_tpu.ops.attention import streaming_lse

    rng = np.random.RandomState(0)
    b, h, t, d = 2, 3, 70, 16
    q = jnp.asarray(rng.randn(b, h, t, d).astype(np.float32)) * 0.5
    k = jnp.asarray(rng.randn(b, h, t, d).astype(np.float32)) * 0.5

    for causal in (False, True):
        qk = np.asarray(jnp.einsum("bhqd,bhkd->bhqk", q, k))
        if causal:
            qk = qk + np.triu(np.full((t, t), -np.inf), k=1)
        full = np.asarray(jax.nn.softmax(jnp.asarray(qk), -1))
        lse = np.asarray(streaming_lse(q, k, causal=causal, block=32))
        want_lse = np.log(np.exp(qk - qk.max(-1, keepdims=True)).sum(-1)) + qk.max(-1)
        np.testing.assert_allclose(lse, want_lse, rtol=1e-5, atol=1e-5)
        cols = np.where(np.isfinite(qk[..., 1:3]), qk[..., 1:3], -np.inf)
        p_cols = np.exp(cols - lse[..., None])
        np.testing.assert_allclose(p_cols, full[..., 1:3], rtol=1e-5, atol=1e-6)


def test_mha_need_probs_no_full_map_parity():
    """mha(need_probs=True) p_cols on the fused path == einsum-path values."""
    import jax.numpy as jnp

    from agacs_tpu.models.whisper import WhisperConfig, init_whisper_params, mha

    cfg = WhisperConfig(
        n_mels=80, n_audio_ctx=16, n_audio_state=64, n_audio_head=4,
        n_audio_layer=1, n_vocab=100, n_text_ctx=16, n_text_state=64,
        n_text_head=4, n_text_layer=1,
    )
    params = init_whisper_params(jax.random.PRNGKey(0), cfg)
    p = jax.tree.map(
        lambda x: x[0] if x.ndim and x.shape[0] == 1 else x,
        params["decoder"]["blocks"],
    )["attn"]
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 12, 64))

    out, aux = mha(p, x, causal=True, n_head=4, lang_cols=(1, 3),
                   need_probs=True)
    # oracle: full-scores einsum path
    out2, aux2 = mha(p, x, causal=True, n_head=4, lang_cols=(1, 3),
                     need_probs=True, full_scores=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2),
                               rtol=2e-2, atol=2e-3)
    np.testing.assert_allclose(np.asarray(aux["p_cols"]),
                               np.asarray(aux2["p_cols"]),
                               rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# packed whole-KV-in-VMEM training kernel (ops/flash_train.py)
# ---------------------------------------------------------------------------


def _packed_ref(q, k, v, n_head):
    """Head-split einsum reference for the packed (B, T, D) layout —
    exactly what models/whisper.mha does on the fallback path."""
    b, t, d = q.shape
    dh = d // n_head
    sc = dh ** -0.25
    qh = q.reshape(b, t, n_head, dh).transpose(0, 2, 1, 3) * sc
    kh = k.reshape(b, t, n_head, dh).transpose(0, 2, 1, 3) * sc
    vh = v.reshape(b, t, n_head, dh).transpose(0, 2, 1, 3)
    o = einsum_mha(qh, kh, vh, causal=False, sm_scale=1.0)
    return o.transpose(0, 2, 1, 3).reshape(b, t, d)


@pytest.mark.parametrize("b,t,d,h", [(2, 200, 384, 6), (1, 256, 768, 12)])
def test_packed_flash_fwd_parity(b, t, d, h):
    from agacs_tpu.ops.flash_train import packed_flash_mha

    q = _rand((b, t, d), 0).astype(jnp.bfloat16) * 0.3
    k = _rand((b, t, d), 1).astype(jnp.bfloat16) * 0.3
    v = _rand((b, t, d), 2).astype(jnp.bfloat16) * 0.3
    ref = _packed_ref(q, k, v, h).astype(jnp.float32)
    out = packed_flash_mha(q, k, v, h, True).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2)


def test_packed_flash_grad_parity():
    from agacs_tpu.ops.flash_train import packed_flash_mha

    b, t, d, h = 1, 200, 384, 6
    q = _rand((b, t, d), 0).astype(jnp.bfloat16) * 0.3
    k = _rand((b, t, d), 1).astype(jnp.bfloat16) * 0.3
    v = _rand((b, t, d), 2).astype(jnp.bfloat16) * 0.3

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(_packed_ref(q, k, v, h).astype(jnp.float32) * 3))

    def loss_ker(q, k, v):
        return jnp.sum(
            jnp.sin(packed_flash_mha(q, k, v, h, True).astype(jnp.float32) * 3)
        )

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    gk = jax.grad(loss_ker, argnums=(0, 1, 2))(q, k, v)
    for name, a, b2 in zip("qkv", gr, gk):
        a = np.asarray(a, np.float32)
        b2 = np.asarray(b2, np.float32)
        scale = np.abs(a).max() + 1e-9
        assert np.abs(a - b2).max() / scale < 5e-2, name


def test_packed_eligibility_gates():
    from agacs_tpu.ops.flash_train import supports

    assert supports(750, 750, 768, 12, jnp.bfloat16)
    assert supports(500, 500, 768, 12, jnp.bfloat16)
    assert not supports(750, 750, 768, 12, jnp.float32)   # dtype
    assert supports(1500, 1500, 768, 12, jnp.bfloat16)    # q-chunked
    assert not supports(1550, 1550, 768, 12, jnp.bfloat16)  # > MAX_T_CHUNKED
    assert not supports(750, 376, 768, 12, jnp.bfloat16)  # cross-attention
    assert not supports(250, 250, 768, 12, jnp.bfloat16)  # einsum wins < MIN_T
    assert not supports(750, 750, 768, 6, jnp.bfloat16)   # d_head != 64


def test_pick_groups_valid():
    from agacs_tpu.ops.flash_train import _pick_groups

    for t in (200, 256, 750, 1000):
        for d, h in ((768, 12), (512, 8), (384, 6)):
            for (na, nt) in ((4, 2), (8, 3)):
                g = _pick_groups(t, d, h, na, nt)
                assert h % g == 0 and (d // g) % 128 == 0, (t, d, h, g)


@pytest.mark.parametrize("b,t,d,h", [(1, 1500, 384, 6)])
def test_packed_flash_chunked_fwd_parity(b, t, d, h):
    """T > MAX_T takes the q-chunked grid (whisper 30 s context)."""
    from agacs_tpu.ops import flash_train
    from agacs_tpu.ops.flash_train import packed_flash_mha

    assert t > flash_train.MAX_T
    q = _rand((b, t, d), 0).astype(jnp.bfloat16) * 0.3
    k = _rand((b, t, d), 1).astype(jnp.bfloat16) * 0.3
    v = _rand((b, t, d), 2).astype(jnp.bfloat16) * 0.3
    ref = _packed_ref(q, k, v, h).astype(jnp.float32)
    out = packed_flash_mha(q, k, v, h, True).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2)


def test_packed_flash_chunked_grad_parity():
    from agacs_tpu.ops.flash_train import packed_flash_mha

    b, t, d, h = 1, 1200, 384, 6
    q = _rand((b, t, d), 0).astype(jnp.bfloat16) * 0.3
    k = _rand((b, t, d), 1).astype(jnp.bfloat16) * 0.3
    v = _rand((b, t, d), 2).astype(jnp.bfloat16) * 0.3

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(_packed_ref(q, k, v, h).astype(jnp.float32) * 3))

    def loss_ker(q, k, v):
        return jnp.sum(
            jnp.sin(packed_flash_mha(q, k, v, h, True).astype(jnp.float32) * 3)
        )

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    gk = jax.grad(loss_ker, argnums=(0, 1, 2))(q, k, v)
    for name, a, b2 in zip("qkv", gr, gk):
        a = np.asarray(a, np.float32)
        b2 = np.asarray(b2, np.float32)
        scale = np.abs(a).max() + 1e-9
        assert np.abs(a - b2).max() / scale < 5e-2, name


def test_pick_chunked_valid():
    from agacs_tpu.ops.flash_train import _pick_chunked, supports

    for t in (1050, 1100, 1150, 1200, 1250, 1300, 1350, 1400, 1450, 1500):
        for d, hh in ((768, 12), (384, 6)):
            for bwd in (False, True):
                got = _pick_chunked(t, d, hh, bwd)
                assert got is not None, (t, d, hh, bwd)
                g, tq = got
                assert hh % g == 0 and (d // g) % 128 == 0 and tq % 8 == 0
            assert supports(t, t, d, hh, jnp.bfloat16)


def test_packed_flash_spmd_batch_sharding():
    """Under a dp mesh the kernel must stay batch-sharded (no GSPMD
    opaque-custom-call replication): out/grad shardings follow the
    inputs and the compiled fwd HLO contains no all-gather."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from agacs_tpu.ops.flash_train import packed_flash_mha

    b, t, d, h = 8, 512, 384, 6
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (b, t, d), jnp.bfloat16) * 0.3
               for kk in ks)
    mesh = Mesh(np.array(jax.devices()).reshape(4, 2), ("data", "model"))
    sh = NamedSharding(mesh, P("data"))
    qs, ks_, vs = (jax.device_put(x, sh) for x in (q, k, v))

    fn = jax.jit(lambda q, k, v: packed_flash_mha(q, k, v, h, True))
    out = fn(qs, ks_, vs)
    assert out.sharding.spec == P("data"), out.sharding
    ref = fn(q, k, v)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=1e-3)
    assert "all-gather" not in fn.lower(qs, ks_, vs).compile().as_text()

    gfn = jax.jit(jax.grad(
        lambda q, k, v: jnp.sum(
            packed_flash_mha(q, k, v, h, True).astype(jnp.float32) ** 2
        ), argnums=(0, 1, 2)))
    g = gfn(qs, ks_, vs)
    gr = gfn(q, k, v)
    for a, b2 in zip(g, gr):
        assert a.sharding.spec == P("data")
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b2, np.float32), atol=1e-2)
